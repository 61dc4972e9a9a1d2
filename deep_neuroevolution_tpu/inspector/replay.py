"""Point replay for the interactive inspector.

Reference: visual_inspector/figure_base/rollout_base.py:30-60 +
figure_custom/rollout_custom.py (RolloutAtari/RolloutMujoco reconstruct the
clicked pseudo-offspring's θ = parent θ + sign·σ·noise[idx] from the global
SharedNoiseTable and roll it out, deterministically via the stored
policy_seed or stochastically via a fresh seed) and
figure_custom/rollout_trajectory.py (plots the replayed x-y trajectory on
top of the cloud figure).

Here the rollout runs through the framework's own replay path
(utils/viz.replay_snapshot): vectorized on device for JAX envs, through the
host engine otherwise.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .load_data import load_parent


def _parent_snapshot(path: str, gen: int) -> str:
    f = os.path.join(
        path, "snapshots", f"snapshot_gen_{gen:04d}", f"snapshot_parent_{gen:04d}.h5"
    )
    if not os.path.exists(f):
        raise FileNotFoundError(
            f"no parent policy snapshot for gen {gen} under {path} "
            "(train with vine_snapshot_dir set to dump them)"
        )
    return f


def replay_point(
    path: str,
    point,
    *,
    noise_table=None,
    stochastic: bool = False,
    num_rollouts: int = 1,
    env_id: Optional[str] = None,
    bc_dim: int = 2,
) -> dict:
    """Replay the clicked cloud point.

    `point` is an inspector Point: for an offspring, its row carries
    [bc, fitness, length, noise_idx, policy_seed, sign] (utils/vine.py
    layout); the parent row's trailing columns are [seed, noise_stdev].
    Deterministic replay reuses the stored policy_seed
    (es_modified.py policy_seed region; rollout_base.py:46-52)."""
    from ..utils.checkpoint import load_policy_snapshot
    from ..utils.viz import replay_snapshot

    snap = _parent_snapshot(path, point.gen)
    theta_override = None
    seed = int(np.random.randint(2**31 - 1))

    if not point.parent:
        row = np.asarray(point.row)
        noise_idx = int(row[bc_dim + 2])
        policy_seed = int(row[bc_dim + 3])
        sign = float(row[bc_dim + 4])
        noise_stdev = float(load_parent(path, point.gen, bc_dim).extras[-1])
        if noise_table is None:
            from ..ops import NoiseTable

            noise_table = NoiseTable.from_seed()
        model, theta, _ = load_policy_snapshot(snap)
        eps = np.asarray(noise_table.get(noise_idx, theta.shape[0]))
        theta_override = np.asarray(theta) + sign * noise_stdev * eps
        if not stochastic:
            seed = policy_seed

    result = replay_snapshot(
        snap,
        env_id=env_id,
        episodes=num_rollouts,
        seed=seed,
        theta_override=theta_override,
        return_trajectory=True,
    )
    result["seed"] = seed
    return result


def plot_replay_trajectory(ax, result, color: str = "k") -> None:
    """Overlay the replayed rollout's BC trajectory on a cloud axis
    (figure_custom/rollout_trajectory.py behavior)."""
    traj = np.asarray(result.get("bc_trajectory"))
    if traj.ndim == 3:  # [T, episodes, bc_dim] from the device scan
        for e in range(traj.shape[1]):
            ax.plot(traj[:, e, 0], traj[:, e, 1], color=color, lw=2, alpha=0.7)
    elif traj.ndim == 2 and traj.shape[1] >= 2:  # [episodes, bc] host engines
        half = traj.shape[1] // 2
        for e in range(traj.shape[0]):
            ax.plot(traj[e, :half], traj[e, half:], color=color, lw=2, alpha=0.7)
