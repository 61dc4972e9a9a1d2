"""Policy replay / visualization (the scripts/viz.py + display.py analog).

Reference: scripts/viz.py:10-51 loads an h5 snapshot, rebuilds the policy,
and rolls it out with rendering (optionally recording);
neuroevolution/display.py:30-89 rebuilds an elite from its seed chain and
renders. Headless here: rollouts run on device (or the host engine) and
frames / (x, y) trajectories are written to .npz for offline viewing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoint import load_policy_snapshot


def replay_policy(
    model,
    theta,
    env,
    episodes: int = 1,
    save_frames: str = "",
    seed: int = 0,
    ob_stat=None,
    ref_batch=None,
    return_trajectory: bool = False,
) -> dict:
    """Roll a flat-θ policy for `episodes` episodes (device scan for JAX
    envs, pipelined loop for host engines); returns summary stats."""
    theta = jnp.asarray(theta)

    def _mlp_ctx():
        from ..models.mlp import MLPContext
        from ..ops import obstat as obstat_mod

        st = obstat_mod.RunningStat(*[jnp.asarray(v) for v in ob_stat])
        return MLPContext(obstat_mod.mean(st), obstat_mod.std(st), jnp.asarray(0.0))

    if getattr(env, "is_host_env", False):
        from ..algos.rollout_host import rollout_host

        thetas = jnp.broadcast_to(theta, (env.batch_size,) + theta.shape)
        if model.needs_ref_batch:
            ref = jnp.asarray(ref_batch)
            stats = model.batch_ref_stats(thetas[:1], ref)
            stats = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (env.batch_size,) + x.shape[1:]), stats
            )
            params = (thetas, stats)
        elif model.needs_ob_stat and ob_stat is not None:
            params = (thetas, _mlp_ctx())
        else:
            params = (thetas, None)
        # episodes may exceed the engine's slot count: roll ceil(E/B) rounds
        # with per-round keys (each round = fresh noops/episode seeds)
        B = env.batch_size
        rets_l, lens_l, traj_l = [], [], []
        key = jax.random.PRNGKey(seed)
        for _ in range(-(-episodes // B)):
            key, kround = jax.random.split(key)
            res = rollout_host(
                env,
                model.make_batch_act(),
                params,
                kround,
                env.default_timestep_cutoff,
            )
            rets_l.append(np.asarray(res.returns))
            lens_l.append(np.asarray(res.lengths))
            traj_l.append(np.asarray(res.bc))
        rets = np.concatenate(rets_l)[:episodes]
        lens = np.concatenate(lens_l)[:episodes]
        # vector engines (MuJoCo) expose the BC — for bc_mode='traj' that IS
        # the x-y trajectory (policies.py:293-299); save it for offline view
        traj = np.concatenate(traj_l)[:episodes]
    else:
        from ..algos.rollout import rollout_batch_scan

        keys = jax.random.split(jax.random.PRNGKey(seed), episodes)
        ctx = _mlp_ctx() if (model.needs_ob_stat and ob_stat is not None) else None
        params = (jnp.broadcast_to(theta, (episodes,) + theta.shape), ctx)
        res, (bc_traj, alive) = rollout_batch_scan(
            env,
            model.make_batch_act(),
            params,
            keys,
            env.default_timestep_cutoff,
        )
        rets = np.asarray(res.returns)
        lens = np.asarray(res.lengths)
        traj = np.asarray(bc_traj)  # [T, episodes, bc_dim]

    if save_frames:
        np.savez_compressed(
            save_frames,
            returns=rets,
            lengths=lens,
            **({"bc_trajectory": traj} if traj is not None else {}),
        )
    out = {
        "returns": rets.tolist(),
        "lengths": lens.tolist(),
        "return_mean": float(rets.mean()),
        "length_mean": float(lens.mean()),
    }
    if return_trajectory:
        out["bc_trajectory"] = traj
    return out


def replay_snapshot(
    snapshot_path: str,
    env_id: Optional[str] = None,
    episodes: int = 1,
    save_frames: str = "",
    seed: int = 0,
    env_kwargs: Optional[dict] = None,
    theta_override: Optional[np.ndarray] = None,
    return_trajectory: bool = False,
) -> dict:
    """Roll a policy snapshot for `episodes` episodes (scripts/viz.py:10-51).

    `theta_override` replaces the snapshot's flat params (the VINE
    inspector's offspring replay rebuilds θ ± σ·ε from the stored noise
    index and passes it here, figure_custom/rollout_custom.py:20-32)."""
    from .config import resolve_env

    model, theta, payload = load_policy_snapshot(snapshot_path)
    env_id = env_id or payload["extra"].get("env_id") or "maze"
    env = resolve_env(env_id, **(env_kwargs or {}))
    if theta_override is not None:
        theta = theta_override
    return replay_policy(
        model,
        theta,
        env,
        episodes=episodes,
        save_frames=save_frames,
        seed=seed,
        ob_stat=payload.get("ob_stat"),
        ref_batch=payload.get("ref_batch"),
        return_trajectory=return_trajectory,
    )


def replay_seed_chain(
    seeds: Sequence,
    model_name: str,
    env_id: str,
    model_kwargs: Optional[dict] = None,
    genome_style: str = "gpu",
    noise_stdev: float = 0.002,
    noise_table=None,
    episodes: int = 1,
    save_frames: str = "",
    seed: int = 0,
    env_kwargs: Optional[dict] = None,
    return_trajectory: bool = False,
) -> dict:
    """Rebuild an elite from its seed-chain genome and roll it out — the
    display.py:30-89 capability (it hardcodes a 260-seed chain; here the
    chain comes from a GA snapshot / experiment log).

    `seeds`: GPU-style = [init_seed, [idx, power], ...] (base.py:143-145);
    CPU-style = bare indices with the global `noise_stdev`
    (es_distributed/ga.py:250-264)."""
    from .. import models
    from .checkpoint import theta_from_seed_chain
    from .config import resolve_env

    cls = getattr(models, model_name, None) or models.get_model(model_name)
    model = cls(**(model_kwargs or {}))
    env = resolve_env(env_id, **(env_kwargs or {}))
    if noise_table is None:
        from ..ops import NoiseTable

        noise_table = NoiseTable.from_seed()
    theta = theta_from_seed_chain(model, noise_table, seeds, genome_style, noise_stdev)

    ref_batch = None
    if model.needs_ref_batch:
        from ..algos.rollout import collect_ref_batch
        from ..algos.rollout_host import collect_ref_batch_host

        key = jax.random.PRNGKey(seed)
        if getattr(env, "is_host_env", False):
            ref_batch = collect_ref_batch_host(env, key)
        else:
            ref_batch = collect_ref_batch(env, key)

    return replay_policy(
        model,
        theta,
        env,
        episodes=episodes,
        save_frames=save_frames,
        seed=seed,
        ref_batch=ref_batch,
        return_trajectory=return_trajectory,
    )
