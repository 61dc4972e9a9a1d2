"""MuJoCo continuous-control host envs (Humanoid et al.).

Replaces the reference's gym-MuJoCo path: the CPU stack rolls one gym env
per worker process through MujocoPolicy.rollout (es_distributed/
policies.py:258-302), extracting the mass-center x-y behavior
characterization per step (policies.py:252-257 `_get_pos`: Σ mᵢ·xiposᵢ/Σm)
and padding the trajectory with the final position (policies.py:295-297).

TPU-native design: MuJoCo physics cannot run on the TPU (no MJX in this
environment), so — like ALE — it becomes a *batched host engine*: B
simulator slots stepped by a thread pool (mj_step releases the GIL), with
the policy forward for all B slots one vmapped device call per step
(algos/rollout_host.rollout_host_vec). Unlike the Atari engine there is no
image preprocessing: observations are [B, obs_dim] f32 vectors.

Headline workload: configurations/humanoid.json (reference
configurations/humanoid.json:1-36, Humanoid-v1). Gymnasium here ships
Humanoid-v5 (348-dim obs vs v1's 376 — the contact-force block is excluded
by default); semantics of the task are unchanged.

The deceptive-humanoid world for NS-ES (reference extra/humanoid_maze.xml,
README.md:82-84) is generated programmatically: `deceptive_humanoid_xml()`
injects a three-sided wall trap ahead of the start position into
gymnasium's stock humanoid model.
"""

from __future__ import annotations

import os
import tempfile
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Sequence

import numpy as np

from .core import Continuous


MUJOCO_FAMILIES = (
    "Humanoid",
    "HumanoidStandup",
    "HalfCheetah",
    "Hopper",
    "Walker2d",
    "Ant",
    "Swimmer",
    "InvertedPendulum",
    "InvertedDoublePendulum",
    "Reacher",
    "Pusher",
    "HumanoidTrap",
)


def resolve_env_id(env_id: str) -> str:
    """Map a reference-era env id onto the version gymnasium ships.

    The reference configs name gym-era ids (Humanoid-v1,
    configurations/humanoid.json:15); gymnasium registers v4/v5. If the
    requested version is registered, keep it; otherwise pick the highest
    registered version of the same base task."""
    import gymnasium as gym

    registry = gym.registry
    if env_id in registry:
        return env_id
    base = env_id.split("-")[0]
    versions = sorted(
        int(k.split("-v")[1])
        for k in registry
        if k.split("-")[0] == base and "-v" in k and k.split("-v")[1].isdigit()
    )
    if not versions:
        raise ValueError(f"no gymnasium registration for {env_id!r}")
    return f"{base}-v{versions[-1]}"


def is_available() -> bool:
    try:
        import gymnasium  # noqa: F401
        import mujoco  # noqa: F401

        return True
    except Exception:
        return False


def _mass_center_xy(env) -> tuple:
    """Mass-center (x, y) — restates policies.py:252-257 `_get_pos`."""
    model = env.unwrapped.model
    data = env.unwrapped.data
    mass = model.body_mass
    center = (mass[:, None] * data.xipos).sum(axis=0) / mass.sum()
    return float(center[0]), float(center[1])


class MujocoHostEnv:
    """Batched host-engine MuJoCo env (vector observations).

    Same engine-facing surface as AtariEnv (reset/step-subset/observe/
    final_state over B slots) but `host_obs = 'vector'`: the rollout layer
    feeds raw obs vectors straight to the policy, no image preprocessing.

    bc_mode (policies.py:293-299):
      'final_pos' → BC = final mass-center (x, y), bc_dim=2
      'traj'      → BC = (x_0..x_{T-1}, y_0..y_{T-1}) padded with the final
                    position, bc_dim = 2·traj_len
    """

    is_host_env = True
    host_obs = "vector"

    def __init__(
        self,
        env_id: str = "Humanoid-v5",
        batch_size: int = 64,
        num_threads: int = 0,
        bc_mode: str = "final_pos",
        traj_len: int = 1000,
        xml_file: Optional[str] = None,
        seed: int = 0,
    ):
        import gymnasium as gym

        self.env_id = env_id
        self.batch_size = batch_size
        kwargs = {}
        if xml_file is not None:
            kwargs["xml_file"] = xml_file
        self._envs = [gym.make(env_id, **kwargs) for _ in range(batch_size)]
        e0 = self._envs[0]
        self.obs_shape = tuple(e0.observation_space.shape)
        space = e0.action_space
        self.action_space = Continuous(
            dim=int(space.shape[0]),
            low=tuple(np.asarray(space.low, np.float64).tolist()),
            high=tuple(np.asarray(space.high, np.float64).tolist()),
        )
        # reference clamps rollouts to the env's registered episode cap
        # (policies.py:264-265: min(timestep_limit, env limit))
        spec_max = getattr(e0.spec, "max_episode_steps", None) or 1000
        self.max_episode_steps = int(spec_max)
        self.default_timestep_cutoff = int(spec_max)
        assert bc_mode in ("final_pos", "traj"), bc_mode
        self.bc_mode = bc_mode
        self.traj_len = int(traj_len)
        self.bc_dim = 2 if bc_mode == "final_pos" else 2 * self.traj_len

        nt = num_threads or min(batch_size, os.cpu_count() or 1)
        self._pool = ThreadPoolExecutor(max_workers=nt)
        self._nt = nt
        self._obs = np.zeros((batch_size,) + self.obs_shape, np.float32)
        self._done = np.ones(batch_size, bool)
        self._xy = np.zeros((batch_size, 2), np.float64)  # current mass center
        self._traj = (
            np.zeros((batch_size, self.traj_len, 2), np.float64)
            if bc_mode == "traj"
            else None
        )
        self._t = np.zeros(batch_size, np.int64)  # per-slot step index
        self._rng = np.random.default_rng(seed)

    # ----------------------------------------------------------- engine API

    def _reset_one(self, i: int, seed: int):
        ob, _ = self._envs[i].reset(seed=seed)
        self._obs[i] = ob
        self._done[i] = False
        self._t[i] = 0
        self._xy[i] = _mass_center_xy(self._envs[i])
        if self._traj is not None:
            self._traj[i] = self._xy[i]  # pad-with-current default

    def reset(
        self,
        indices: Optional[np.ndarray] = None,
        seeds: Optional[Sequence[int]] = None,
        **_ignored,
    ):
        idx = np.arange(self.batch_size) if indices is None else np.asarray(indices)
        if seeds is None:
            seeds = self._rng.integers(0, 2**31 - 1, size=idx.size)
        list(self._pool.map(self._reset_one, idx.tolist(), [int(s) for s in seeds]))

    def _step_one(self, i: int, action: np.ndarray) -> tuple:
        env = self._envs[i]
        ob, rew, term, trunc, _info = env.step(action)
        self._obs[i] = ob
        xy = _mass_center_xy(env)
        self._xy[i] = xy
        if self._traj is not None and self._t[i] < self.traj_len:
            self._traj[i, self._t[i]] = xy
        self._t[i] += 1
        done = bool(term or trunc)
        self._done[i] = done
        return float(rew), done

    def step(self, actions: np.ndarray, indices: Optional[np.ndarray] = None):
        """Step the given slots; -> (rewards, dones) for those slots."""
        idx = np.arange(self.batch_size) if indices is None else np.asarray(indices)
        actions = np.asarray(actions, np.float64)
        assert actions.shape[0] == idx.size
        out = list(self._pool.map(self._step_one, idx.tolist(), actions))
        rews = np.array([o[0] for o in out], np.float32)
        dones = np.array([o[1] for o in out], bool)
        return rews, dones

    def observe(self) -> np.ndarray:
        return self._obs

    def final_state(self) -> np.ndarray:
        """BC per slot (policies.py:293-299). For 'traj', positions past the
        episode end hold the last recorded mass center (pad semantics of
        policies.py:295-297)."""
        if self.bc_mode == "final_pos":
            return self._xy.astype(np.float32)
        out = self._traj.copy()
        for i in range(self.batch_size):
            t = min(int(self._t[i]), self.traj_len)
            if t < self.traj_len:
                out[i, t:] = out[i, t - 1] if t > 0 else self._xy[i]
        # (x_0..x_T, y_0..y_T) layout, policies.py:298
        return np.concatenate([out[..., 0], out[..., 1]], axis=1).astype(np.float32)

    def close(self):
        for e in self._envs:
            e.close()
        self._pool.shutdown(wait=False)


# --------------------------------------------------------------- trap world


_TRAP_SNIPPET = """
    <geom name="trap_front" type="box" pos="{d} 0 1" size="0.2 {w} 1"
          rgba="0.6 0.2 0.2 1" contype="1" conaffinity="1"/>
    <geom name="trap_left" type="box" pos="{hd} {w} 1" size="{hd} 0.2 1"
          rgba="0.6 0.2 0.2 1" contype="1" conaffinity="1"/>
    <geom name="trap_right" type="box" pos="{hd} -{w} 1" size="{hd} 0.2 1"
          rgba="0.6 0.2 0.2 1" contype="1" conaffinity="1"/>
"""


def deceptive_humanoid_xml(distance: float = 4.0, half_width: float = 2.0) -> str:
    """Write a humanoid world with a U-shaped wall trap opening toward the
    start — the deceptive setup of the NS-ES humanoid experiment (reference
    extra/humanoid_maze.xml, README.md:82-84): walking straight forward
    (the reward gradient) dead-ends; the agent must detour around the walls.

    Built by injecting wall geoms into gymnasium's stock humanoid model (not
    copied from the reference asset). Returns the path of the written XML.
    """
    import gymnasium.envs.mujoco as gm

    base = os.path.join(os.path.dirname(gm.__file__), "assets", "humanoid.xml")
    with open(base) as f:
        xml = f.read()
    snippet = _TRAP_SNIPPET.format(d=distance, hd=distance / 2, w=half_width)
    assert "</worldbody>" in xml
    xml = xml.replace("</worldbody>", snippet + "\n  </worldbody>")
    fd, path = tempfile.mkstemp(suffix="_humanoid_trap.xml")
    with os.fdopen(fd, "w") as f:
        f.write(xml)
    return path
