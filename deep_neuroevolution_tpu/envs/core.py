"""Batched environment interface — the TPU-native replacement for the
reference's env layer.

Reference surfaces being unified:
* CPU stack: plain gym `env.reset()/step(ac)` per worker process
  (es_distributed/policies.py:83-93 rollout loops).
* GPU stack: batched index-addressable TF-graph API `reset(indices, ...)`,
  `observation(indices)`, `step(action, indices) -> (reward, done)` backed by
  C++ thread-pool kernels (gym_tensorflow/tf_env.py:27-80, tf_env.cpp:115-318).

TPU-native design: an env is a set of *pure functions over a state pytree*
for a SINGLE instance; batching is `jax.vmap` at the rollout layer, which
XLA compiles into the same lockstep batched stepping the C++ kernels did —
but on-device, fused with the policy forward, with no host round-trip. Index
addressing / slot recycling disappears: the rollout engine masks done slots
instead (SURVEY §7 hard part 2).

Device-runnable envs (maze, classic control) implement this directly in JAX.
Host-side envs (ALE Atari) implement the same interface via io_callback into
the C++ batched simulator pool (envs/atari.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax


@dataclasses.dataclass(frozen=True)
class Discrete:
    """Discrete action space of n choices (gym.spaces.Discrete analog)."""

    n: int


@dataclasses.dataclass(frozen=True)
class Continuous:
    """Box action space [low, high]^dim (gym.spaces.Box analog)."""

    dim: int
    low: Tuple[float, ...] = ()
    high: Tuple[float, ...] = ()


class Env:
    """Pure-function env protocol. All methods are jit/vmap-compatible.

    State is an arbitrary pytree. RNG is explicit: `reset` consumes a key,
    `step` consumes a per-step key (envs that are deterministic ignore it).
    """

    obs_shape: Tuple[int, ...]
    action_space: Any
    # reference: env_default_timestep_cutoff (tf_env.py:21-25, tf_maze.py:34-36)
    default_timestep_cutoff: int = 100_000
    # `discrete_action` mirrors tf_env.py:40-43
    bc_dim: int = 0  # behavior-characterization vector length (0 = none)

    def reset(self, key: jax.Array):
        raise NotImplementedError

    def observe(self, state) -> jax.Array:
        raise NotImplementedError

    def step(self, state, action: jax.Array, key: jax.Array):
        """-> (new_state, reward, done)."""
        raise NotImplementedError

    def behavior(self, state) -> jax.Array:
        """Final-state behavior characterization (maze (x,y): tf_maze.cpp:66-72;
        mujoco mass-center x-y: policies.py:292-299). Shape [bc_dim]."""
        raise NotImplementedError

    @property
    def discrete_action(self) -> bool:
        return isinstance(self.action_space, Discrete)


_REGISTRY: Dict[str, Callable[..., Env]] = {}


def register(name: str, ctor: Callable[..., Env]):
    _REGISTRY[name] = ctor


def make(game: str, **kwargs) -> Env:
    """Env registry (reference gym_tensorflow/__init__.py:7-14 `make`):
    'maze' → Hard Maze, 'gym.<EnvId>' → pure-JAX classic-control ports,
    Atari game names → the ALE host engine (when built)."""
    if game in _REGISTRY:
        return _REGISTRY[game](**kwargs)
    if game.startswith("gym."):
        env_id = game[4:]
        if env_id in _REGISTRY:
            return _REGISTRY[env_id](**kwargs)
    from . import atari  # late import: optional native dependency

    if game == "toy" or game in atari.GAMES:
        return atari.AtariEnv(game, **kwargs)
    raise ValueError(f"unknown game {game!r}; registered: {sorted(_REGISTRY)}")
