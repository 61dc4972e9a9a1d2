"""Pendulum — pure-JAX port of gym's Pendulum-v1 classic-control env.

Role: an in-repo continuous-control domain for the MujocoPolicy stack
(es_distributed/policies.py:122-302). The reference's continuous-control
domain is MuJoCo Humanoid, which needs the (non-redistributable) MuJoCo
runtime; Pendulum exercises the identical policy surface — Box actions,
obs normalization, action binning modes, action noise — fully on device.

Physics follows gym's pendulum.py: θ'' = 3g/(2l)·sin θ + 3/(m l²)·u,
dt=0.05, g=10, m=l=1, torque clipped ±2, speed clipped ±8;
reward −(angle_norm² + 0.1·θ'² + 0.001·u²); 200-step episodes, no early
termination; reset θ ~ U(−π, π), θ' ~ U(−1, 1); obs [cos θ, sin θ, θ'].
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core import Continuous, Env, register

MAX_SPEED = 8.0
MAX_TORQUE = 2.0
DT = 0.05
G = 10.0
M = 1.0
L = 1.0
EPISODE_STEPS = 200


class PendulumState(NamedTuple):
    theta: jax.Array
    theta_dot: jax.Array
    t: jax.Array


def _angle_normalize(x):
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


@dataclasses.dataclass(frozen=True)
class PendulumEnv(Env):
    obs_shape: Tuple[int, ...] = (3,)
    action_space = Continuous(1, (-MAX_TORQUE,), (MAX_TORQUE,))
    default_timestep_cutoff: int = EPISODE_STEPS
    bc_dim: int = 2  # final (cos θ, sin θ) — pose at episode end

    def reset(self, key: jax.Array) -> PendulumState:
        k1, k2 = jax.random.split(key)
        return PendulumState(
            jax.random.uniform(k1, (), jnp.float32, -np.pi, np.pi),
            jax.random.uniform(k2, (), jnp.float32, -1.0, 1.0),
            jnp.zeros((), jnp.int32),
        )

    def observe(self, state: PendulumState) -> jax.Array:
        return jnp.stack([jnp.cos(state.theta), jnp.sin(state.theta), state.theta_dot])

    def step(self, state: PendulumState, action: jax.Array, key: jax.Array):
        del key
        u = jnp.clip(action.reshape(())[None][0], -MAX_TORQUE, MAX_TORQUE)
        cost = _angle_normalize(state.theta) ** 2 + 0.1 * state.theta_dot**2 + 0.001 * u**2
        new_dot = state.theta_dot + (3 * G / (2 * L) * jnp.sin(state.theta) + 3.0 / (M * L**2) * u) * DT
        new_dot = jnp.clip(new_dot, -MAX_SPEED, MAX_SPEED)
        theta = state.theta + new_dot * DT
        t = state.t + 1
        done = t >= EPISODE_STEPS
        return PendulumState(theta, new_dot, t), -cost, done

    def behavior(self, state: PendulumState) -> jax.Array:
        return jnp.stack([jnp.cos(state.theta), jnp.sin(state.theta)])


register("Pendulum-v1", lambda **kw: PendulumEnv(**kw))
