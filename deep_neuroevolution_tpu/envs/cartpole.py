"""CartPole — pure-JAX port of gym's classic-control CartPole-v1.

Role in the reference: the pure-Python `GymEnv` fake backend reachable via
`gym_tensorflow.make("gym.CartPole-v1", ...)` (gym_tensorflow/tf_env.py:31-123,
__init__.py:12-13) is the de-facto engine smoke test (shipped config
gpu_implementation/configurations/es_gym_config.json). Here it is a real
device-side env, so the full engine (population vmap + rollout scan +
collectives) is exercisable on any backend with zero host involvement.

Physics follows gym's cartpole.py (Euler integration, tau=0.02, force ±10,
pole half-length 0.5, masses 1.0/0.1; done at |x|>2.4 or |θ|>12°; reward 1
per step including the terminating one; v1 cap 500 steps; reset state
uniform in [-0.05, 0.05]^4).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core import Discrete, Env, register

GRAVITY = 9.8
MASSCART = 1.0
MASSPOLE = 0.1
TOTAL_MASS = MASSPOLE + MASSCART
LENGTH = 0.5  # half pole length
POLEMASS_LENGTH = MASSPOLE * LENGTH
FORCE_MAG = 10.0
TAU = 0.02
THETA_LIMIT = 12 * 2 * np.pi / 360
X_LIMIT = 2.4


class CartPoleState(NamedTuple):
    x: jax.Array
    x_dot: jax.Array
    theta: jax.Array
    theta_dot: jax.Array
    done: jax.Array  # latched termination flag


@dataclasses.dataclass(frozen=True)
class CartPoleEnv(Env):
    obs_shape: Tuple[int, ...] = (4,)
    action_space = Discrete(2)
    default_timestep_cutoff: int = 500
    bc_dim: int = 1  # final cart position (a simple BC for engine tests)

    def reset(self, key: jax.Array) -> CartPoleState:
        vals = jax.random.uniform(key, (4,), jnp.float32, -0.05, 0.05)
        return CartPoleState(vals[0], vals[1], vals[2], vals[3], jnp.zeros((), jnp.bool_))

    def observe(self, state: CartPoleState) -> jax.Array:
        return jnp.stack([state.x, state.x_dot, state.theta, state.theta_dot])

    def step(self, state: CartPoleState, action: jax.Array, key: jax.Array):
        del key
        force = jnp.where(action.astype(jnp.int32) == 1, FORCE_MAG, -FORCE_MAG)
        costheta = jnp.cos(state.theta)
        sintheta = jnp.sin(state.theta)
        temp = (force + POLEMASS_LENGTH * state.theta_dot**2 * sintheta) / TOTAL_MASS
        thetaacc = (GRAVITY * sintheta - costheta * temp) / (
            LENGTH * (4.0 / 3.0 - MASSPOLE * costheta**2 / TOTAL_MASS)
        )
        xacc = temp - POLEMASS_LENGTH * thetaacc * costheta / TOTAL_MASS

        x = state.x + TAU * state.x_dot
        x_dot = state.x_dot + TAU * xacc
        theta = state.theta + TAU * state.theta_dot
        theta_dot = state.theta_dot + TAU * thetaacc

        done = (
            (jnp.abs(x) > X_LIMIT) | (jnp.abs(theta) > THETA_LIMIT) | state.done
        )
        reward = jnp.asarray(1.0, jnp.float32)  # gym grants reward on the terminal step too
        return CartPoleState(x, x_dot, theta, theta_dot, done), reward, done

    def behavior(self, state: CartPoleState) -> jax.Array:
        return jnp.stack([state.x])


register("CartPole-v1", lambda **kw: CartPoleEnv(**kw))
register("CartPole-v0", lambda **kw: dataclasses.replace(CartPoleEnv(**kw), default_timestep_cutoff=200))
