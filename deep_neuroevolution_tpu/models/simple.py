"""Small classifier policies for gym control — the engine smoke-test models.

Reference: gpu_implementation/neuroevolution/models/simple.py:22-35
(`LinearClassifier`, `SimpleClassifier`): flatten obs → (dense stacks) →
argmax action. They inherit dqn.Model's fan-in genome scaling
(dqn.py:26-28). Used with `gym.*` envs via es_gym_config.json — the de-facto
full-engine test without Atari (SURVEY §4 item 3).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp

from ..ops.flat import ParamSpec
from .core import NONLINS, Model, dense


@dataclasses.dataclass(frozen=True)
class LinearClassifier(Model):
    obs_dim: int = 0
    num_actions: int = 0
    nonlin_type: str = "relu"

    def build_specs(self) -> Sequence[ParamSpec]:
        return [
            ParamSpec("out/w", (self.obs_dim, self.num_actions), "normc", 1.0),
            ParamSpec("out/b", (self.num_actions,), "zeros"),
        ]

    def act_parts(self, parts, obs, key=None, ctx=None):
        scores = dense(parts, "out", obs.reshape(-1).astype(jnp.float32))
        return jnp.argmax(scores)


@dataclasses.dataclass(frozen=True)
class SimpleClassifier(Model):
    """fc16 → fc16 → out(std 0.1), argmax (simple.py:29-35)."""

    obs_dim: int = 0
    num_actions: int = 0
    nonlin_type: str = "relu"

    def build_specs(self) -> Sequence[ParamSpec]:
        return [
            ParamSpec("fc1/w", (self.obs_dim, 16), "normc", 1.0),
            ParamSpec("fc1/b", (16,), "zeros"),
            ParamSpec("fc2/w", (16, 16), "normc", 1.0),
            ParamSpec("fc2/b", (16,), "zeros"),
            ParamSpec("out/w", (16, self.num_actions), "normc", 0.1),
            ParamSpec("out/b", (self.num_actions,), "zeros"),
        ]

    def act_parts(self, parts, obs, key=None, ctx=None):
        nonlin = NONLINS[self.nonlin_type]
        x = obs.reshape(-1).astype(jnp.float32)
        x = nonlin(dense(parts, "fc1", x))
        x = nonlin(dense(parts, "fc2", x))
        return jnp.argmax(dense(parts, "out", x))


@dataclasses.dataclass(frozen=True)
class ContinuousMLP(Model):
    """Small tanh MLP emitting raw continuous actions — used for the Hard
    Maze (2-dim output consumed by tf_maze.cpp:80 with the +0.5 offset)."""

    obs_dim: int = 0
    ac_dim: int = 0
    hidden: int = 16
    nonlin_type: str = "tanh"

    def build_specs(self) -> Sequence[ParamSpec]:
        return [
            ParamSpec("fc1/w", (self.obs_dim, self.hidden), "normc", 1.0),
            ParamSpec("fc1/b", (self.hidden,), "zeros"),
            ParamSpec("fc2/w", (self.hidden, self.hidden), "normc", 1.0),
            ParamSpec("fc2/b", (self.hidden,), "zeros"),
            ParamSpec("out/w", (self.hidden, self.ac_dim), "normc", 0.1),
            ParamSpec("out/b", (self.ac_dim,), "zeros"),
        ]

    def act_parts(self, parts, obs, key=None, ctx=None):
        nonlin = NONLINS[self.nonlin_type]
        x = obs.reshape(-1).astype(jnp.float32)
        x = nonlin(dense(parts, "fc1", x))
        x = nonlin(dense(parts, "fc2", x))
        return jnp.tanh(dense(parts, "out", x)) * 0.5  # outputs in [-0.5, 0.5]
