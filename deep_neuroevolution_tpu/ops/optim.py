"""Flat-vector optimizers (SGD-momentum, Adam) as pure functional updates.

Reference semantics: es_distributed/optimizers.py:1-51 and the GPU variant
gpu_implementation/neuroevolution/optimizers.py:23-75. Both operate on the
flat θ vector; `update(globalg)` returns (‖step‖/‖θ‖ ratio, new θ). The two
stacks differ in SGD momentum:

* CPU stack (optimizers.py:29-32):  v = m·v + (1-m)·g   ("openai")
* GPU stack (neuroevolution/optimizers.py:44-49): v = m·v + g   ("tf")

Both are provided via the `momentum_style` switch. Adam is identical in both:
step = -a·m̂/(√v̂+ε) with a = lr·√(1-β₂ᵗ)/(1-β₁ᵗ) (optimizers.py:35-50).

TPU-native design: optimizer state is a NamedTuple pytree living on device;
`update` is pure (state, θ, g) → (state, θ', ratio) so it jits and shards —
on a mesh it is executed identically on every device from the psum-reduced
gradient, which is what makes the reference's θ-broadcast (dist.py:72-82)
unnecessary.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SGDState(NamedTuple):
    t: jax.Array  # scalar int32
    v: jax.Array  # [D]


class AdamState(NamedTuple):
    t: jax.Array  # scalar int32
    m: jax.Array  # [D]
    v: jax.Array  # [D]


def _ratio(step: jax.Array, theta: jax.Array) -> jax.Array:
    # reference: optimizers.py:14 — ||step|| / ||theta||
    return jnp.linalg.norm(step) / jnp.linalg.norm(theta)


class SGD:
    """SGD with momentum on the flat parameter vector.

    momentum_style="openai": v = m·v + (1-m)·g (es_distributed/optimizers.py:29-32)
    momentum_style="tf":     v = m·v + g (gpu neuroevolution/optimizers.py:44-49)
    """

    def __init__(self, stepsize: float, momentum: float = 0.9, momentum_style: str = "openai"):
        assert momentum_style in ("openai", "tf")
        self.stepsize = stepsize
        self.momentum = momentum
        self.momentum_style = momentum_style

    def init(self, dim: int) -> SGDState:
        return SGDState(jnp.zeros((), jnp.int32), jnp.zeros((dim,), jnp.float32))

    def update(self, state: SGDState, theta: jax.Array, globalg: jax.Array):
        if self.momentum_style == "openai":
            v = self.momentum * state.v + (1.0 - self.momentum) * globalg
        else:
            v = self.momentum * state.v + globalg
        step = -self.stepsize * v
        new_theta = theta + step
        return SGDState(state.t + 1, v), new_theta, _ratio(step, theta)


class Adam:
    """Adam on the flat parameter vector (optimizers.py:35-50)."""

    def __init__(self, stepsize: float, beta1: float = 0.9, beta2: float = 0.999, epsilon: float = 1e-08):
        self.stepsize = stepsize
        self.beta1 = beta1
        self.beta2 = beta2
        self.epsilon = epsilon

    def init(self, dim: int) -> AdamState:
        return AdamState(
            jnp.zeros((), jnp.int32),
            jnp.zeros((dim,), jnp.float32),
            jnp.zeros((dim,), jnp.float32),
        )

    def update(self, state: AdamState, theta: jax.Array, globalg: jax.Array):
        t = state.t + 1
        tf_ = t.astype(jnp.float32)
        a = self.stepsize * jnp.sqrt(1.0 - self.beta2**tf_) / (1.0 - self.beta1**tf_)
        m = self.beta1 * state.m + (1.0 - self.beta1) * globalg
        v = self.beta2 * state.v + (1.0 - self.beta2) * (globalg * globalg)
        step = -a * m / (jnp.sqrt(v) + self.epsilon)
        new_theta = theta + step
        return AdamState(t, m, v), new_theta, _ratio(step, theta)


OPTIMIZERS = {"sgd": SGD, "adam": Adam}


def make_optimizer(type_name: str, **kwargs):
    """Config-reflection constructor matching the reference exp JSON schema
    (`optimizer{type,args}`, es_distributed/es.py:150)."""
    return OPTIMIZERS[type_name.lower()](**kwargs)
