"""Running observation statistics for obs normalization.

Reference semantics: es_distributed/es.py:26-48 (`RunningStat`) — sum/sumsq
initialized to eps, `increment(s, ssq, c)`, mean = sum/count,
std = sqrt(max(sumsq/count - mean², 1e-2)), and `set_from_init` used by the
warm-start surgery (policies.py:219-249).

TPU-native design: a NamedTuple pytree so it lives inside the jitted
generation step; per-rollout accumulation happens on device under the scan
done-mask and is psum-reduced across the `pop` mesh axis (the reference ships
ob_sum/ob_sumsq/ob_count inside each Result pickle, es.py:18-23,436-438).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class RunningStat(NamedTuple):
    sum: jax.Array  # [shape] f32
    sumsq: jax.Array  # [shape] f32
    count: jax.Array  # scalar f32


def init(shape: Tuple[int, ...], eps: float) -> RunningStat:
    return RunningStat(
        jnp.zeros(shape, jnp.float32),
        jnp.full(shape, eps, jnp.float32),
        jnp.asarray(eps, jnp.float32),
    )


def increment(stat: RunningStat, s: jax.Array, ssq: jax.Array, c: jax.Array) -> RunningStat:
    return RunningStat(stat.sum + s, stat.sumsq + ssq, stat.count + c)


def mean(stat: RunningStat) -> jax.Array:
    return stat.sum / stat.count


def std(stat: RunningStat) -> jax.Array:
    m = mean(stat)
    return jnp.sqrt(jnp.maximum(stat.sumsq / stat.count - jnp.square(m), 1e-2))


def set_from_init(init_mean: jax.Array, init_std: jax.Array, init_count: float) -> RunningStat:
    """es.py:45-48 — reconstruct sums from a given mean/std/count."""
    init_mean = jnp.asarray(init_mean, jnp.float32)
    init_std = jnp.asarray(init_std, jnp.float32)
    return RunningStat(
        init_mean * init_count,
        (jnp.square(init_mean) + jnp.square(init_std)) * init_count,
        jnp.asarray(init_count, jnp.float32),
    )
