"""Novelty computation: k-NN behavior distance against an archive.

Reference: es_distributed/nses.py:12-32 —
* `euclidean_distance(x, y)`: length-tolerant metric for ragged BC
  trajectories: compare the overlapping prefix, then the shorter vector's
  last element against the longer one's tail, and combine √(a²+b²)
  (nses.py:12-20).
* `compute_novelty_vs_archive`: mean distance to the k nearest archive
  points (nses.py:22-32; ties/fewer-than-k handled by argsort()[:k] which
  simply takes all available).

TPU-native design: the archive is a fixed-capacity device array
[capacity, bc_dim] + a fill counter (replacing the Redis list,
dist.py:92-98); novelty for a whole batch of BC vectors is one pairwise
distance matrix + top-k — vmapped, so the per-rollout novelty the reference
computed one-by-one on every worker (nses.py:381-387) is a single fused op.
The length-tolerant host variant is kept for trajectory BCs of ragged
length (MuJoCo bc_choice='traj', policies.py:295-299).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def euclidean_distance(x: np.ndarray, y: np.ndarray) -> float:
    """Length-tolerant euclidean (nses.py:12-20), host-side."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n, m = len(x), len(y)
    if n > m:
        a = np.linalg.norm(y - x[:m])
        b = np.linalg.norm(y[-1] - x[m:])
    else:
        a = np.linalg.norm(x - y[:n])
        b = np.linalg.norm(x[-1] - y[n:])
    return float(np.sqrt(a**2 + b**2))


def compute_novelty_vs_archive(archive, novelty_vector, k: int) -> float:
    """Host-side k-NN mean distance (nses.py:22-32)."""
    distances = np.array(
        [euclidean_distance(p, novelty_vector) for p in archive], np.float64
    )
    top_k = np.sort(distances)[:k]
    return float(top_k.mean())


class Archive(NamedTuple):
    """Fixed-capacity BC archive on device."""

    points: jax.Array  # [capacity, bc_dim] f32
    count: jax.Array  # scalar i32


def archive_init(capacity: int, bc_dim: int) -> Archive:
    return Archive(jnp.zeros((capacity, bc_dim), jnp.float32), jnp.zeros((), jnp.int32))


@jax.jit
def _archive_add_jit(a: Archive, bc: jax.Array) -> Archive:
    idx = jnp.minimum(a.count, a.points.shape[0] - 1)
    return Archive(a.points.at[idx].set(bc), jnp.minimum(a.count + 1, a.points.shape[0]))


def archive_grow(a: Archive, factor: int = 2) -> Archive:
    """Reallocate the archive at `factor`× capacity (host-side; one copy)."""
    cap, bc_dim = a.points.shape
    pts = jnp.zeros((cap * factor, bc_dim), jnp.float32).at[:cap].set(a.points)
    return Archive(pts, a.count)


def archive_add(a: Archive, bc: jax.Array) -> Archive:
    """Append one BC row (dist.py:92-94 RPUSH analog). The reference archive
    is an unbounded Redis list (dist.py:92-98); here the device array doubles
    when full — amortized O(1) per insert, never dropping points. The
    capacity check is a host sync on a scalar, once per generation."""
    if int(a.count) >= a.points.shape[0]:
        a = archive_grow(a)
    return _archive_add_jit(a, bc)


@partial(jax.jit, static_argnums=(2,))
def novelty_vs_archive(a: Archive, bcs: jax.Array, k: int) -> jax.Array:
    """Mean distance to the k nearest archive points, for a batch.

    bcs [B, bc_dim] → [B]. Rows beyond a.count are masked to +inf; when the
    archive holds fewer than k points the mean runs over what exists
    (argsort()[:k] semantics, nses.py:29-31)."""
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (a.points.shape[0],), 0) < a.count
    )  # [A]
    # pairwise distances [B, A]
    d = jnp.sqrt(
        jnp.maximum(
            jnp.sum(jnp.square(bcs[:, None, :] - a.points[None, :, :]), axis=-1), 0.0
        )
    )
    d = jnp.where(valid[None, :], d, jnp.inf)
    neg_top, _ = jax.lax.top_k(-d, min(k, a.points.shape[0]))  # k smallest
    top = -neg_top  # [B, k] ascending
    n_valid = jnp.minimum(a.count, k)
    mask = jax.lax.broadcasted_iota(jnp.int32, top.shape, 1) < n_valid
    return jnp.sum(jnp.where(mask, top, 0.0), axis=1) / jnp.maximum(n_valid, 1).astype(
        jnp.float32
    )
