"""Fitness shaping and the ES gradient estimate, on device.

Reference semantics:
* `compute_ranks` / `compute_centered_ranks` — es_distributed/es.py:70-85:
  ranks in [0, n) by argsort, centered to [-0.5, 0.5] via /(n-1) - 0.5.
* `batched_weighted_sum` — es_distributed/es.py:115-122: g = Σ wᵢ·vᵢ streamed
  in chunks of 500 vectors (the reference's CPU memory workaround,
  es.py:291-296).
* return processing modes (`centered_rank` | `sign` | `centered_sign_rank`) —
  es_distributed/es.py:281-288.

TPU-native design: ranks are two argsorts on a [P] vector (trivial); the
gradient is a chunked gather-matmul `w_chunk @ table_rows_chunk` under
`lax.scan` so the full [P, D] noise matrix is never materialized (SURVEY §7
hard part 4). On a mesh, each device computes the contribution of its local
population shard and the result is `psum`-reduced — the collective replaces
the reference's relay-Redis aggregation tree (dist.py:124-138).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def compute_ranks(x: jax.Array) -> jax.Array:
    """Ranks in [0, len(x)) (es.py:70-78; NOT scipy's [1, n] convention)."""
    assert x.ndim == 1
    order = jnp.argsort(x)
    ranks = jnp.zeros_like(order).at[order].set(jnp.arange(x.shape[0], dtype=order.dtype))
    return ranks


def compute_centered_ranks(x: jax.Array) -> jax.Array:
    """Rank transform to [-0.5, 0.5], preserving input shape (es.py:81-85)."""
    flat_ranks = compute_ranks(x.ravel()).reshape(x.shape).astype(jnp.float32)
    return flat_ranks / (x.size - 1) - 0.5


def process_returns(returns: jax.Array, signreturns: jax.Array, mode: str) -> jax.Array:
    """Return-processing modes of es_distributed/es.py:281-288.

    `returns` and `signreturns` are [n, 2] antithetic pair columns (pos, neg).
    """
    if mode == "centered_rank":
        return compute_centered_ranks(returns)
    if mode == "sign":
        return signreturns.astype(jnp.float32)
    if mode == "centered_sign_rank":
        return compute_centered_ranks(signreturns)
    raise NotImplementedError(f"unknown return_proc_mode {mode!r}")


def batched_weighted_sum(weights: jax.Array, vecs: jax.Array, batch_size: int = 500):
    """Σ wᵢ·vᵢ over [n] weights and [n, d] vectors (es.py:115-122).

    Returns (total [d], num_items_summed). On device this is just a matvec;
    the reference's chunking exists for CPU RAM and is not needed when `vecs`
    is already materialized — see `gradient_from_noise` for the streaming
    variant used on the hot path.
    """
    total = jnp.einsum("n,nd->d", weights.astype(jnp.float32), vecs.astype(jnp.float32))
    return total, weights.shape[0]


@partial(jax.jit, static_argnums=(3, 4))
def gradient_from_noise(
    table_noise: jax.Array,  # [count] f32 noise table buffer
    noise_idxs: jax.Array,  # [n] int32 start offsets
    weights: jax.Array,  # [n] f32 per-pair weights (w⁺ - w⁻)
    dim: int,
    chunk: int = 256,
) -> jax.Array:
    """g = Σᵢ wᵢ · table[idxᵢ:idxᵢ+dim], streamed in chunks.

    The device analog of the reference's 500-vector chunked accumulation
    (es.py:291-296): a `lax.scan` over index chunks, each iteration gathering
    [chunk, dim] rows from HBM and accumulating one matvec. Peak live memory
    is chunk·dim·4 bytes instead of n·dim·4.

    `table_noise` may also be a `VirtualNoise` source: rows are then
    REGENERATED from the counter-based PRNG instead of read from HBM —
    the gradient trades its table bandwidth for VPU compute entirely.
    """
    from .noise import noise_rows

    n = noise_idxs.shape[0]
    pad = (-n) % chunk
    idxs = jnp.concatenate([noise_idxs, jnp.zeros((pad,), noise_idxs.dtype)])
    w = jnp.concatenate([weights.astype(jnp.float32), jnp.zeros((pad,), jnp.float32)])
    idxs = idxs.reshape(-1, chunk)
    w = w.reshape(-1, chunk)

    def body(acc, iw):
        chunk_idxs, chunk_w = iw
        rows = noise_rows(table_noise, chunk_idxs, dim)
        return acc + jnp.einsum("c,cd->d", chunk_w, rows), None

    g, _ = jax.lax.scan(body, jnp.zeros((dim,), jnp.float32), (idxs, w))
    return g


def itergroups(items, group_size: int):
    """Host-side grouping helper (es.py:95-104); used by host data plumbing."""
    assert group_size >= 1
    group = []
    for x in items:
        group.append(x)
        if len(group) == group_size:
            yield tuple(group)
            group = []
    if group:
        yield tuple(group)
