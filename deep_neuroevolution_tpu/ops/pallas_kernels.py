"""Pallas TPU kernels for the noise-table hot path.

The ES gradient g = Σᵢ wᵢ·table[idxᵢ:idxᵢ+D] is the framework's biggest
HBM-bandwidth consumer at Atari scale (pop 5000 × 4M params ⇒ ~80 GB of
table reads per generation — the device analog of the reference's 10 GB CPU
noise streaming, es_distributed/es.py:291-296). The XLA path
(ops.fitness.gradient_from_noise) gathers [chunk, D] rows into HBM scratch
and then matmuls them — two passes over the row data. This kernel streams
each row slice HBM→VMEM with double-buffered async DMA and accumulates
in-register, one pass total.

Layout: grid over D tiles; each program owns g[t·T:(t+1)·T], loops over all
B rows, DMAing table[idxᵢ+t·T : +T] (pipelined) and accumulating wᵢ·slice.
Scalar-prefetched indices (PrefetchScalarGridSpec) let the DMA offsets be
computed before the body runs (pallas guide §PrefetchScalarGridSpec).

OOB contract: the last tile may read up to pad-1 elements past idx+D;
callers must guarantee `table.shape[0] >= max(idx) + padded_dim`. Overread
lanes land in discarded padding outputs; no masking needed.

Alignment contract: Mosaic requires dynamic HBM slice offsets to be provably
divisible by the 1-D tiling (1024 f32). Indices passed here must therefore
be multiples of `GRANULE` (sample them with
`NoiseTable.sample_index_batch(..., align=GRANULE)`). Quantizing start
offsets to 1024 leaves ~244k distinct slices in the standard 250M table —
statistically irrelevant for ES (duplicate slices across members merely
share noise), and documented as the one divergence of the Pallas path from
the reference's byte-granular indexing (es.py:66-67).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
GRANULE = 1024  # required alignment of noise indices (Mosaic 1-D HBM tiling)
# floats per grid tile. The stream is per-DMA-overhead-bound: on v5e,
# 64 KB tiles measured 263 GB/s, 512 KB tiles 728 GB/s (~HBM roof) for the
# pop-5000 x 1M-param gradient. Tiles adapt to the dim (see _auto_tile):
# big dims get MAX_TILE; small dims avoid the round-up overread.
MAX_TILE = 128 * 1024  # 512 KB
DEFAULT_TILE = 16 * 1024  # legacy explicit value (tests)


def _auto_tile(dim: int) -> int:
    return min(MAX_TILE, _round_up(dim, GRANULE))


def _fit_tile(dim: int, table_size: int) -> int:
    """Largest auto tile whose padded dim still fits `table_size`.

    The kernel overreads up to round_up(dim, tile) per row, so the sampler
    and the kernel must agree on the tile — both derive it from (dim,
    table_size) here. Tables sized for smaller historical tiles (e.g.
    count = num_params + 10k with a 512 KB auto tile) shrink the tile
    instead of silently sampling from an empty range (jax.random.randint
    with hi <= 0 is undefined under jit — garbage indices, OOB DMA)."""
    tile = _auto_tile(dim)
    while tile > GRANULE and _round_up(dim, tile) > table_size:
        tile //= 2  # MAX_TILE is a power-of-two multiple of GRANULE
    if _round_up(dim, max(tile, GRANULE)) > table_size:
        raise ValueError(
            f"noise table too small for the padded dim: table_size={table_size} "
            f"< round_up(dim={dim}, GRANULE={GRANULE})={_round_up(dim, GRANULE)}; "
            f"grow the table (see required_table_size)"
        )
    return max(tile, GRANULE)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _grad_kernel(idx_ref, w_ref, table_ref, out_ref, acc_ref, bufs_ref, sems):
    """One D-tile: stream all B row slices through 2 VMEM buffers.

    `table_ref` is the noise table viewed as [N//LANE, LANE]; row offsets are
    (idx + base)/LANE, provably sublane-aligned because indices are
    GRANULE-aligned."""
    t = pl.program_id(0)
    sub = acc_ref.shape[0]
    tile = sub * LANE
    B = idx_ref.shape[0]
    base = t * tile

    def dma(slot, i):
        row = pl.multiple_of((idx_ref[i] + base) // LANE, GRANULE // LANE)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(row, sub), :],
            bufs_ref.at[slot],
            sems.at[slot],
        )

    acc_ref[:] = jnp.zeros_like(acc_ref)
    dma(0, 0).start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < B)
        def _():
            dma(nxt, i + 1).start()

        dma(slot, i).wait()
        acc_ref[:] += w_ref[i] * bufs_ref[slot]
        return ()

    jax.lax.fori_loop(0, B, body, (), unroll=False)
    out_ref[:] = acc_ref[:]


@partial(jax.jit, static_argnums=(3, 4, 5))
def gradient_from_noise_pallas(
    table: jax.Array,  # [N] f32; N >= max(idx) + padded dim
    idxs: jax.Array,  # [B] int32
    weights: jax.Array,  # [B] f32
    dim: int,
    tile: int = None,
    interpret: bool = False,
) -> jax.Array:
    """g[dim] = Σ wᵢ·table[idxᵢ:idxᵢ+dim], single-pass streaming kernel."""
    tile = tile or _fit_tile(dim, table.shape[0])
    dim_pad = _round_up(dim, tile)
    ntiles = dim_pad // tile
    sub = tile // LANE  # rows of the (sub, LANE) VMEM tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # idxs, weights
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # table stays in HBM
        out_specs=pl.BlockSpec(
            (sub, LANE), lambda t, idx_ref, w_ref: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((sub, LANE), jnp.float32),  # accumulator
            pltpu.VMEM((2, sub, LANE), jnp.float32),  # double buffers
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    n_rows = table.shape[0] // LANE
    table2d = table[: n_rows * LANE].reshape(n_rows, LANE)
    out = pl.pallas_call(
        _grad_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((dim_pad // LANE, LANE), jnp.float32),
        interpret=interpret,
    )(idxs, weights.astype(jnp.float32), table2d)
    return out.reshape(-1)[:dim]


def required_table_size(count: int, dim: int, tile: int = None) -> int:
    """Table length needed so sample_index(count_official) + padded dim never
    reads OOB: official count + (padded - dim)."""
    tile = tile or _auto_tile(dim)
    return count + (_round_up(dim, tile) - dim)


def sample_aligned_indices(
    key: jax.Array, table_size: int, dim: int, n: int, tile: int = None
) -> jax.Array:
    """GRANULE-aligned start offsets safe for the padded-tile overread:
    idx + round_up(dim, tile) ≤ table_size always holds. The default tile
    matches gradient_from_noise_pallas' for the same (dim, table_size)."""
    tile = tile or _fit_tile(dim, table_size)
    dim_pad = _round_up(dim, tile)
    hi = (table_size - dim_pad) // GRANULE + 1
    if hi < 1:
        raise ValueError(
            f"noise table too small for tile={tile}: table_size={table_size} "
            f"< round_up(dim={dim}, tile)={dim_pad}"
        )
    return jax.random.randint(key, (n,), 0, hi, dtype=jnp.int32) * GRANULE


def is_tpu_backend() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
