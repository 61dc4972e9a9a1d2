"""Shared Gaussian noise table, device-resident.

Reference semantics: es_distributed/es.py:51-67 (`SharedNoiseTable`) — a
250M-float32 (~1 GB) table of standard normals drawn with
`np.random.RandomState(123).randn`, shared read-only by all workers.
Perturbations and GA genomes are *indices* into this table: `get(i, dim)`
returns the slice `noise[i:i+dim]`, and `sample_index` draws a uniform valid
start offset.

TPU-native design: the table is a single HBM-resident `[count]` f32 array,
replicated across the mesh (every device derives identical updates from the
same indices, so the table never needs to move — the reference already proves
seeds-not-weights suffices, es_distributed/es.py:430). `get` is a
`lax.dynamic_slice` (one HBM DMA); batched gathers are vmapped slices feeding
the gradient einsum.

Two sources are provided:

* ``NoiseTable`` — materialized table, bit-compatible with the reference when
  built with ``from_seed`` (same RandomState stream).
* ``VirtualNoise`` — counter-based: `get(i, dim)` regenerates the block from
  a PRNG key folded with `i`. No HBM table at all; trades HBM bandwidth for
  VPU compute. Not bit-compatible with the reference table (documented
  divergence) but statistically identical; useful when HBM is tight.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_COUNT = 250_000_000  # reference: es_distributed/es.py:55
DEFAULT_SEED = 123  # reference: es_distributed/es.py:54


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class NoiseTable:
    """HBM-resident shared noise table (reference es.py:51-67 semantics)."""

    noise: jax.Array  # [count] float32

    def tree_flatten(self):
        return (self.noise,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_seed(
        cls, count: int = DEFAULT_COUNT, seed: int = DEFAULT_SEED, device_put: bool = True
    ) -> "NoiseTable":
        """Build the table exactly as the reference does (es.py:60: 64→32-bit
        conversion of RandomState(seed).randn)."""
        host = np.random.RandomState(seed).randn(count).astype(np.float32)
        return cls(jnp.asarray(host) if device_put else host)

    @classmethod
    def from_key(cls, key: jax.Array, count: int = DEFAULT_COUNT) -> "NoiseTable":
        """On-device table generation (fast startup; not RandomState-compatible)."""
        return cls(jax.random.normal(key, (count,), dtype=jnp.float32))

    @property
    def size(self) -> int:
        return self.noise.shape[0]

    @partial(jax.jit, static_argnums=(2,))
    def get(self, i: jax.Array, dim: int) -> jax.Array:
        """noise[i:i+dim] — `dim` static so the slice jits to one DMA."""
        return jax.lax.dynamic_slice(self.noise, (i,), (dim,))

    @partial(jax.jit, static_argnums=(2,))
    def get_batch(self, idxs: jax.Array, dim: int) -> jax.Array:
        """Stacked rows [B, dim] for a batch of start indices [B]."""
        return jax.vmap(lambda i: jax.lax.dynamic_slice(self.noise, (i,), (dim,)))(idxs)

    @partial(jax.jit, static_argnums=(2,))
    def sample_index(self, key: jax.Array, dim: int) -> jax.Array:
        """Uniform over valid offsets [0, size-dim] inclusive (es.py:66-67)."""
        return jax.random.randint(key, (), 0, self.size - dim + 1, dtype=jnp.int32)

    @partial(jax.jit, static_argnums=(2, 3, 4))
    def sample_index_batch(self, key: jax.Array, dim: int, n: int, align: int = 1) -> jax.Array:
        """Batch of start offsets; `align` > 1 quantizes offsets to that
        granule (required by the Pallas gradient kernel — see
        ops/pallas_kernels.py alignment contract)."""
        if align <= 1:
            return jax.random.randint(key, (n,), 0, self.size - dim + 1, dtype=jnp.int32)
        hi = (self.size - dim) // align + 1
        return jax.random.randint(key, (n,), 0, hi, dtype=jnp.int32) * align


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class VirtualNoise:
    """Counter-based noise source with the NoiseTable interface.

    `get(i, dim)` = standard normals from `fold_in(key, i)`. Indices are
    opaque stream ids rather than overlapping table offsets; everything else
    (antithetic pairs, seed-chain genomes, gradient reconstruction) works
    unchanged because the ES math only requires that the same index
    regenerates the same noise everywhere.
    """

    key: jax.Array
    count: int = DEFAULT_COUNT  # index range, for interface parity

    def tree_flatten(self):
        return (self.key,), (self.count,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    @classmethod
    def from_seed(cls, count: int = DEFAULT_COUNT, seed: int = DEFAULT_SEED) -> "VirtualNoise":
        return cls(jax.random.PRNGKey(seed), count)

    @property
    def size(self) -> int:
        return self.count

    @partial(jax.jit, static_argnums=(2,))
    def get(self, i: jax.Array, dim: int) -> jax.Array:
        return jax.random.normal(jax.random.fold_in(self.key, i), (dim,), dtype=jnp.float32)

    @partial(jax.jit, static_argnums=(2,))
    def get_batch(self, idxs: jax.Array, dim: int) -> jax.Array:
        return jax.vmap(lambda i: self.get(i, dim))(idxs)

    @partial(jax.jit, static_argnums=(2,))
    def sample_index(self, key: jax.Array, dim: int) -> jax.Array:
        return jax.random.randint(key, (), 0, self.size - dim + 1, dtype=jnp.int32)

    @partial(jax.jit, static_argnums=(2, 3))
    def sample_index_batch(self, key: jax.Array, dim: int, n: int) -> jax.Array:
        return jax.random.randint(key, (n,), 0, self.size - dim + 1, dtype=jnp.int32)


# -------------------------------------------------------------- source dispatch
# The ES/GA hot paths accept either the raw [N] f32 table buffer (NoiseTable
# — arrays trace cheaply through jit) or a VirtualNoise pytree; these helpers
# are the single dispatch point (isinstance is static at trace time, so each
# source kind compiles its own program).


def noise_rows(source, idxs: jax.Array, dim: int) -> jax.Array:
    """[B, dim] noise rows from a table buffer or a VirtualNoise."""
    if isinstance(source, VirtualNoise):
        return source.get_batch(idxs, dim)
    return jax.vmap(lambda i: jax.lax.dynamic_slice(source, (i,), (dim,)))(idxs)


def noise_row(source, i: jax.Array, dim: int) -> jax.Array:
    """One [dim] noise row from a table buffer or a VirtualNoise."""
    if isinstance(source, VirtualNoise):
        return source.get(i, dim)
    return jax.lax.dynamic_slice(source, (i,), (dim,))


def noise_source_size(source):
    return source.size if isinstance(source, VirtualNoise) else source.shape[0]


def sample_source_idxs(source, key: jax.Array, dim: int, n: int, aligned: bool = False):
    """Valid start offsets; `aligned` requests the GRANULE-aligned sampling
    of the Pallas gradient contract (meaningless for VirtualNoise, whose
    indices are opaque stream ids)."""
    if isinstance(source, VirtualNoise):
        return source.sample_index_batch(key, dim, n)
    if aligned:
        from .pallas_kernels import sample_aligned_indices

        return sample_aligned_indices(key, source.shape[0], dim, n)
    return jax.random.randint(key, (n,), 0, source.shape[0] - dim + 1, dtype=jnp.int32)
