"""Seed-chain genomes: compressed encodings of GA individuals.

Reference semantics — a genome is a chain of noise indices; the first entry
is the init seed, later entries are mutations:

* CPU stack (es_distributed/ga.py:250-264): θ = noise.get(seed₀, D), then
  `policy.reinitialize()` (normalized-column re-init of the raw slice,
  tf_util.py:122-130), then θ += noise_stdev·noise.get(s, D) per later seed —
  all mutations share the global `noise_stdev`.
* GPU stack (gpu neuroevolution/models/base.py:127-156): θ =
  noise.get(seed₀, D)·scale_by, then θ += power·noise.get(idx, D) per
  (idx, power) entry — per-mutation powers enable schedules (helper.py:46-88).

TPU-native design: chains are fixed-width int32/float32 arrays padded with
(idx=0, power=0) sentinel entries so a whole population of genomes is one
[P, L] tensor; reconstruction is a `lax.scan` over chain entries, vmapped
over the population. The parent-θ cache shortcut (base.py:127-138) becomes
unnecessary on device for moderate chains, but `extend` supports
incremental reconstruction from a cached parent θ for long chains.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from .noise import noise_row


@partial(jax.jit, static_argnums=(3,))
def reconstruct_gpu_style(
    table_noise,  # [count] noise buffer, or a VirtualNoise source
    chain_idxs: jax.Array,  # [L] int32; entry 0 = init seed
    chain_powers: jax.Array,  # [L] f32; entry 0 ignored, 0.0 = padding
    dim: int,
    scale_by: jax.Array = None,  # [D] per-param init scale (base.py:142)
) -> jax.Array:
    """θ from a GPU-style chain: θ₀ = ε₀·scale_by; θ += powerₖ·εₖ
    (base.py:139-145). Padded entries contribute 0 via power=0."""
    eps0 = noise_row(table_noise, chain_idxs[0], dim)
    theta0 = eps0 * scale_by if scale_by is not None else eps0

    def body(theta, entry):
        idx, power = entry
        eps = noise_row(table_noise, idx, dim)
        return theta + power * eps, None

    theta, _ = jax.lax.scan(body, theta0, (chain_idxs[1:], chain_powers[1:]))
    return theta


def reconstruct_gpu_style_batch(table_noise, chains_idxs, chains_powers, dim, scale_by=None):
    """Vmapped reconstruction of a [P, L] genome population → [P, D]."""
    fn = lambda ci, cp: reconstruct_gpu_style(table_noise, ci, cp, dim, scale_by)
    return jax.vmap(fn)(chains_idxs, chains_powers)


def extend(theta_parent: jax.Array, table_noise: jax.Array, idx: jax.Array, power, dim: int):
    """One mutation step from a cached parent θ (base.py:148-156
    mutate/compute_mutation)."""
    return theta_parent + power * noise_row(table_noise, idx, dim)


def pad_chains(chains: Sequence[Sequence[tuple]], max_len: int):
    """Host-side: ragged python chains [(idx) or (idx, power), ...] →
    ([P, max_len] idxs, [P, max_len] powers) with zero-padding."""
    import numpy as np

    P = len(chains)
    idxs = np.zeros((P, max_len), np.int32)
    powers = np.zeros((P, max_len), np.float32)
    for p, chain in enumerate(chains):
        assert len(chain) <= max_len, f"chain {p} longer than max_len={max_len}"
        for l, entry in enumerate(chain):
            if isinstance(entry, (tuple, list)):
                idxs[p, l], powers[p, l] = entry[0], entry[1]
            else:
                idxs[p, l] = entry
                powers[p, l] = 1.0  # slot marker; power used only for l>0
    return jnp.asarray(idxs), jnp.asarray(powers)
