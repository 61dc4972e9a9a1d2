"""Pallas TPU kernels for the population forward pass.

The population forward — B members, each with its OWN weights, each acting
on its ONE env frame — is the reference GPU stack's raison d'être
(gpu_implementation/README.md:3; ops/indexedmatmul.cpp:145-214
IndexedBatchMatMul). For the Atari VBN-DQN the cost is overwhelmingly the
fc layer: fc/w is 3872×256 = 991,232 of the net's 1,008,450 params, so one
member-step must stream ~2 MB (bf16) of weights from HBM and multiply them
by a single 3872-vector. That is a *batched mat-vec*: arithmetic intensity
~1 FLOP/byte ⇒ HBM-bandwidth-bound, speed of light ≈ HBM_BW / bytes-per
-member (v5e: ~819 GB/s / 2 MB ≈ 400k member-steps/s).

XLA's lowering of the batched [B,1,K]@[B,K,N] dot (measured r2: ~7 GB/s
effective, 0.54 ms/member flat in B) serializes poorly; this kernel instead
grids over members so Mosaic's block pipeline double-buffers member i+1's
weight DMA behind member i's MXU work — the whole point of the TPU memory
hierarchy (pallas guide §TPU Architecture, §Grid).

`population_linear` is the general primitive (x [B,K] @ W [B,K,N] → [B,N]);
it also serves the Humanoid MLP stack (policies.py:122-206) whose hidden
layers are per-member 256×256 mat-vecs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _linear_kernel(x_ref, w_ref, y_ref, *, members_per_step: int):
    # x_ref [C, 1, K], w_ref [C, K, N], y_ref [C, 1, N]; C members per grid
    # step. Each member's mat-vec is an M=1 MXU matmul; C>1 amortizes
    # grid/DMA overhead for small K·N (MLP layers). The singleton middle dim
    # keeps every block's trailing two dims equal to the array dims (Mosaic
    # block-shape constraint).
    for c in range(members_per_step):
        y_ref[c] = jnp.dot(x_ref[c], w_ref[c], preferred_element_type=jnp.float32)


# NOTE r4: a K-tiled variant (grid (B, nk), revisited output block
# accumulated across k) existed here through r3 and was the GA-Atari
# LargeDQN bottleneck: measured 36.4 us/member ≈ 218 GB/s at B=256 vs the
# plain XLA batched einsum's 10.67 us ≈ 745 GB/s and a whole-member-block
# Pallas kernel's 10.73 us for the identical [256,7744]x[256,7744,512] bf16
# operands (scripts/exp_large_fwd.py race, results/exp_large_fwd_r04.json).
# Mosaic's pipeline does not keep the weight-tile DMA stream saturated when
# the output block is revisited, so large members now route to XLA below.


@functools.partial(jax.jit, static_argnames=("members_per_step", "interpret"))
def population_linear(
    x: jax.Array,
    W: jax.Array,
    members_per_step: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """y[b] = x[b] @ W[b] for every member b — the IndexedBatchMatMul
    replacement (ops/indexedmatmul.cpp:145-214), M=1 case.

    x [B, K] (f32 or bf16), W [B, K, N] (same dtype) → y [B, N] f32.
    B must be divisible by `members_per_step` (C); use C>1 only when
    K·N is small (≲256×256) so several members' weights fit in VMEM.
    """
    B, K = x.shape
    Bw, Kw, N = W.shape
    assert (B, K) == (Bw, Kw), (x.shape, W.shape)
    # Members whose weights exceed the member-pipelined kernel's VMEM
    # double-buffer budget (LargeDQN fc: 7744×512 ≈ 7.9 MB bf16) go to XLA's
    # batched einsum, which runs this shape at ~91% of the v5e HBM roof
    # (745 GB/s measured, tanh-perturbed so nothing hoists — see the r4
    # variant race in the module comment above).
    MAX_K_ELEMS = 4096 * 256
    if K * N > MAX_K_ELEMS and members_per_step == 1:
        return jnp.einsum(
            "bk,bkn->bn", x, W, preferred_element_type=jnp.float32
        ).astype(jnp.float32)
    C = members_per_step
    assert B % C == 0, (B, C)
    grid = (B // C,)
    y = pl.pallas_call(
        functools.partial(_linear_kernel, members_per_step=C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((C, 1, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, K, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, 1, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N,
            bytes_accessed=B * K * N * W.dtype.itemsize + B * K * x.dtype.itemsize + B * N * 4,
            transcendentals=0,
        ),
    )(x[:, None, :], W)
    return y[:, 0, :]


def population_linear_ref(x: jax.Array, W: jax.Array) -> jax.Array:
    """XLA reference semantics for tests/fallback."""
    return jnp.einsum("bk,bkn->bn", x.astype(jnp.float32), W.astype(jnp.float32))
