"""Fused Pallas population forward for the VBN small-DQN — two kernels.

One grid step = one member: Mosaic's block pipeline streams member i+1's
weights into VMEM while member i computes, with no intermediate HBM
round-trips inside each kernel. This is the end state of the
IndexedBatchMatMul replacement (ops/indexedmatmul.cpp:145-214): the
composite XLA path costs ~5.9 µs/member (bf16, B=256, measured r3); the
fused path's floor is the ~2.2 MB/member weight DMA ≈ 2.7 µs at v5e HBM.

Why TWO kernels: the natural single-kernel design needs the conv2→fc
flatten [121,32] → [1,3872] in-kernel, a lane-merge relayout Mosaic rejects
("infer-vector-layout: unsupported shape cast", measured on v5e). The
flatten is therefore done BETWEEN kernels by XLA (a 15 KB/member HBM
round-trip — noise next to the 2 MB fc weights):

  kernel A  conv1 GEMM → folded-VBN relu → in-kernel conv2 im2col →
            conv2 GEMM → folded-VBN relu → x2 [121, 32]
  (XLA)     x2 reshape [3872] + bf16 cast
  kernel B  fc mat-vec [1,3872]·[3872,256] → folded-VBN relu →
            out layer [1,256]·[256,64] + bias → scores

conv1's im2col also runs outside in XLA (extract_patches is
member-independent data movement; +226 KB/member, ~10% extra traffic,
saves a 5-D in-kernel transpose).

The VBN normalization is pre-folded per member into scale/shift pairs:
    y = x̂·a + c,  a = inv_σ·(1+γ),  c = b − µ·a
(batchnorm.py:74-77 moments; the fold is exact algebra, fp-reassociated).

Layout contract (built by `VirtualBNDQN.fuse_prepare`):
  patches1 [B, 441, 256] bf16   im2col of the 84×84×4 obs, k8 s4 SAME
  w1       [B, 256, 16]  bf16   conv1 HWIO reshaped [k·k·cin, 16]
  w2       [B, 256, 32]  bf16   conv2 HWIO reshaped, K order (i, j, c)
  wf       [B, 3872, 256] bf16  fc, rows in (h, w, c) flatten order
  wo       [B, 256, 64]  f32    out weights, lanes padded 18→64 with 0
  a1/c1 [B,1,16], a2/c2 [B,1,32], a3/c3 [B,1,256] f32, bo [B,1,64] f32
  (bo padded with -1e9 beyond num_actions so argmax never picks padding)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H1, C1 = 21, 16          # conv1 output: 21×21×16
H2, C2 = 11, 32          # conv2 output: 11×11×32
K2 = 4                   # conv2 kernel
P1, KK1 = H1 * H1, 256   # conv1 patches rows / features (8·8·4)
P2, KK2 = H2 * H2, 256   # conv2 patches rows / features (4·4·16)
FC = 256
NOUT = 64                # padded action lanes


def _conv_kernel(p1_ref, w1_ref, a1_ref, c1_ref, w2_ref, a2_ref, c2_ref, x2_ref,
                 pad_ref):
    # conv1: [441,256]·[256,16] on the MXU, then folded VBN + relu
    h1 = jnp.dot(p1_ref[0], w1_ref[0], preferred_element_type=jnp.float32)
    x1 = jnp.maximum(h1 * a1_ref[0] + c1_ref[0], 0.0)  # [441,16]

    # conv2, in-kernel, WITHOUT materializing the [121,256] im2col matrix:
    # Mosaic rejects both the pad-concat and the 16-way lane-concat of the
    # strided slices (sublane-offset mismatches), so conv2 is computed as
    # the K-split sum  h2 = Σ_{(i,j)} patch_{ij} [121,16] · w2[(i,j)-rows]
    # [16,32] — 16 small MXU GEMMs accumulating in registers, exactly the
    # same contraction in (i,j,c) order as w2's [256,32] reshape. SAME pad
    # (1 low, 2 high) is a static-offset store into a zeroed VMEM scratch;
    # stride-2 slicing rides the [12,2,...] split view.
    pad_ref[...] = jnp.zeros((H1 + 3, H1 + 3, C1), jnp.float32)
    pad_ref[1 : 1 + H1, 1 : 1 + H1, :] = x1.reshape(H1, H1, C1)
    xv = pad_ref[...].reshape(12, 2, 12, 2, C1)
    h2 = jnp.zeros((P2, C2), jnp.float32)
    for i in range(K2):
        qi, ri = divmod(i, 2)
        for j in range(K2):
            qj, rj = divmod(j, 2)
            sl = xv[qi : qi + H2, ri, qj : qj + H2, rj, :]  # [11, 11, 16]
            patch = sl.reshape(P2, C1).astype(w2_ref.dtype)
            k = i * K2 + j
            wk = w2_ref[0, k * C1 : (k + 1) * C1, :]  # [16, 32]
            h2 = h2 + jnp.dot(patch, wk, preferred_element_type=jnp.float32)
    x2_ref[0] = jnp.maximum(h2 * a2_ref[0] + c2_ref[0], 0.0)  # [121, 32]


def _head_kernel(xf_ref, wf_ref, a3_ref, c3_ref, wo_ref, bo_ref, out_ref):
    # fc: M=1 MXU mat-vec over the member's 991k fc weights (the HBM bill)
    h3 = jnp.dot(xf_ref[0], wf_ref[0], preferred_element_type=jnp.float32)  # [1,256]
    x3 = jnp.maximum(h3 * a3_ref[0] + c3_ref[0], 0.0)
    # out layer (f32; padded lanes carry -1e9 bias so they never win argmax)
    out_ref[0] = jnp.dot(x3, wo_ref[0], preferred_element_type=jnp.float32) + bo_ref[0]


def _spec(*shape):
    return pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape), memory_space=pltpu.VMEM
    )


# ---------------------------------------------------------------------------
# Single-kernel VBN small-DQN: the two-kernel split above pays an HBM
# round-trip + two grid pipelines; this variant computes the WHOLE member in
# one grid step using the same flatten-free fc trick as the LargeDQN kernel
# below (channel-major FMA accumulation + ones-row p-reduce) and the
# scratch-assembled conv2 im2col (one GEMM instead of 16 K-split dots).
# Floor: the ~2.2 MB/member weight DMA ≈ 2.8 us at v5e HBM, with all conv/fc
# compute (~2 us) hidden under it.
# ---------------------------------------------------------------------------


def _vbn_fused1_kernel(p1_ref, w1_ref, a1_ref, c1_ref, w2_ref, a2_ref, c2_ref,
                       wf_ref, a3_ref, c3_ref, wo_ref, bo_ref, out_ref,
                       pad_ref, im2_ref):
    # conv1 + folded VBN + relu
    h1 = jnp.dot(p1_ref[0], w1_ref[0], preferred_element_type=jnp.float32)
    x1 = jnp.maximum(h1 * a1_ref[0] + c1_ref[0], 0.0)  # [441, 16]

    # conv2 k4 s2 (21→11): scratch-assembled im2col, one GEMM
    pad_ref[...] = jnp.zeros((H1 + 3, H1 + 3, C1), jnp.float32)
    pad_ref[1 : 1 + H1, 1 : 1 + H1, :] = x1.reshape(H1, H1, C1)
    xv = pad_ref[...].reshape(12, 2, 12, 2, C1)
    for i in range(K2):
        qi, ri = divmod(i, 2)
        for j in range(K2):
            qj, rj = divmod(j, 2)
            sl = xv[qi : qi + H2, ri, qj : qj + H2, rj, :]
            k = i * K2 + j
            im2_ref[:, k * C1 : (k + 1) * C1] = sl.reshape(P2, C1)
    h2 = jnp.dot(im2_ref[...].astype(w2_ref.dtype), w2_ref[0],
                 preferred_element_type=jnp.float32)
    x2 = jnp.maximum(h2 * a2_ref[0] + c2_ref[0], 0.0)  # [121, 32]

    # fc without the flatten: channel-major FMA + ones-row p-reduce
    z = jnp.zeros((P2, FC), jnp.float32)
    for c in range(C2):
        z = z + x2[:, c : c + 1] * wf_ref[0, c].astype(jnp.float32)
    ones = jnp.ones((1, P2), jnp.float32)
    h3 = jnp.dot(ones, z, preferred_element_type=jnp.float32)
    x3 = jnp.maximum(h3 * a3_ref[0] + c3_ref[0], 0.0)  # [1, 256]

    out_ref[0] = jnp.dot(x3, wo_ref[0], preferred_element_type=jnp.float32) + bo_ref[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def vbn_dqn_fused1_scores(ops: dict, interpret: bool = False) -> jax.Array:
    """Single-kernel VBN-DQN forward. Layout = `fuse_prepare` plus
    `wf_cm` [B, 32, 121, 256]: fc rows re-ordered channel-major
    (wf_cm[b, c, p, :] = fc/w[b, p·32+c, :] — NHWC flatten index p·32+c)."""
    B = ops["patches1"].shape[0]
    return pl.pallas_call(
        _vbn_fused1_kernel,
        grid=(B,),
        in_specs=[
            _spec(P1, KK1),
            _spec(KK1, C1), _spec(1, C1), _spec(1, C1),
            _spec(KK2, C2), _spec(1, C2), _spec(1, C2),
            _spec(C2, P2, FC), _spec(1, FC), _spec(1, FC),
            _spec(FC, NOUT), _spec(1, NOUT),
        ],
        out_specs=_spec(1, NOUT),
        out_shape=jax.ShapeDtypeStruct((B, 1, NOUT), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((H1 + 3, H1 + 3, C1), jnp.float32),
            pltpu.VMEM((P2, KK2), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (P1 * KK1 * C1 + P2 * KK2 * C2 + P2 * C2 * FC + FC * NOUT),
            bytes_accessed=B * (P1 * KK1 * 2 + (KK1 * C1 + KK2 * C2
                                + C2 * P2 * FC) * 2 + FC * NOUT * 4),
            transcendentals=0,
        ),
    )(
        ops["patches1"], ops["w1"], ops["a1"], ops["c1"], ops["w2"], ops["a2"],
        ops["c2"], ops["wf_cm"], ops["a3"], ops["c3"], ops["wo"], ops["bo"],
    )[:, 0, :]


# ---------------------------------------------------------------------------
# Whole-net LargeDQN kernel: convs + fc + out in ONE grid step per member.
#
# The r4 profile chain: split-path fc (XLA einsum) 10.7 us + conv einsum ~5 us
# execute SEQUENTIALLY on the single v5e core — nothing overlaps across XLA
# ops. Fusing the whole member into one kernel hides the conv/fc COMPUTE
# (~9 us) under the member's ~8.4 MB weight-DMA stream (~10.5 us at HBM
# roof): Mosaic prefetches member i+1's weights while member i computes.
#
# The blocker for any fused DQN head is the conv→fc flatten ([121, 64] →
# [1, 7744] is a lane-merge relayout Mosaic rejects, and its matmul op
# supports neither 2-D-contracting nor batched dot_general — both verified
# on v5e). The fc is therefore computed WITHOUT flattening:
#     z[p, n]  = Σ_c x3[p, c] · Wf[c, p, n]     (64 VPU lane-broadcast FMAs
#                                                over a channel-major weight
#                                                layout built at prepare)
#     fc[n]    = Σ_p z[p, n]                    (one [1,121]·[121,512] GEMM
#                                                against a ones row)
# which is exactly y = x3_flat @ wf with the sum re-associated (f32 accum).
# ---------------------------------------------------------------------------

LG_C1, LG_C2, LG_C3, LG_FC = 32, 64, 64, 512


def _large_fused_kernel(p1_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                        wf_ref, bf_ref, wo_ref, bo_ref, out_ref,
                        pad2_ref, pad3_ref, im2_ref, im3_ref, *,
                        fc_mode: str = "fma", conv_mode: str = "ksplit"):
    # conv1 k8 s4: [441,256]·[256,32] + bias, relu
    h1 = jnp.dot(p1_ref[0], w1_ref[0], preferred_element_type=jnp.float32)
    x1 = jnp.maximum(h1 + b1_ref[0], 0.0)  # [441, 32]

    # conv2 k4 s2 SAME (21→11): zero-padded stride-2 view
    pad2_ref[...] = jnp.zeros((HPAD2, HPAD2, LG_C1), jnp.float32)
    pad2_ref[1 : 1 + H1, 1 : 1 + H1, :] = x1.reshape(H1, H1, LG_C1)
    xv = pad2_ref[...].reshape(HPAD2 // 2, 2, HPAD2 // 2, 2, LG_C1)
    if conv_mode == "scratch":
        # assemble the [121, 512] im2col matrix in VMEM scratch by column
        # blocks, then ONE MXU GEMM — 16 small dots become 16 stores + 1 dot
        for i in range(K2):
            qi, ri = divmod(i, 2)
            for j in range(K2):
                qj, rj = divmod(j, 2)
                sl = xv[qi : qi + H2, ri, qj : qj + H2, rj, :]
                k = i * K2 + j
                im2_ref[:, k * LG_C1 : (k + 1) * LG_C1] = sl.reshape(P2, LG_C1)
        h2 = jnp.dot(im2_ref[...].astype(w2_ref.dtype), w2_ref[0],
                     preferred_element_type=jnp.float32)
    else:
        h2 = jnp.zeros((P2, LG_C2), jnp.float32)
        for i in range(K2):
            qi, ri = divmod(i, 2)
            for j in range(K2):
                qj, rj = divmod(j, 2)
                sl = xv[qi : qi + H2, ri, qj : qj + H2, rj, :]
                patch = sl.reshape(P2, LG_C1).astype(w2_ref.dtype)
                k = i * K2 + j
                h2 = h2 + jnp.dot(
                    patch, w2_ref[0, k * LG_C1 : (k + 1) * LG_C1, :],
                    preferred_element_type=jnp.float32,
                )
    x2 = jnp.maximum(h2 + b2_ref[0], 0.0)  # [121, 64]

    # conv3 k3 s1 SAME: 9 static-offset slices of the padded grid
    pad3_ref[...] = jnp.zeros((HPAD3, HPAD3, LG_C2), jnp.float32)
    pad3_ref[1 : 1 + H2, 1 : 1 + H2, :] = x2.reshape(H2, H2, LG_C2)
    if conv_mode == "scratch":
        for i in range(3):
            for j in range(3):
                sl = pad3_ref[i : i + H2, j : j + H2, :]
                k = i * 3 + j
                im3_ref[:, k * LG_C2 : (k + 1) * LG_C2] = sl.reshape(P2, LG_C2)
        h3 = jnp.dot(im3_ref[...].astype(w3_ref.dtype), w3_ref[0],
                     preferred_element_type=jnp.float32)
    else:
        h3 = jnp.zeros((P2, LG_C3), jnp.float32)
        for i in range(3):
            for j in range(3):
                sl = pad3_ref[i : i + H2, j : j + H2, :]
                patch = sl.reshape(P2, LG_C2).astype(w3_ref.dtype)
                k = i * 3 + j
                h3 = h3 + jnp.dot(
                    patch, w3_ref[0, k * LG_C2 : (k + 1) * LG_C2, :],
                    preferred_element_type=jnp.float32,
                )
    x3 = jnp.maximum(h3 + b3_ref[0], 0.0)  # [121, 64]

    # fc without the flatten (see module comment). Variants raced on v5e:
    if fc_mode == "fma":
        # channel-major VPU FMA accumulation then p-reduce
        z = jnp.zeros((P2, LG_FC), jnp.float32)
        for c in range(LG_C3):
            z = z + x3[:, c : c + 1] * wf_ref[0, c].astype(jnp.float32)
        ones = jnp.ones((1, P2), jnp.float32)
        h4 = jnp.dot(ones, z, preferred_element_type=jnp.float32) + bf_ref[0]
    elif fc_mode == "mxu_t":
        # transpose x3 once, then 64 M=1 MXU mat-vecs [1,121]·[121,512]
        x3t = x3.T.astype(wf_ref.dtype)  # [64, 121]
        h4 = jnp.zeros((1, LG_FC), jnp.float32)
        for c in range(LG_C3):
            h4 = h4 + jnp.dot(
                x3t[c : c + 1, :], wf_ref[0, c],
                preferred_element_type=jnp.float32,
            )
        h4 = h4 + bf_ref[0]
    else:
        raise ValueError(fc_mode)
    x4 = jnp.maximum(h4, 0.0)  # [1, 512]

    # out layer (padded lanes carry -1e9 bias so argmax never picks them)
    out_ref[0] = jnp.dot(
        x4.astype(wo_ref.dtype), wo_ref[0], preferred_element_type=jnp.float32
    ) + bo_ref[0]


@functools.partial(jax.jit, static_argnames=("interpret", "fc_mode", "conv_mode"))
def large_dqn_fused_scores(ops: dict, interpret: bool = False,
                           fc_mode: str = "fma",
                           conv_mode: str = "scratch") -> jax.Array:
    # defaults = the r4 on-chip race winners (results/exp_large_fwd_r04.json):
    #   fc 'fma' 12.71 vs 'mxu_t' 15.40 us/member (64 M=1 MXU dots lose to
    #   the VPU FMA accumulation); conv 'scratch' 11.76 vs 'ksplit' 12.71
    #   (scratch-assembled im2col + one GEMM per layer beats 25 small dots)
    """ops: the LargeDQN `fuse_prepare` layout (+ per-step patches1) →
    padded scores [B, 64] f32. Layout contract:
      patches1 [B, 441, 256] bf16   im2col of the obs, k8 s4 SAME
      w1 [B, 256, 32], w2 [B, 512, 64], w3 [B, 576, 64] bf16 ((i,j,c) rows)
      wf [B, 64, 121, 512] bf16     fc rows re-ordered CHANNEL-major:
                                    wf[b, c, p, :] = fc/w[b, p·64+c, :]
      b1/b2/b3 [B, 1, C] f32, bf [B, 1, 512] f32
      wo [B, 512, 64] f32 (lanes padded; f32 so the decision layer matches
      the split route's f32 scores — bf16 here flips near-tie argmaxes),
      bo [B, 1, 64] f32 (pad = -1e9)
    """
    B = ops["patches1"].shape[0]
    return pl.pallas_call(
        functools.partial(_large_fused_kernel, fc_mode=fc_mode,
                          conv_mode=conv_mode),
        grid=(B,),
        in_specs=[
            _spec(P1, 256),
            _spec(256, LG_C1), _spec(1, LG_C1),
            _spec(16 * LG_C1, LG_C2), _spec(1, LG_C2),
            _spec(9 * LG_C2, LG_C3), _spec(1, LG_C3),
            _spec(LG_C3, P2, LG_FC), _spec(1, LG_FC),
            _spec(LG_FC, NOUT), _spec(1, NOUT),
        ],
        out_specs=_spec(1, NOUT),
        out_shape=jax.ShapeDtypeStruct((B, 1, NOUT), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((HPAD2, HPAD2, LG_C1), jnp.float32),
            pltpu.VMEM((HPAD3, HPAD3, LG_C2), jnp.float32),
            pltpu.VMEM((P2, 16 * LG_C1), jnp.float32),  # conv2 im2col scratch
            pltpu.VMEM((P2, 9 * LG_C2), jnp.float32),  # conv3 im2col scratch
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (P1 * 256 * LG_C1 + P2 * 512 * LG_C2 + P2 * 576 * LG_C3
                           + P2 * LG_C3 * LG_FC + LG_FC * NOUT),
            bytes_accessed=B * (P1 * 256 * 2 + (256 * LG_C1 + 512 * LG_C2
                                + 576 * LG_C3 + LG_C3 * P2 * LG_FC) * 2
                                + LG_FC * NOUT * 2),
            transcendentals=0,
        ),
    )(
        ops["patches1"], ops["w1"], ops["b1"], ops["w2"], ops["b2"],
        ops["w3"], ops["b3"], ops["wf"], ops["bf"], ops["wo"], ops["bo"],
    )[:, 0, :]


# ---------------------------------------------------------------------------
# Plain-bias conv-chain kernel (GA models: SmallDQN / LargeDQN, dqn.py:30-47)
#
# The r4 LargeDQN stage profile (results/profile_stages_r04_large.json)
# showed the batch-explicit conv einsum chain costing ~5 us/member for only
# ~0.5 MB/member of traffic: the im2col patch matrices round-trip HBM
# between every layer and the tiny N=32/64 GEMMs starve the MXU. This
# kernel keeps the whole conv stack of ONE member in VMEM — conv1 GEMM from
# XLA-side patches, conv2 (k4 s2, 21→11) via the zero-padded stride-2 view,
# optional conv3 (k3 s1, SAME) via 9 static-offset slices — with weight
# blocks for member i+1 streaming while member i computes. Same (i, j, c)
# contraction order as `models.core.batch_conv2d`, so results match the
# split path bit-for-bit up to f32 accumulation order.
# ---------------------------------------------------------------------------

HPAD2 = H1 + 3  # 21 + SAME pad (1 low, 2 high) for k4 s2
HPAD3 = H2 + 2  # 11 + SAME pad (1, 1) for k3 s1


def _conv_chain_kernel(*refs, c1: int, c2: int, c3: int):
    """refs: p1, w1, b1, w2, b2, [w3, b3,] out, pad2, [pad3]."""
    has3 = c3 > 0
    if has3:
        p1_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref, pad2_ref, pad3_ref = refs
    else:
        p1_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, pad2_ref = refs

    # conv1: [441, kk1]·[kk1, c1] + bias, relu (dqn.py conv1 k8 s4)
    h1 = jnp.dot(p1_ref[0], w1_ref[0], preferred_element_type=jnp.float32)
    x1 = jnp.maximum(h1 + b1_ref[0], 0.0)  # [441, c1]

    # conv2 k4 s2 SAME (21→11): zero-padded stride-2 view, K-split GEMMs
    pad2_ref[...] = jnp.zeros((HPAD2, HPAD2, c1), jnp.float32)
    pad2_ref[1 : 1 + H1, 1 : 1 + H1, :] = x1.reshape(H1, H1, c1)
    xv = pad2_ref[...].reshape(HPAD2 // 2, 2, HPAD2 // 2, 2, c1)
    h2 = jnp.zeros((P2, c2), jnp.float32)
    for i in range(K2):
        qi, ri = divmod(i, 2)
        for j in range(K2):
            qj, rj = divmod(j, 2)
            sl = xv[qi : qi + H2, ri, qj : qj + H2, rj, :]
            patch = sl.reshape(P2, c1).astype(w2_ref.dtype)
            k = i * K2 + j
            h2 = h2 + jnp.dot(
                patch, w2_ref[0, k * c1 : (k + 1) * c1, :],
                preferred_element_type=jnp.float32,
            )
    x2 = jnp.maximum(h2 + b2_ref[0], 0.0)  # [121, c2]
    if not has3:
        out_ref[0] = x2
        return

    # conv3 k3 s1 SAME (11→11): 9 static-offset slices of the padded grid
    pad3_ref[...] = jnp.zeros((HPAD3, HPAD3, c2), jnp.float32)
    pad3_ref[1 : 1 + H2, 1 : 1 + H2, :] = x2.reshape(H2, H2, c2)
    h3 = jnp.zeros((P2, c3), jnp.float32)
    for i in range(3):
        for j in range(3):
            sl = pad3_ref[i : i + H2, j : j + H2, :]
            patch = sl.reshape(P2, c2).astype(w3_ref.dtype)
            k = i * 3 + j
            h3 = h3 + jnp.dot(
                patch, w3_ref[0, k * c2 : (k + 1) * c2, :],
                preferred_element_type=jnp.float32,
            )
    out_ref[0] = jnp.maximum(h3 + b3_ref[0], 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dqn_conv_chain_fused(
    patches1: jax.Array,  # [B, 441, k·k·cin] bf16 im2col of the obs (k8 s4)
    w1m: jax.Array,  # [B, kk1, c1] bf16  (HWIO reshaped, (i,j,c) rows)
    b1: jax.Array,  # [B, 1, c1] f32
    w2m: jax.Array,  # [B, 16·c1, c2] bf16
    b2: jax.Array,  # [B, 1, c2] f32
    w3m: jax.Array = None,  # [B, 9·c2, c3] bf16 (LargeDQN only)
    b3: jax.Array = None,  # [B, 1, c3] f32
    interpret: bool = False,
) -> jax.Array:
    """Whole conv stack per member in one kernel → [B, 121, c_out] f32
    activations (flatten + fc run outside: the fc weights dominate the HBM
    bill and route through pop_matvec)."""
    B, p1, kk1 = patches1.shape
    c1 = w1m.shape[-1]
    c2 = w2m.shape[-1]
    c3 = w3m.shape[-1] if w3m is not None else 0
    assert p1 == P1, patches1.shape
    ins = [patches1, w1m, b1, w2m, b2]
    in_specs = [
        _spec(P1, kk1),
        _spec(kk1, c1), _spec(1, c1),
        _spec(16 * c1, c2), _spec(1, c2),
    ]
    scratch = [pltpu.VMEM((HPAD2, HPAD2, c1), jnp.float32)]
    if c3:
        ins += [w3m, b3]
        in_specs += [_spec(9 * c2, c3), _spec(1, c3)]
        scratch.append(pltpu.VMEM((HPAD3, HPAD3, c2), jnp.float32))
    c_out = c3 or c2
    out = pl.pallas_call(
        functools.partial(_conv_chain_kernel, c1=c1, c2=c2, c3=c3),
        grid=(B,),
        in_specs=in_specs,
        out_specs=_spec(P2, c_out),
        out_shape=jax.ShapeDtypeStruct((B, P2, c_out), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (P1 * kk1 * c1 + P2 * 16 * c1 * c2 + P2 * 9 * c2 * c3),
            bytes_accessed=B * (P1 * kk1 * 2 + (kk1 * c1 + 16 * c1 * c2 + 9 * c2 * c3) * 2
                               + P2 * c_out * 4),
            transcendentals=0,
        ),
    )(*ins)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def vbn_dqn_fused_scores(ops: dict, interpret: bool = False) -> jax.Array:
    """ops: the `fuse_prepare` layout dict (+ patches1) → padded scores
    [B, 64] f32."""
    B = ops["patches1"].shape[0]
    x2 = pl.pallas_call(
        _conv_kernel,
        grid=(B,),
        in_specs=[
            _spec(P1, KK1),
            _spec(KK1, C1), _spec(1, C1), _spec(1, C1),
            _spec(KK2, C2), _spec(1, C2), _spec(1, C2),
        ],
        out_specs=_spec(P2, C2),
        out_shape=jax.ShapeDtypeStruct((B, P2, C2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((H1 + 3, H1 + 3, C1), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (P1 * KK1 * C1 + P2 * KK2 * C2),
            bytes_accessed=B * (P1 * KK1 * 2 + (KK1 * C1 + KK2 * C2) * 2 + P2 * C2 * 4),
            transcendentals=0,
        ),
    )(
        ops["patches1"], ops["w1"], ops["a1"], ops["c1"], ops["w2"], ops["a2"],
        ops["c2"],
    )
    xf = x2.reshape(B, 1, P2 * C2).astype(ops["wf"].dtype)  # XLA-side flatten
    scores = pl.pallas_call(
        _head_kernel,
        grid=(B,),
        in_specs=[
            _spec(1, P2 * C2),
            _spec(P2 * C2, FC), _spec(1, FC), _spec(1, FC),
            _spec(FC, NOUT), _spec(1, NOUT),
        ],
        out_specs=_spec(1, NOUT),
        out_shape=jax.ShapeDtypeStruct((B, 1, NOUT), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (P2 * C2 * FC + FC * NOUT),
            bytes_accessed=B * (P2 * C2 * FC * 2 + FC * NOUT * 4 + P2 * C2 * 2),
            transcendentals=0,
        ),
    )(xf, ops["wf"], ops["a3"], ops["c3"], ops["wo"], ops["bo"])
    return scores[:, 0, :]
