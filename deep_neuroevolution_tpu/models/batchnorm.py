"""Batch-norm and virtual-batch-norm DQN variants.

Reference:
* `ModelVirtualBN` (gpu neuroevolution/models/batchnorm.py:52-123): bias-free
  conv16(8,4) → conv32(4,2) → fc256 → out(std 1.0); after each of the first
  three layers, per-member VBN: x̂ = (x − μ)·inv_σ + b where μ, inv_σ =
  1/√(var+1e-3) are *moments of the member's ref-batch forward* over
  batch+spatial axes (batchnorm.py:74-77), recomputed every weight load
  (batchnorm.py:119-123), and b is a learned bias. No gamma/beta.
* `ESAtariPolicy` (es_distributed/policies.py:318-330): same idea through
  TF batch_norm(scale=True, decay=0, eps=1e-3) driven by an is_ref
  placeholder — gamma/beta learned, ref forward before each episode
  (policies.py:399).
* `ModelBN` (batchnorm.py:24-49): live training-mode BN + learned bias.

TPU-native design: the scatter-update stats variables + ref_batch_assign
graph machinery collapse into a pure function `ref_stats(θ, ref_batch) →
stats pytree`, vmapped over the population once per generation; `act` takes
the member's stats through `ctx`. `affine='full'` reproduces the CPU stack's
gamma/beta parameterization; 'bias' (default) the GPU stack's bias-only.
"""

from __future__ import annotations

import dataclasses
from typing import ClassVar, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.flat import ParamSpec
from .core import NONLINS, Model, batch_conv2d, conv2d, dense, pop_matvec
from .dqn import _conv_out_hw

VBN_EPS = 1e-3  # batchnorm.py:76; policies.py:322 epsilon=1e-3


class VBNStats(NamedTuple):
    mean: Tuple[jax.Array, ...]  # per BN layer, [C] or [F]
    inv_std: Tuple[jax.Array, ...]


@dataclasses.dataclass(frozen=True)
class VirtualBNDQN(Model):
    """Virtual-batch-norm small DQN (ModelVirtualBN / ESAtariPolicy)."""

    num_actions: int = 0
    in_hw: int = 84
    in_ch: int = 4
    nonlin_type: str = "relu"
    affine: str = "bias"  # 'bias' = GPU ModelVirtualBN; 'full' = CPU ESAtariPolicy gamma/beta
    out_std: float = 1.0  # batchnorm.py:110 dense('out') default std
    scale_style: str = "fan_in"
    # 'bfloat16' runs the conv/fc GEMMs in bf16 (per-member weight reads are
    # the population forward's HBM bound); θ stays f32, BN moments and
    # normalization stay f32, action = argmax (rounding-insensitive).
    compute_dtype: str = "float32"
    # fc-layer batched mat-vec backend (core.py pop_matvec): 'auto' = Pallas
    # member-pipelined kernel on TPU, batched einsum elsewhere
    matvec_impl: str = "auto"
    # whole-forward backend:
    #   'split'  = batch-explicit XLA GEMMs + pop_matvec fc (5.94 µs/member
    #              bf16 at B=256 on v5e, r3);
    #   'fused'  = two Pallas kernels per member (6.53 µs/member r3: the
    #              conv patches' HBM round-trip and the 16-GEMM conv2
    #              outweighed the fusion gain);
    #   'fused1' = ONE kernel per member (r4): scratch-assembled conv2
    #              im2col + the flatten-free channel-major fc accumulation
    #              (see large_dqn_fused_scores). Measured 6.85 µs/member at
    #              B=256 on v5e — SLOWER than split (5.92): the small net is
    #              COMPUTE-bound (its 2.2 MB weight DMA ≈ 2.8 µs is not the
    #              binding constraint), and XLA's member-batched GEMMs
    #              amortize the tiny per-member conv matrices better than a
    #              per-member kernel can (results/profile_stages_r04.json).
    #              The same recipe wins on the LargeDQN precisely because
    #              that net IS DMA-bound (8.4 MB/member);
    #   'folded' = split with the VBN affines pre-folded into the conv/fc
    #              weights (r4 experiment: a wash vs split — XLA already
    #              fuses the affine into the conv epilogue; kept for study);
    #   'auto'   = split (the r3+r4 measured winner on TPU)
    forward_impl: str = "auto"
    fused_interpret: bool = False  # interpret-mode kernels (CPU tests)

    LAYERS: Tuple[Tuple[str, int, int, int], ...] = (("conv1", 16, 8, 4), ("conv2", 32, 4, 2))
    FC: int = 256

    @property
    def needs_ref_batch(self) -> bool:
        return True  # batchnorm.py:60-62; policies.py:335-337

    def build_specs(self) -> Sequence[ParamSpec]:
        specs = []
        hw, ch = self.in_hw, self.in_ch
        for name, out_ch, k, s in self.LAYERS:
            # bias=False convs (batchnorm.py:97-101); BN bias learned separately
            specs.append(ParamSpec(f"{name}/w", (k, k, ch, out_ch), "normc", 1.0))
            specs.append(ParamSpec(f"{name}/bn_b", (out_ch,), "zeros"))
            if self.affine == "full":
                specs.append(ParamSpec(f"{name}/bn_g", (out_ch,), "zeros"))  # gamma−1 stored, see _affine
            hw, ch = _conv_out_hw(hw, k, s), out_ch
        flat_dim = hw * hw * ch
        specs.append(ParamSpec("fc/w", (flat_dim, self.FC), "normc", 1.0))
        specs.append(ParamSpec("fc/bn_b", (self.FC,), "zeros"))
        if self.affine == "full":
            specs.append(ParamSpec("fc/bn_g", (self.FC,), "zeros"))
        specs += [
            ParamSpec("out/w", (self.FC, self.num_actions), "normc", self.out_std),
            ParamSpec("out/b", (self.num_actions,), "zeros"),
        ]
        return specs

    # --------------------------------------------------------------- helpers

    def _affine(self, parts, name, xhat):
        """Post-normalization affine. GPU style: + bias. CPU style:
        γ·x̂ + β with γ = 1 + bn_g so a zero-init θ gives identity scale
        (TF inits gamma to 1; our flat init is zeros for non-normc specs)."""
        if self.affine == "full":
            return xhat * (1.0 + parts[f"{name}/bn_g"]) + parts[f"{name}/bn_b"]
        return xhat + parts[f"{name}/bn_b"]

    def _pre_activations(self, parts, x):
        """Yield (name, pre-BN activation, is_conv) for each normalized layer,
        given the activation-so-far; caller supplies normalization."""
        raise NotImplementedError  # structure inlined below for clarity

    # ------------------------------------------------------------------- api

    def prepare_parts(self, parts):
        """Cast the conv/fc weight matrices (the HBM-dominant reads) to the
        compute dtype once per rollout; BN biases/gammas and the out layer
        stay f32 (normalization math is f32)."""
        dt = jnp.dtype(self.compute_dtype)
        if dt != jnp.float32:
            parts = {
                k: v.astype(dt) if k.endswith("/w") and not k.startswith("out") else v
                for k, v in parts.items()
            }
        return parts

    def ref_stats(self, theta: jax.Array, ref_batch: jax.Array) -> VBNStats:
        """Forward the ref batch [R, H, W, C], collecting per-layer moments
        over batch+spatial axes (batchnorm.py:74-77: tf.nn.moments over
        range(1, ndim-1) of the [1, R, ...] stacked batch → here axes
        (0,1,2) for conv, (0,) for fc)."""
        dt = jnp.dtype(self.compute_dtype)
        parts = self.prepare_parts(self.unflatten(theta))
        nonlin = NONLINS[self.nonlin_type]
        means, inv_stds = [], []

        x = ref_batch.astype(dt)
        for name, _, k, s in self.LAYERS:
            h = conv2d({f"{name}/w": parts[f"{name}/w"], f"{name}/b": jnp.zeros(parts[f"{name}/bn_b"].shape)}, name, x, stride=s).astype(jnp.float32)
            mean = jnp.mean(h, axis=(0, 1, 2))
            var = jnp.var(h, axis=(0, 1, 2))
            inv = 1.0 / jnp.sqrt(var + VBN_EPS)
            means.append(mean)
            inv_stds.append(inv)
            x = nonlin(self._affine(parts, name, (h - mean) * inv)).astype(dt)
        x = x.reshape(x.shape[0], -1)
        h = (x @ parts["fc/w"].astype(dt)).astype(jnp.float32)
        mean = jnp.mean(h, axis=0)
        var = jnp.var(h, axis=0)
        inv = 1.0 / jnp.sqrt(var + VBN_EPS)
        means.append(mean)
        inv_stds.append(inv)
        return VBNStats(tuple(means), tuple(inv_stds))

    def act_parts(self, parts, obs, key=None, ctx: VBNStats = None):
        assert ctx is not None, "VirtualBNDQN.act requires ref-batch stats in ctx"
        dt = jnp.dtype(self.compute_dtype)
        nonlin = NONLINS[self.nonlin_type]
        x = obs.astype(dt)
        for i, (name, _, k, s) in enumerate(self.LAYERS):
            h = conv2d({f"{name}/w": parts[f"{name}/w"], f"{name}/b": jnp.zeros(parts[f"{name}/bn_b"].shape)}, name, x, stride=s).astype(jnp.float32)
            x = nonlin(self._affine(parts, name, (h - ctx.mean[i]) * ctx.inv_std[i])).astype(dt)
        x = x.reshape(-1)
        h = (x @ parts["fc/w"].astype(dt)).astype(jnp.float32)
        i = len(self.LAYERS)
        x = nonlin(self._affine(parts, "fc", (h - ctx.mean[i]) * ctx.inv_std[i]))
        return jnp.argmax(dense(parts, "out", x))

    def _batch_affine(self, parts, name, xhat, mean, inv_std):
        """Batched normalization + affine: x̂ = (h − μ)·inv_σ then the
        GPU-style bias (or CPU-style γ/β). mean/inv_std/biases are [B, C];
        broadcast over any spatial dims between."""
        shape = (xhat.shape[0],) + (1,) * (xhat.ndim - 2) + (xhat.shape[-1],)
        x = (xhat - mean.reshape(shape)) * inv_std.reshape(shape)
        if self.affine == "full":
            x = x * (1.0 + parts[f"{name}/bn_g"].reshape(shape))
        return x + parts[f"{name}/bn_b"].reshape(shape)

    def batch_scores_parts(self, parts, obs, ctx: VBNStats):
        """Batch-explicit population forward (same math as
        vmap(act_parts)): conv layers as batched einsum GEMMs, the fc layer
        — 98% of the weight bytes — through `pop_matvec` (Pallas
        member-pipelined mat-vec on TPU, see ops/pallas_forward.py)."""
        assert ctx is not None, "VirtualBNDQN requires ref-batch stats in ctx"
        dt = jnp.dtype(self.compute_dtype)
        nonlin = NONLINS[self.nonlin_type]
        B = obs.shape[0]
        x = obs.astype(dt)
        for i, (name, _, k, s) in enumerate(self.LAYERS):
            h = batch_conv2d(parts[f"{name}/w"], x, stride=s).astype(jnp.float32)
            x = nonlin(self._batch_affine(parts, name, h, ctx.mean[i], ctx.inv_std[i])).astype(dt)
        x = x.reshape(B, -1)
        h = pop_matvec(x, parts["fc/w"], self.matvec_impl)
        i = len(self.LAYERS)
        x = nonlin(self._batch_affine(parts, "fc", h, ctx.mean[i], ctx.inv_std[i]))
        out_w = parts["out/w"].astype(jnp.float32)
        return jnp.einsum("bk,bkn->bn", x, out_w) + parts["out/b"]

    def _use_folded(self) -> bool:
        """Fold the VBN affines into the weights at prepare time
        (fold_batch_parts). Measured a wash on v5e (5.65 vs split's 5.71
        µs/member at B=256, actions identical — XLA already fuses the
        normalization into the conv epilogues), so 'auto' stays split;
        kept as an explicit impl and as evidence for the floor analysis
        (results/profile_stages_r04.json act_folded_bf16)."""
        return self.forward_impl == "folded"

    def fold_batch_parts(self, parts, stats: VBNStats) -> dict:
        """Fold the per-member VBN normalization INTO the weights (r4,
        VERDICT #2 candidate): conv(x, W)·a + c == conv(x, W·a) + c with a =
        inv_σ·γ broadcast per out-channel, c = β − µ·a — so the per-step
        forward is plain conv/fc + bias + relu with no separate affine pass
        (~1 µs/member of elementwise work at B=256). Exact algebra over
        batchnorm.py:74-77's moments, fp-reassociated in the compute dtype.
        Runs once per rollout in prepare_batch_params (after the ref-stats
        pass), amortized over the episode's steps."""

        def fold(name, i):
            a = stats.inv_std[i]
            if self.affine == "full":
                a = a * (1.0 + parts[f"{name}/bn_g"])
            c = parts[f"{name}/bn_b"] - stats.mean[i] * a
            return a, c

        folded = {"__folded__": jnp.zeros((), jnp.int32)}
        for i, (name, _, _, _) in enumerate(self.LAYERS):
            a, c = fold(name, i)
            w = parts[f"{name}/w"]  # [B, k, k, ci, co]
            folded[f"{name}/w"] = w * a[:, None, None, None, :].astype(w.dtype)
            folded[f"{name}/b"] = c
        a3, c3 = fold("fc", len(self.LAYERS))
        wf = parts["fc/w"]
        folded["fc/w"] = wf * a3[:, None, :].astype(wf.dtype)
        folded["fc/b"] = c3
        folded["out/w"] = parts["out/w"]
        folded["out/b"] = parts["out/b"]
        return folded

    def batch_scores_folded(self, fparts, obs):
        """Population forward over VBN-folded weights: the per-step graph is
        identical in shape to the plain GA DQN's (conv+bias GEMMs +
        pop_matvec fc + out)."""
        dt = jnp.dtype(self.compute_dtype)
        nonlin = NONLINS[self.nonlin_type]
        B = obs.shape[0]
        x = obs.astype(dt)
        for name, _, _, s in self.LAYERS:
            h = batch_conv2d(fparts[f"{name}/w"], x, stride=s).astype(jnp.float32)
            x = nonlin(h + fparts[f"{name}/b"][:, None, None, :]).astype(dt)
        x = x.reshape(B, -1)
        h = pop_matvec(x, fparts["fc/w"], self.matvec_impl) + fparts["fc/b"]
        x = nonlin(h)
        out_w = fparts["out/w"].astype(jnp.float32)
        return jnp.einsum("bk,bkn->bn", x, out_w) + fparts["out/b"]

    def batch_act_parts(self, parts, obs, keys, ctx: VBNStats):
        if isinstance(parts, dict) and "__fused__" in parts:
            return jnp.argmax(
                self.batch_scores_fused(parts["__fused__"], obs,
                                        interpret=self.fused_interpret),
                axis=-1,
            )
        if isinstance(parts, dict) and "__folded__" in parts:
            return jnp.argmax(self.batch_scores_folded(parts, obs), axis=-1)
        return jnp.argmax(self.batch_scores_parts(parts, obs, ctx), axis=-1)

    # ------------------------------------------------------ fused Pallas path

    def _fused_eligible(self) -> bool:
        """The fused kernel is compiled for the reference small-DQN topology
        (84×84×4 → conv16/8s4 → conv32/4s2 → fc256; batchnorm.py:97-110)."""
        return (
            self.in_hw == 84 and self.in_ch == 4 and self.FC == 256
            and self.LAYERS == (("conv1", 16, 8, 4), ("conv2", 32, 4, 2))
        )

    def _use_fused(self):
        """Which fused variant (if any) the batch path uses; returns one of
        False | 'fused' | 'fused1'."""
        if self.forward_impl in ("fused", "fused1"):
            assert self._fused_eligible(), "fused kernel needs the default topology"
            return self.forward_impl
        # 'auto' (and 'folded', handled by _use_folded) stays off the fused
        # per-member kernels: both fused variants
        # measured slower on v5e (r3:
        # two-kernel 6.53; r4: single-kernel 6.85 vs split 5.92 us/member —
        # the small net is compute-bound, see the forward_impl field note)
        return False

    def fuse_prepare(self, parts, stats: VBNStats, style: str = "two") -> dict:
        """Per-rollout layout build for ops/pallas_fused_dqn.py: bf16 weight
        matrices in the kernel's contraction orders + the VBN normalization
        folded into per-layer scale/shift (y = x̂·a + c, a = inv_σ·(1+γ),
        c = b − µ·a — exact algebra over batchnorm.py:74-77's moments)."""
        from ..ops import pallas_fused_dqn as fk

        B = parts["conv1/w"].shape[0]
        bf = jnp.bfloat16

        def fold(name, i):
            a = stats.inv_std[i]
            if self.affine == "full":
                a = a * (1.0 + parts[f"{name}/bn_g"])
            c = parts[f"{name}/bn_b"] - stats.mean[i] * a
            return a[:, None, :], c[:, None, :]

        a1, c1 = fold("conv1", 0)
        a2, c2 = fold("conv2", 1)
        a3, c3 = fold("fc", 2)
        nout = self.num_actions
        wo = parts["out/w"].astype(jnp.float32)  # [B, 256, nout]
        wo = jnp.pad(wo, ((0, 0), (0, 0), (0, fk.NOUT - nout)))
        bo = jnp.pad(
            parts["out/b"].astype(jnp.float32), ((0, 0), (0, fk.NOUT - nout)),
            constant_values=-1e9,
        )[:, None, :]
        ops = {
            "w1": parts["conv1/w"].reshape(B, 8 * 8 * 4, 16).astype(bf),
            "a1": a1, "c1": c1,
            "w2": parts["conv2/w"].reshape(B, 4 * 4 * 16, 32).astype(bf),
            "a2": a2, "c2": c2,
            "a3": a3, "c3": c3,
            "wo": wo, "bo": bo,
        }
        if style == "one":
            # single-kernel layout: fc rows re-ordered channel-major so the
            # kernel's per-channel FMA reads contiguous [121, 256] planes
            # (NHWC flatten index = p·32 + c)
            ops["wf_cm"] = (
                parts["fc/w"].reshape(B, fk.P2, fk.C2, fk.FC)
                .transpose(0, 2, 1, 3).astype(bf)
            )
        else:
            ops["wf"] = parts["fc/w"].astype(bf)
        return ops

    def batch_scores_fused(self, fused_ops: dict, obs, interpret: bool = False):
        """[B, 84, 84, 4] obs → padded scores [B, 64] through the fused
        kernel(s). conv1's im2col runs here in XLA (member-independent data
        movement); everything per-member-weighted runs in-kernel. Dispatch:
        a 'wf_cm' entry marks the single-kernel layout (fused1)."""
        from ..ops import pallas_fused_dqn as fk
        from .core import extract_patches

        B = obs.shape[0]
        patches1 = extract_patches(obs.astype(jnp.bfloat16), 8, 4, "SAME")
        ops = dict(fused_ops, patches1=patches1.reshape(B, fk.P1, fk.KK1))
        if "wf_cm" in fused_ops:
            return fk.vbn_dqn_fused1_scores(ops, interpret=interpret)
        return fk.vbn_dqn_fused_scores(ops, interpret=interpret)

    def make_batch_act(self):
        """ctx (VBNStats) is stacked per member — consumed batch-wise by
        batch_scores_parts (or pre-folded into the fused-kernel layout)."""

        def batch_act(params, obs, keys):
            parts, stats = self.prepare_batch_params(params)
            return self.batch_act_parts(parts, obs, keys, stats)

        batch_act.prepare = self.prepare_batch_params
        return batch_act

    def prepare_batch_params(self, params):
        """As Model.prepare_batch_params, plus: on the fused path the
        per-rollout weight-layout build (fuse_prepare) is hoisted here so
        the per-step act dispatch reads the kernel-ready operands directly
        — rebuilding them per step would double the weight HBM traffic."""
        if not (isinstance(params, tuple) and len(params) == 2):
            return params
        thetas, ctx = params
        if thetas is not None and not isinstance(thetas, dict):
            parts = self.prepare_parts(jax.vmap(self.unflatten)(thetas))
            fused = self._use_fused()
            if fused and isinstance(ctx, VBNStats):
                style = "one" if fused == "fused1" else "two"
                return ({"__fused__": self.fuse_prepare(parts, ctx, style)}, ctx)
            if self._use_folded() and isinstance(ctx, VBNStats):
                return (self.fold_batch_parts(parts, ctx), ctx)
            return (parts, ctx)
        return (thetas, ctx)

    # Members whose ref-batch forwards are materialized concurrently inside
    # batch_ref_stats. The im2col patches of conv1 alone are R·21·21·256
    # floats per member (~58 MB at R=128), so a flat vmap over a pop-5000 (or
    # even 512) population blows HBM; the stats pass is once-per-generation,
    # so we trade a short lax.map chain for O(chunk) peak memory.
    # ClassVar: NOT a dataclass field — keeps subclass overrides working and
    # the knob out of asdict()-based snapshots and the __eq__/__hash__ jit
    # static-arg cache keys (ADVICE r2).
    REF_STATS_CHUNK: ClassVar[int] = 32

    def batch_ref_stats(self, thetas: jax.Array, ref_batch: jax.Array) -> VBNStats:
        """Per-member stats for the whole population (the vmapped analog of
        re-running ref_batch_assign on every load, batchnorm.py:119-123),
        computed in member chunks to bound peak HBM."""
        B = thetas.shape[0]
        fn = lambda th: self.ref_stats(th, ref_batch)
        chunk = self.REF_STATS_CHUNK
        if B <= chunk:
            return jax.vmap(fn)(thetas)
        n_chunks = -(-B // chunk)
        pad = n_chunks * chunk - B
        if pad:
            thetas = jnp.concatenate([thetas, jnp.broadcast_to(thetas[:1], (pad,) + thetas.shape[1:])])
        stacked = jax.lax.map(jax.vmap(fn), thetas.reshape(n_chunks, chunk, -1))
        flat = jax.tree.map(lambda x: x.reshape((n_chunks * chunk,) + x.shape[2:])[:B], stacked)
        return flat


@dataclasses.dataclass(frozen=True)
class BNDQN(VirtualBNDQN):
    """Live batch-norm variant (ModelBN, batchnorm.py:24-49). In the lockstep
    engine each member's batch is its single env slot, so live moments reduce
    over spatial axes only (documented divergence: the reference normalized
    over the whole [P, B] slab of tf.layers.batch_normalization, leaking
    stats across members — a quirk, not a feature, and not used by any
    shipped config)."""

    def act_parts(self, parts, obs, key=None, ctx=None):
        nonlin = NONLINS[self.nonlin_type]
        x = obs.astype(jnp.float32)
        for name, _, k, s in self.LAYERS:
            h = conv2d({f"{name}/w": parts[f"{name}/w"], f"{name}/b": jnp.zeros(parts[f"{name}/bn_b"].shape)}, name, x, stride=s)
            mean = jnp.mean(h, axis=(0, 1))
            inv = 1.0 / jnp.sqrt(jnp.var(h, axis=(0, 1)) + VBN_EPS)
            x = nonlin(self._affine(parts, name, (h - mean) * inv))
        x = x.reshape(-1)
        h = x @ parts["fc/w"]
        # fc: batch of one → normalization degenerates to centering by itself;
        # use feature-wise pass-through scaled by eps floor (reference has the
        # same degeneracy at batch 1)
        mean = jnp.mean(h)
        inv = 1.0 / jnp.sqrt(jnp.var(h) + VBN_EPS)
        x = nonlin(self._affine(parts, "fc", (h - mean) * inv))
        return jnp.argmax(dense(parts, "out", x))

    @property
    def needs_ref_batch(self) -> bool:
        return False

    def make_batch_act(self):
        def batch_act(params, obs, keys):
            parts, _ = self.prepare_batch_params(params)
            return jax.vmap(lambda p, o, k: self.act_parts(p, o, k))(parts, obs, keys)

        batch_act.prepare = self.prepare_batch_params
        return batch_act
