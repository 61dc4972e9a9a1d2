"""DQN-family conv policies for Atari.

Reference models:
* GPU stack `Model` (small DQN 16-32-256) and `LargeModel` (32-64-64-512) —
  gpu neuroevolution/models/dqn.py:30-47; Xavier-scaled `SmallDQN`/`LargeDQN`
  — dqn_xavier.py:24-42 (same topology, base.py:46-49 genome scaling).
* CPU stack `GAAtariPolicy` — es_distributed/policies.py:434-459: conv16/8s4
  + conv32/4s2 + fc256 + out(std=ac_init_std), nonlin around each, argmax.

Topology (all SAME padding, NHWC, relu unless noted):
  conv1 k8 s4 → conv2 k4 s2 [→ conv3 k3 s1 (large)] → flatten → fc → out
Output = argmax over action scores (policies.py:459; base Model nets return
scores consumed by argmax in the eval graph, concurrent_worker.py:63-66).

Obs arrive as stacked uint8 frames [84, 84, 4]; scaled to [0,1] on device
(atari_wrappers.py:182-186 ScaledFloatFrame; gpu stack divides by 255.0 in
tf_atari.py:92).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.flat import ParamSpec
from .core import NONLINS, Model, batch_conv2d, conv2d, dense, pop_matvec


def _conv_out_hw(hw: int, k: int, s: int) -> int:
    return -(-hw // s)  # SAME padding


@dataclasses.dataclass(frozen=True)
class SmallDQN(Model):
    """conv16(8,4) → conv32(4,2) → fc256 → out (dqn.py:34-40)."""

    num_actions: int = 0
    in_hw: int = 84
    in_ch: int = 4
    nonlin_type: str = "relu"
    out_std: float = 0.1  # dqn.py:40 out std; GAAtariPolicy ac_init_std default (policies.py:436)
    scale_style: str = "fan_in"  # genome scaling: dqn.py:26-28
    # 'bfloat16' halves the per-member weight HBM traffic (the bandwidth
    # bottleneck of population-batched forwards) — θ stays f32; weights are
    # cast at use. Action = argmax, insensitive to bf16 rounding.
    compute_dtype: str = "float32"
    # fc-layer batched mat-vec backend: 'auto' (Pallas on TPU), 'pallas',
    # 'xla' (core.py pop_matvec)
    matvec_impl: str = "auto"
    # conv-chain backend: 'auto' (fused Pallas kernel on TPU for the 84x84
    # DQN geometries), 'fused', 'einsum'. The fused kernel keeps each
    # member's whole conv stack in VMEM (ops/pallas_fused_dqn.py
    # dqn_conv_chain_fused) — the batch-explicit einsum chain round-trips
    # im2col matrices through HBM between layers and measured ~5 us/member
    # on the LargeDQN (results/profile_stages_r04_large.json lg_convchain)
    conv_impl: str = "auto"
    fused_interpret: bool = False  # interpret-mode kernels (CPU tests)

    LAYERS: Tuple[Tuple[str, int, int, int], ...] = (("conv1", 16, 8, 4), ("conv2", 32, 4, 2))
    FC: int = 256

    def build_specs(self) -> Sequence[ParamSpec]:
        specs = []
        hw, ch = self.in_hw, self.in_ch
        for name, out_ch, k, s in self.LAYERS:
            specs += [
                ParamSpec(f"{name}/w", (k, k, ch, out_ch), "normc", 1.0),
                ParamSpec(f"{name}/b", (out_ch,), "zeros"),
            ]
            hw, ch = _conv_out_hw(hw, k, s), out_ch
        flat_dim = hw * hw * ch
        specs += [
            ParamSpec("fc/w", (flat_dim, self.FC), "normc", 1.0),
            ParamSpec("fc/b", (self.FC,), "zeros"),
            ParamSpec("out/w", (self.FC, self.num_actions), "normc", self.out_std),
            ParamSpec("out/b", (self.num_actions,), "zeros"),
        ]
        return specs

    def prepare_parts(self, parts):
        """Compute-dtype cast, applied once per rollout (outside the step
        loop) by prepare_batch_params."""
        dt = jnp.dtype(self.compute_dtype)
        if dt != jnp.float32:
            parts = {k: v.astype(dt) for k, v in parts.items()}
        return parts

    def scores_parts(self, parts, obs, ctx=None):
        dt = jnp.dtype(self.compute_dtype)
        nonlin = NONLINS[self.nonlin_type]
        x = obs.astype(dt)
        for name, _, k, s in self.LAYERS:
            x = nonlin(conv2d(parts, name, x, stride=s))
        x = x.reshape(-1)
        x = nonlin(dense(parts, "fc", x))
        return dense(parts, "out", x).astype(jnp.float32)

    def scores(self, theta, obs, ctx=None):
        return self.scores_parts(self.prepare_parts(self.unflatten(theta)), obs, ctx)

    def act_parts(self, parts, obs, key=None, ctx=None):
        return jnp.argmax(self.scores_parts(parts, obs, ctx))

    def _conv_fused_eligible(self) -> bool:
        """The fused kernel covers the two reference DQN geometries:
        84×84 → k8s4 → k4s2 [→ k3s1] (dqn.py:30-47)."""
        geo = tuple((k, s) for _, _, k, s in self.LAYERS)
        return (
            self.in_hw == 84
            and self.nonlin_type == "relu"
            and geo in (((8, 4), (4, 2)), ((8, 4), (4, 2), (3, 1)))
        )

    def _use_fused_conv(self) -> bool:
        if self.conv_impl == "einsum":
            return False
        if self.conv_impl == "fused":
            # loud failure on unsupported geometry, matching
            # _use_whole_fused's behavior for forward_impl='fused'
            assert self._conv_fused_eligible(), (
                "conv_impl='fused' needs a reference DQN geometry "
                "(84×84, relu, k8s4→k4s2[→k3s1])"
            )
            return True
        # 'auto' stays on the einsum chain: the conv-chain kernel measured
        # only ~7% faster in isolation for the 3-conv geometry (4.77 vs
        # 5.15 us/member, results/exp_large_fwd_r04.json) — and the LargeDQN
        # production route is the whole-net fused kernel anyway; the 2-conv
        # SmallDQN case is unmeasured. Opt in with conv_impl='fused'.
        return False

    def _fused_conv_acts(self, parts, obs) -> jnp.ndarray:
        """[B, 121, c_out] f32 conv-stack activations via the one-member-per
        -grid-step Pallas kernel; conv1's im2col runs outside in XLA
        (member-independent data movement)."""
        from ..ops.pallas_fused_dqn import dqn_conv_chain_fused
        from .core import extract_patches

        dt = jnp.dtype(self.compute_dtype)
        B = obs.shape[0]
        _, _, k1, s1 = self.LAYERS[0]
        patches1 = extract_patches(obs.astype(dt), k1, s1, "SAME")
        patches1 = patches1.reshape(B, patches1.shape[1] * patches1.shape[2], -1)
        args = []
        for name, _, _, _ in self.LAYERS:
            w = parts[f"{name}/w"]
            b = parts[f"{name}/b"]
            args += [w.reshape(B, -1, w.shape[-1]),
                     b[:, None, :].astype(jnp.float32)]
        return dqn_conv_chain_fused(patches1, *args, interpret=self.fused_interpret)

    def batch_scores_parts(self, parts, obs, ctx=None):
        """Batch-explicit population forward: conv layers fused in one
        Pallas kernel per member on TPU (falling back to batched einsum
        GEMMs, core.batch_conv2d), the dominant fc layer through
        `pop_matvec` (Pallas member-pipelined mat-vec on TPU / XLA batched
        einsum for VMEM-exceeding members). Same math as vmap(scores_parts)
        — the contraction per member is identical."""
        dt = jnp.dtype(self.compute_dtype)
        nonlin = NONLINS[self.nonlin_type]
        B = obs.shape[0]
        if self._use_fused_conv():
            x = self._fused_conv_acts(parts, obs).astype(dt).reshape(B, -1)
        else:
            x = obs.astype(dt)
            for name, _, k, s in self.LAYERS:
                y = batch_conv2d(parts[f"{name}/w"], x, stride=s, bias=parts[f"{name}/b"])
                x = nonlin(y).astype(dt)
            x = x.reshape(B, -1)
        h = pop_matvec(x, parts["fc/w"], self.matvec_impl) + parts["fc/b"].astype(jnp.float32)
        x = nonlin(h).astype(jnp.float32)
        return jnp.einsum("bk,bkn->bn", x, parts["out/w"].astype(jnp.float32)) + parts["out/b"]

    def batch_act_parts(self, parts, obs, keys, ctx=None):
        return jnp.argmax(self.batch_scores_parts(parts, obs, ctx), axis=-1)


@dataclasses.dataclass(frozen=True)
class LargeDQN(SmallDQN):
    """conv32(8,4) → conv64(4,2) → conv64(3,1) → fc512 → out (dqn.py:43-47).

    Population forward: `forward_impl='auto'` routes to the whole-net fused
    Pallas kernel on TPU (ops/pallas_fused_dqn.py large_dqn_fused_scores) —
    one grid step per member, conv + fc + out computed while the next
    member's ~8.4 MB weight stream DMAs in. The split route (conv einsum +
    XLA fc) executes those phases sequentially and measured 17.4 us/member
    vs the ~10.5 us DMA floor (results/profile_stages_r04_large.json)."""

    LAYERS: Tuple[Tuple[str, int, int, int], ...] = (
        ("conv1", 32, 8, 4),
        ("conv2", 64, 4, 2),
        ("conv3", 64, 3, 1),
    )
    FC: int = 512
    forward_impl: str = "auto"  # 'auto' | 'fused' | 'split'

    def _whole_fused_eligible(self) -> bool:
        return (
            self.in_hw == 84 and self.in_ch == 4 and self.nonlin_type == "relu"
            and self.LAYERS == (("conv1", 32, 8, 4), ("conv2", 64, 4, 2),
                                ("conv3", 64, 3, 1))
            and self.FC == 512 and 0 < self.num_actions <= 64
        )

    def _use_whole_fused(self) -> bool:
        if self.forward_impl == "fused":
            assert self._whole_fused_eligible(), "fused kernel needs the LargeDQN topology"
            return True
        if self.forward_impl == "split":
            return False
        from .core import _on_tpu

        return self._whole_fused_eligible() and _on_tpu()

    def fuse_prepare(self, parts) -> dict:
        """Per-rollout kernel-layout build (hoisted by prepare_batch_params):
        bf16 weight matrices in the kernel's contraction orders; the fc rows
        re-ordered channel-major (wf[b,c,p,:] = fc/w[b, p·64+c, :] — the
        NHWC flatten index is p·64+c) so the kernel's per-channel FMA
        accumulation reads contiguous [121, 512] planes."""
        from ..ops import pallas_fused_dqn as fk

        B = parts["conv1/w"].shape[0]
        bf = jnp.bfloat16
        f32 = jnp.float32
        wf = parts["fc/w"].reshape(B, fk.P2, fk.LG_C3, fk.LG_FC)
        nout = self.num_actions
        # out/w stays f32: the split route computes the final scores in f32
        # (batch_scores_parts), and the out layer is the decision layer where
        # bf16 near-ties flip the argmax between routes. 512×64 f32 adds only
        # ~64 KB/member to the 8.4 MB DMA stream (~0.8%).
        wo = jnp.pad(parts["out/w"].astype(f32), ((0, 0), (0, 0), (0, fk.NOUT - nout)))
        bo = jnp.pad(parts["out/b"].astype(f32), ((0, 0), (0, fk.NOUT - nout)),
                     constant_values=-1e9)[:, None, :]
        return {
            "w1": parts["conv1/w"].reshape(B, 256, fk.LG_C1).astype(bf),
            "b1": parts["conv1/b"][:, None, :].astype(f32),
            "w2": parts["conv2/w"].reshape(B, 16 * fk.LG_C1, fk.LG_C2).astype(bf),
            "b2": parts["conv2/b"][:, None, :].astype(f32),
            "w3": parts["conv3/w"].reshape(B, 9 * fk.LG_C2, fk.LG_C3).astype(bf),
            "b3": parts["conv3/b"][:, None, :].astype(f32),
            "wf": wf.transpose(0, 2, 1, 3).astype(bf),
            "bf": parts["fc/b"][:, None, :].astype(f32),
            "wo": wo, "bo": bo,
        }

    def prepare_batch_params(self, params):
        if not (isinstance(params, tuple) and len(params) == 2):
            return params
        thetas, ctx = params
        if thetas is not None and not isinstance(thetas, dict):
            parts = self.prepare_parts(jax.vmap(self.unflatten)(thetas))
            if self._use_whole_fused():
                return ({"__fused_lg__": self.fuse_prepare(parts)}, ctx)
            return (parts, ctx)
        return (thetas, ctx)

    def batch_scores_fused(self, fused_ops: dict, obs, interpret: bool = False):
        from ..ops import pallas_fused_dqn as fk
        from .core import extract_patches

        B = obs.shape[0]
        patches1 = extract_patches(obs.astype(jnp.bfloat16), 8, 4, "SAME")
        ops = dict(fused_ops, patches1=patches1.reshape(B, fk.P1, 256))
        return fk.large_dqn_fused_scores(ops, interpret=interpret)

    def batch_act_parts(self, parts, obs, keys, ctx=None):
        if isinstance(parts, dict) and "__fused_lg__" in parts:
            return jnp.argmax(
                self.batch_scores_fused(parts["__fused_lg__"], obs,
                                        interpret=self.fused_interpret),
                axis=-1,
            )
        return super().batch_act_parts(parts, obs, keys, ctx)


@dataclasses.dataclass(frozen=True)
class SmallDQNXavier(SmallDQN):
    """dqn_xavier.py:31-33 SmallDQN — same net, base.py:46-49 genome scaling."""

    scale_style: str = "base"


@dataclasses.dataclass(frozen=True)
class LargeDQNXavier(LargeDQN):
    scale_style: str = "base"


# reference-name aliases (gpu model registry resolves by class name,
# gpu_implementation/es.py:144)
ModelSmall = SmallDQN
ModelLarge = LargeDQN
