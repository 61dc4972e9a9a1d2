"""LargeDQN forward-path variant race (round-4 VERDICT #1 investigation).

The r4 stage profile (results/profile_stages_r04_large.json) shows the
GA-Atari LargeDQN population forward loses to its HBM roof in two places:
  * fc: the K-tiled Pallas kernel runs 218 GB/s vs XLA's honest batched
    einsum at ~745 GB/s for the same [B,7744]x[B,7744,512] bf16 mat-vec;
  * convs: ~5.7 us/member for ~0.4 MB/member of traffic (pure GEMM-shape
    starvation: N=32/64 output channels pad 4x on the MXU lane dim).

This script races candidate implementations on the real chip with the
marginal-cost method; the winners get wired into models/core.py.

Usage: python scripts/exp_large_fwd.py [--only NAME] [--B 256]
"""
import argparse
import functools
import json
import os
import sys
import time
from functools import partial

if os.environ.get("NEVO_PLATFORM"):
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    import jax

    jax.config.update("jax_platforms", os.environ["NEVO_PLATFORM"])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")


def timed(fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x), out)
    return time.time() - t0


def marginal(step, operands, ks=(2, 10), reps=2):
    @partial(jax.jit, static_argnums=(1,))
    def run(operands, K):
        def body(acc, t):
            return acc + step(operands, t), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return acc

    for K in ks:
        t = timed(run, operands, K)
        print(f"  [compile+run K={K}: {t:.1f}s]", file=sys.stderr, flush=True)
    ds = min(timed(run, operands, ks[0]) for _ in range(reps))
    db = min(timed(run, operands, ks[1]) for _ in range(reps))
    return (db - ds) / (ks[1] - ks[0])


# ---------------------------------------------------------------- fc variants

def _kt_kernel(x_ref, w_ref, y_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        y_ref[0] = jnp.zeros_like(y_ref[0])

    y_ref[0] += jnp.dot(x_ref[0], w_ref[0], preferred_element_type=jnp.float32)


def fc_ktiled(x, W, kt, semantics=None, vmem_limit=None):
    B, K = x.shape
    _, _, N = W.shape
    nk = -(-K // kt)
    pad = nk * kt - K
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
        W = jnp.pad(W, ((0, 0), (0, pad), (0, 0)))
    params = {}
    if semantics or vmem_limit:
        kw = {}
        if semantics:
            kw["dimension_semantics"] = semantics
        if vmem_limit:
            kw["vmem_limit_bytes"] = vmem_limit
        params["compiler_params"] = pltpu.CompilerParams(**kw)
    y = pl.pallas_call(
        _kt_kernel,
        grid=(B, nk),
        in_specs=[
            pl.BlockSpec((1, 1, kt), lambda i, k: (i, 0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kt, N), lambda i, k: (i, k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, N), lambda i, k: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
        **params,
    )(x[:, None, :], W)
    return y[:, 0, :]


def _whole_kernel(x_ref, w_ref, y_ref):
    y_ref[0] = jnp.dot(x_ref[0], w_ref[0], preferred_element_type=jnp.float32)


def fc_whole(x, W, vmem_limit=None):
    """One member's ENTIRE weight matrix per grid step (double-buffered by
    the Mosaic grid pipeline; needs 2x7.9 MB of VMEM at LargeDQN size)."""
    B, K = x.shape
    _, _, N = W.shape
    params = {}
    if vmem_limit:
        params["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
    y = pl.pallas_call(
        _whole_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
        **params,
    )(x[:, None, :], W)
    return y[:, 0, :]


# -------------------------------------------------------------- conv variants

def conv_chain_nhwc(parts, x):
    from deep_neuroevolution_tpu.models.core import batch_conv2d

    h = x
    for nm, s in (("conv1/w", 4), ("conv2/w", 2), ("conv3/w", 1)):
        h = jax.nn.relu(batch_conv2d(parts[nm], h, stride=s)).astype(jnp.bfloat16)
    return h


def _extract_patches_cf(x, k, stride, padding="SAME"):
    """NCHW im2col: [B, C, H, W] -> [B, k*k*C, P] with K order (i, j, c) —
    matching an HWIO weight reshaped [k*k*C, O]."""
    from deep_neuroevolution_tpu.models.core import _same_pads

    b, c, h, w = x.shape
    if padding == "SAME":
        (pt, pb), (pl_, pr) = _same_pads(h, k, stride), _same_pads(w, k, stride)
        x = jnp.pad(x, ((0, 0), (0, 0), (pt, pb), (pl_, pr)))
        h, w = h + pt + pb, w + pl_ + pr
    h2 = (h - k) // stride + 1
    w2 = (w - k) // stride + 1
    slices = [
        x[:, :, i : i + (h2 - 1) * stride + 1 : stride, j : j + (w2 - 1) * stride + 1 : stride]
        for i in range(k)
        for j in range(k)
    ]
    pat = jnp.stack(slices, axis=1)  # [B, k*k, C, H', W']
    return pat.reshape(b, k * k * c, h2 * w2), h2, w2


def batch_conv2d_cf(w, x_cf, stride, bias=None):
    """Channels-first population conv: GEMM [B,O,K]@[B,K,P] so the LANE dim
    is the spatial extent (P=441/121) instead of the starved out-channel
    count (N=32/64). Math identical to batch_conv2d."""
    B, kh, kw, cin, cout = w.shape
    pat, h2, w2 = _extract_patches_cf(x_cf, kh, stride)
    wmat = w.reshape(B, kh * kw * cin, cout).astype(pat.dtype)
    y = jnp.einsum("bko,bkp->bop", wmat, pat, preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias[:, :, None].astype(y.dtype)
    return y.reshape(B, cout, h2, w2)


def conv_chain_cf(parts, x):
    h = jnp.transpose(x, (0, 3, 1, 2))  # NHWC -> NCHW once
    for nm, s in (("conv1/w", 4), ("conv2/w", 2), ("conv3/w", 1)):
        h = jax.nn.relu(batch_conv2d_cf(parts[nm], h, stride=s)).astype(jnp.bfloat16)
    return jnp.transpose(h, (0, 2, 3, 1))  # back to NHWC for the flatten


def main(B, only):
    key = jax.random.PRNGKey(0)
    out = {}

    def want(name):
        return only is None or name in only.split(",")

    K, N = 7744, 512
    x = jax.random.normal(key, (B, K), jnp.float32).astype(jnp.bfloat16)
    W = jax.random.normal(key, (B, K, N), jnp.float32).astype(jnp.bfloat16)

    # NOTE: W must be a jit OPERAND, never a closure constant — closed-over
    # arrays become program constants the axon tunnel re-ships per compile
    # (2 GB here; see CLAUDE.md)
    fcs = {
        "fc_kt2048": lambda xx, WW: fc_ktiled(xx, WW, 2048),
        "fc_kt2048_par": lambda xx, WW: fc_ktiled(
            xx, WW, 2048,
            semantics=(pltpu.GridDimensionSemantics.PARALLEL,
                       pltpu.GridDimensionSemantics.ARBITRARY)),
        "fc_kt3872": lambda xx, WW: fc_ktiled(xx, WW, 3872, vmem_limit=100 * 2**20),
        "fc_kt1024": lambda xx, WW: fc_ktiled(xx, WW, 1024),
        "fc_whole": lambda xx, WW: fc_whole(xx, WW, vmem_limit=110 * 2**20),
        "fc_xla": lambda xx, WW: jnp.einsum("bk,bkn->bn", xx, WW,
                                            preferred_element_type=jnp.float32),
    }
    for name, fn in fcs.items():
        if not want(name):
            continue
        try:
            def fc_step(ops, t, _fn=fn):
                xx = jnp.tanh(ops["x"] + t.astype(ops["x"].dtype))
                return jnp.sum(_fn(xx, ops["W"]))
            out[name] = marginal(fc_step, {"x": x, "W": W})
        except Exception as e:  # VMEM overflow etc.
            print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr, flush=True)
            out[name] = None

    # conv variants (additive perturbation — affine conv can't be hoisted,
    # and tanh on the [B,84,84,4] input measurably inflated the r4a profile)
    from deep_neuroevolution_tpu.models import LargeDQN

    # split/einsum so prepare returns RAW parts (auto would hand back the
    # fused-kernel layout dict on TPU)
    model = LargeDQN(num_actions=18, compute_dtype="bfloat16",
                     forward_impl="split", conv_impl="einsum")
    thetas = jax.vmap(model.init_theta)(jax.random.split(key, B))
    parts, _ = model.prepare_batch_params((thetas, None))
    del thetas
    obs = jax.random.uniform(key, (B, 84, 84, 4), jnp.float32)
    convs = {"conv_nhwc": conv_chain_nhwc, "conv_cf": conv_chain_cf}
    for name, fn in convs.items():
        if not want(name):
            continue
        def cstep(ops, t, _fn=fn):
            xx = (ops["obs"] + 1e-6 * t.astype(jnp.float32)).astype(jnp.bfloat16)
            return jnp.sum(_fn(ops["parts"], xx).astype(jnp.float32))
        out[name] = marginal(cstep, {"obs": obs, "parts": parts})

    if want("conv_fused") or want("conv_fused_kernel"):
        mfused = LargeDQN(num_actions=18, compute_dtype="bfloat16", conv_impl="fused")
        if want("conv_fused"):  # obs → patches (XLA) → kernel, the in-situ route
            def cf_step(ops, t):
                xx = ops["obs"] + 1e-6 * t.astype(jnp.float32)
                return jnp.sum(mfused._fused_conv_acts(ops["parts"], xx))
            out["conv_fused"] = marginal(cf_step, {"obs": obs, "parts": parts})
        if want("conv_fused_kernel"):  # kernel only, patches precomputed
            from deep_neuroevolution_tpu.models.core import extract_patches
            from deep_neuroevolution_tpu.ops.pallas_fused_dqn import dqn_conv_chain_fused

            pat = extract_patches(obs.astype(jnp.bfloat16), 8, 4, "SAME")
            pat = pat.reshape(B, -1, pat.shape[-1])
            kargs = {"patches": pat}
            for i, (nm, _, _, _) in enumerate(mfused.LAYERS):
                w = parts[f"{nm}/w"]
                kargs[f"w{i}"] = w.reshape(B, -1, w.shape[-1])
                kargs[f"b{i}"] = parts[f"{nm}/b"][:, None, :].astype(jnp.float32)
            def cfk_step(ops, t):
                p = ops["patches"] * (1 + 1e-6 * t.astype(jnp.bfloat16))
                y = dqn_conv_chain_fused(p, ops["w0"], ops["b0"], ops["w1"],
                                         ops["b1"], ops["w2"], ops["b2"])
                return jnp.sum(y)
            out["conv_fused_kernel"] = marginal(cfk_step, kargs)

    fused_modes = [m for m in ("fused_fma", "fused_mxut", "fused_scratch") if want(m)]
    if fused_modes:
        from deep_neuroevolution_tpu.models import LargeDQN as _LD
        from deep_neuroevolution_tpu.models.core import extract_patches
        from deep_neuroevolution_tpu.ops.pallas_fused_dqn import large_dqn_fused_scores

        mlarge = _LD(num_actions=18, compute_dtype="bfloat16")
        fops = mlarge.fuse_prepare(parts)
        pat = extract_patches(obs.astype(jnp.bfloat16), 8, 4, "SAME")
        fops = dict(fops, patches1=pat.reshape(B, -1, pat.shape[-1]))
        for name in fused_modes:
            mode = {"fused_fma": ("fma", "ksplit"),
                    "fused_mxut": ("mxu_t", "ksplit"),
                    "fused_scratch": ("fma", "scratch")}[name]
            def fstep(ops, t, _m=mode):
                o = dict(ops)
                o["patches1"] = ops["patches1"] * (1 + 1e-6 * t.astype(jnp.bfloat16))
                s = large_dqn_fused_scores(o, fc_mode=_m[0], conv_mode=_m[1])
                return jnp.sum(s)
            try:
                out[name] = marginal(fstep, fops)
            except Exception as e:
                print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                      file=sys.stderr, flush=True)
                out[name] = None

    if want("conv_equiv"):  # on-chip equivalence of the two conv routes
        a = conv_chain_nhwc(parts, obs.astype(jnp.bfloat16))
        b = conv_chain_cf(parts, obs.astype(jnp.bfloat16))
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"  [conv nhwc vs cf max abs diff: {err:.2e}]", file=sys.stderr, flush=True)
        out["conv_equiv_maxdiff"] = err

    for k, v in out.items():
        if isinstance(v, float) and k != "conv_equiv_maxdiff":
            print(f"{k:16s} {v * 1e3:8.3f} ms  {v / B * 1e6:7.2f} us/member",
                  file=sys.stderr, flush=True)
    print(json.dumps({"B": B, "results_ms": {
        k: (v * 1e3 if isinstance(v, float) and k != "conv_equiv_maxdiff" else v)
        for k, v in out.items()}}), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=256)
    p.add_argument("--only", default=None)
    a = p.parse_args()
    main(a.B, a.only)
