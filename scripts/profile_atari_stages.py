"""Stage-by-stage profile of the Atari population device step (VERDICT r2 #1).

Times each pipeline stage in isolation with the marginal-cost method
(bench_atari.py:49-54): K iterations scanned inside one jit, per-iter time =
(T_big - T_small)/(K_big - K_small), so tunnel RTT cancels.

All large operands are passed as jit ARGUMENTS (never closure constants —
a closed-over array becomes a program constant that the axon tunnel re-ships
on every compile; a 1 GB fc weight stack made compiles take >20 min).

Stages:
  rng_frames  the bench's own per-step randint on [B,2,210,160]
  palette     256-entry grayscale table gather on [B,2,210,160]
  preprocess  palette + 2-frame max + align-corners resize matmuls
  fc_xla_*    batched mat-vec [B,3872]x[B,3872,256] via einsum (f32 / bf16)
  fc_pallas_* population_linear Pallas kernel (f32 / bf16)
  conv_batch  batch_conv2d conv1+conv2 chain (batch-explicit einsum)
  act_old     vmapped per-member forward (the r2 path)
  act_new     batch-explicit forward, pallas fc (the r3 path)
"""
import argparse
import json
import os
import sys
import time
from functools import partial

if os.environ.get("NEVO_PLATFORM"):  # CPU smoke runs (tests/dev boxes)
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    import jax

    jax.config.update("jax_platforms", os.environ["NEVO_PLATFORM"])

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from deep_neuroevolution_tpu.envs.preprocess import (
    GRAYSCALE_PALETTE, preprocess_frames)
from deep_neuroevolution_tpu.models.batchnorm import VBNStats, VirtualBNDQN


def timed(fn, *args):
    t0 = time.time()
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x), out)
    return time.time() - t0


def marginal(step, operands, ks=(2, 10), reps=2):
    """step(operands, t) -> scalar; operands is a pytree passed as jit arg."""

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
    r = (db - ds) / (ks[1] - ks[0])
    print(f"  [marginal {r * 1e3:.3f} ms/iter]", file=sys.stderr, flush=True)
    return r


def main_large(B=256, only=None):
    """LargeDQN (GA-Atari, ga_atari_config.json "LargeModel", 4,052,658
    params/member) per-stage profile — VERDICT r3 weak #1: conv_large ran at
    ~186 GB/s effective, 4x below the fc's own HBM roof, and nobody had
    attributed where the 43.5 us/member went. Stages (all bf16 weights, the
    production dtype):
      lg_conv1/2/3   each batch-explicit conv GEMM alone
      lg_convchain   conv1->conv2->conv3 chained (relu between)
      lg_fc_pallas   K-tiled population_linear [B,7744]x[B,7744,512]
      lg_fc_xla      honest (tanh-perturbed) batched einsum, same operands
      lg_forward     whole batch_scores_parts (prod route)
    """
    from deep_neuroevolution_tpu.models import LargeDQN
    from deep_neuroevolution_tpu.models.core import batch_conv2d
    from deep_neuroevolution_tpu.ops.pallas_forward import population_linear

    key = jax.random.PRNGKey(0)
    out = {}

    def want(name):
        return only is None or name in only.split(",")

    model = LargeDQN(num_actions=18, compute_dtype="bfloat16")
    thetas = jax.vmap(model.init_theta)(jax.random.split(key, B))
    parts, _ = model.prepare_batch_params((thetas, None))
    del thetas
    obs = jax.random.uniform(key, (B, 84, 84, 4), jnp.float32)
    h1s = jax.random.uniform(key, (B, 21, 21, 32), jnp.float32).astype(jnp.bfloat16)
    h2s = jax.random.uniform(key, (B, 11, 11, 64), jnp.float32).astype(jnp.bfloat16)

    convs = {
        "lg_conv1": ("conv1/w", obs.astype(jnp.bfloat16), 4),
        "lg_conv2": ("conv2/w", h1s, 2),
        "lg_conv3": ("conv3/w", h2s, 1),
    }
    for name, (wname, x, stride) in convs.items():
        if want(name):
            def cstep(ops, t, _s=stride):
                # additive perturb: conv is not distributed over + by XLA's
                # simplifier, and tanh on the [B,210,...]-scale input
                # measurably inflated the first r4 readings
                xx = ops["x"] + t.astype(ops["x"].dtype)
                y = batch_conv2d(ops["w"], xx, stride=_s)
                return jnp.sum(y)
            out[name] = marginal(cstep, {"w": parts[wname], "x": x})

    if want("lg_convchain"):
        def chain_step(ops, t):
            x = (ops["obs"] + 1e-6 * t.astype(jnp.float32)).astype(jnp.bfloat16)
            h = x
            for nm, s in (("conv1/w", 4), ("conv2/w", 2), ("conv3/w", 1)):
                h = jax.nn.relu(batch_conv2d(ops[nm], h, stride=s)).astype(jnp.bfloat16)
            return jnp.sum(h)
        out["lg_convchain"] = marginal(
            chain_step, {"obs": obs, "conv1/w": parts["conv1/w"],
                         "conv2/w": parts["conv2/w"], "conv3/w": parts["conv3/w"]})

    if want("lg_fc_pallas") or want("lg_fc_xla"):
        xf = jax.random.normal(key, (B, 7744), jnp.float32).astype(jnp.bfloat16)
        Wf = parts["fc/w"]  # [B, 7744, 512] bf16
        if want("lg_fc_pallas"):
            def fcp_step(ops, t):
                y = population_linear(jnp.tanh(ops["x"] + t.astype(ops["x"].dtype)), ops["W"])
                return jnp.sum(y)
            out["lg_fc_pallas"] = marginal(fcp_step, {"x": xf, "W": Wf})
        if want("lg_fc_xla"):
            def fcx_step(ops, t):
                xx = jnp.tanh(ops["x"] + t.astype(ops["x"].dtype))
                y = jnp.einsum("bk,bkn->bn", xx, ops["W"], preferred_element_type=jnp.float32)
                return jnp.sum(y)
            out["lg_fc_xla"] = marginal(fcx_step, {"x": xf, "W": Wf})

    if want("lg_forward"):
        keys = jax.random.split(key, B)
        def fwd_step(ops, t):
            o = ops["obs"] + 1e-6 * t.astype(jnp.float32)
            a = model.batch_act_parts(ops["parts"], o, ops["keys"], None)
            return jnp.float32(jnp.sum(a))
        out["lg_forward"] = marginal(fwd_step, {"obs": obs, "parts": parts, "keys": keys})

    # ---- the XLA-side per-step stages the r4 profile only estimated in
    # aggregate ("~2-4 us/member", RESULTS.md): 4-frame stack update, conv1
    # im2col write (runs in XLA outside the fused kernel), argmax + staging.
    if want("lg_stack_update"):
        from deep_neuroevolution_tpu.envs.preprocess import stack_reset, stack_step

        frame = jax.random.uniform(key, (B, 84, 84), jnp.float32)
        stack0 = stack_reset(frame)

        def stk_step(ops, t):
            f = ops["frame"] + 1e-6 * t.astype(jnp.float32)
            s = stack_step(ops["stack"], f)
            return jnp.sum(s)

        out["lg_stack_update"] = marginal(stk_step, {"stack": stack0, "frame": frame})

    if want("lg_im2col1"):
        from deep_neuroevolution_tpu.models.core import extract_patches

        def im_step(ops, t):
            o = (ops["obs"] + 1e-6 * t.astype(jnp.float32)).astype(jnp.bfloat16)
            p = extract_patches(o, 8, 4, "SAME")
            return jnp.sum(p.astype(jnp.float32))

        out["lg_im2col1"] = marginal(im_step, {"obs": obs})

    if want("lg_argmax"):
        scores = jax.random.uniform(key, (B, 1, 64), jnp.float32)

        def am_step(ops, t):
            s = ops["scores"] + t.astype(jnp.float32)
            return jnp.float32(jnp.sum(jnp.argmax(s[:, 0, :], axis=-1)))

        out["lg_argmax"] = marginal(am_step, {"scores": scores})

    if want("lg_forward_fused"):
        from deep_neuroevolution_tpu.models import LargeDQN as _LD

        mf = _LD(num_actions=18, compute_dtype="bfloat16", forward_impl="fused")
        fparts, _ = mf.prepare_batch_params(
            (jax.vmap(mf.init_theta)(jax.random.split(key, B)), None))
        keys = jax.random.split(key, B)
        def ffwd_step(ops, t):
            o = ops["obs"] + 1e-6 * t.astype(jnp.float32)
            a = mf.batch_act_parts(ops["parts"], o, ops["keys"], None)
            return jnp.float32(jnp.sum(a))
        out["lg_forward_fused"] = marginal(
            ffwd_step, {"obs": obs, "parts": fparts, "keys": keys})

    for k, v in out.items():
        print(f"{k:16s} {v * 1e3:8.3f} ms/step  {v / B * 1e6:8.2f} us/member "
              f"({B / v:,.0f} member-steps/s)", file=sys.stderr, flush=True)
    print(json.dumps({"B": B, "model": "large", "stages_ms": {k: v * 1e3 for k, v in out.items()}}),
          flush=True)


def main(B=256, only=None):
    key = jax.random.PRNGKey(0)
    model = VirtualBNDQN(num_actions=18, forward_impl="split")
    out = {}

    def want(name):
        return only is None or name in only.split(",")

    if want("rng_frames"):
        def rng_step(ops, t):
            f = jax.random.randint(jax.random.fold_in(ops["key"], t), (B, 2, 210, 160), 0, 256, jnp.int32)
            return jnp.float32(jnp.sum(f))
        out["rng_frames"] = marginal(rng_step, {"key": key})

    if want("palette") or want("preprocess") or want("preprocess_gray"):
        frames = jax.random.randint(key, (B, 2, 210, 160), 0, 256, jnp.int32).astype(jnp.uint8)
        if want("palette"):
            def pal_step(ops, t):
                g = jnp.asarray(GRAYSCALE_PALETTE)[(ops["frames"] + t.astype(jnp.uint8)).astype(jnp.int32)]
                return jnp.sum(g)
            out["palette"] = marginal(pal_step, {"frames": frames})
        if want("preprocess_gray"):
            from deep_neuroevolution_tpu.envs.preprocess import preprocess_gray_frames

            def preg_step(ops, t):
                o = preprocess_gray_frames(ops["frames"] + t.astype(jnp.uint8), 84, 84)
                return jnp.sum(o)
            out["preprocess_gray"] = marginal(preg_step, {"frames": frames})
        if want("preprocess"):
            def pre_step(ops, t):
                o = preprocess_frames(ops["frames"] + t.astype(jnp.uint8), 84, 84)
                return jnp.sum(o)
            out["preprocess"] = marginal(pre_step, {"frames": frames})

    fc_stages = [s for s in ("fc_xla_f32", "fc_xla_bf16", "fc_xla_honest_bf16",
                             "fc_pallas_f32", "fc_pallas_bf16") if want(s)]
    if fc_stages:
        from deep_neuroevolution_tpu.ops.pallas_forward import population_linear

        W = jax.random.normal(key, (B, 3872, 256), jnp.float32)
        x = jax.random.normal(key, (B, 3872), jnp.float32)
        for name in fc_stages:
            dt = jnp.bfloat16 if name.endswith("bf16") else jnp.float32
            ops = {"x": x.astype(dt), "W": W.astype(dt)}
            if "honest" in name:
                # tanh perturbation: NON-distributive over the einsum, so
                # XLA cannot hoist the dot out of the scan (the linear
                # x·(1+eps·t) tweak was hoistable -> r3's 0.36 ms reading
                # was optimistic)
                def fc_step(ops, t):
                    xx = jnp.tanh(ops["x"] + t.astype(ops["x"].dtype))
                    y = jnp.einsum("bk,bkn->bn", xx, ops["W"], preferred_element_type=jnp.float32)
                    return jnp.sum(y)
            elif "pallas" in name:
                def fc_step(ops, t):
                    y = population_linear(ops["x"] * (1 + 1e-3 * t.astype(ops["x"].dtype)), ops["W"])
                    return jnp.sum(y)
            else:
                def fc_step(ops, t):
                    y = jnp.einsum("bk,bkn->bn", ops["x"] * (1 + 1e-3 * t.astype(ops["x"].dtype)),
                                   ops["W"], preferred_element_type=jnp.float32)
                    return jnp.sum(y)
            out[name] = marginal(fc_step, ops)

    heavy = [s for s in ("conv_batch", "conv_batch_bf16", "act_old", "act_new",
                         "act_new_bf16", "act_fused") if want(s)]
    if heavy:
        obs = jax.random.uniform(key, (B, 84, 84, 4), jnp.float32)
        stats = VBNStats(
            (jnp.zeros((B, 16)), jnp.zeros((B, 32)), jnp.zeros((B, 256))),
            (jnp.ones((B, 16)), jnp.ones((B, 32)), jnp.ones((B, 256))),
        )
        keys = jax.random.split(key, B)

        def mk_ops(m):
            thetas = jax.vmap(m.init_theta)(jax.random.split(key, B))
            parts, st = m.prepare_batch_params((thetas, stats))
            return {"parts": parts, "st": st, "obs": obs, "keys": keys}

        if want("conv_batch"):
            from deep_neuroevolution_tpu.models.core import batch_conv2d

            ops = mk_ops(model)
            def conv_step(ops, t):
                x = ops["obs"] + 1e-6 * t.astype(jnp.float32)
                h1 = jax.nn.relu(batch_conv2d(ops["parts"]["conv1/w"], x, stride=4))
                h2 = jax.nn.relu(batch_conv2d(ops["parts"]["conv2/w"], h1, stride=2))
                return jnp.sum(h2)
            out["conv_batch"] = marginal(conv_step, ops)

        if want("conv_batch_bf16"):
            from deep_neuroevolution_tpu.models.core import batch_conv2d

            ops = mk_ops(VirtualBNDQN(num_actions=18, compute_dtype="bfloat16",
                                      forward_impl="split"))
            def convb_step(ops, t):
                x = (ops["obs"] + 1e-6 * t.astype(jnp.float32)).astype(jnp.bfloat16)
                h1 = jax.nn.relu(batch_conv2d(ops["parts"]["conv1/w"], x, stride=4)).astype(jnp.bfloat16)
                h2 = jax.nn.relu(batch_conv2d(ops["parts"]["conv2/w"], h1, stride=2))
                return jnp.sum(h2)
            out["conv_batch_bf16"] = marginal(convb_step, ops)

        if want("act_old"):
            ops = mk_ops(model)
            def old_step(ops, t):
                o = ops["obs"] + 1e-6 * t.astype(jnp.float32)
                a = jax.vmap(lambda p, oo, k, st: model.act_parts(p, oo, k, st))(
                    ops["parts"], o, ops["keys"], ops["st"])
                return jnp.float32(jnp.sum(a))
            out["act_old"] = marginal(old_step, ops)

        for name, m in [("act_new", VirtualBNDQN(num_actions=18, forward_impl="split")),
                        ("act_new_bf16", VirtualBNDQN(num_actions=18, compute_dtype="bfloat16",
                                                      forward_impl="split"))]:
            if want(name):
                ops = mk_ops(m)
                def new_step(ops, t, _m=m):
                    o = ops["obs"] + 1e-6 * t.astype(jnp.float32)
                    a = _m.batch_act_parts(ops["parts"], o, ops["keys"], ops["st"])
                    return jnp.float32(jnp.sum(a))
                out[name] = marginal(new_step, ops)

        if want("act_folded_bf16"):
            mfold = VirtualBNDQN(num_actions=18, forward_impl="folded",
                                 compute_dtype="bfloat16")
            thetasf = jax.vmap(mfold.init_theta)(jax.random.split(key, B))
            fparts, _ = mfold.prepare_batch_params((thetasf, stats))
            assert "__folded__" in fparts
            split_a = np.asarray(model.batch_act_parts(
                model.prepare_parts(jax.vmap(model.unflatten)(thetasf)),
                obs, keys, stats))
            fold_a = np.asarray(mfold.batch_act_parts(fparts, obs, keys, stats))
            print(f"  [folded vs split action match: {(split_a == fold_a).mean():.4f}]",
                  file=sys.stderr, flush=True)
            def fold_step(ops, t):
                o = ops["obs"] + 1e-6 * t.astype(jnp.float32)
                a = mfold.batch_act_parts(ops["parts"], o, ops["keys"], None)
                return jnp.float32(jnp.sum(a))
            out["act_folded_bf16"] = marginal(
                fold_step, {"obs": obs, "parts": fparts, "keys": keys})

        if want("act_fused1"):
            m1 = VirtualBNDQN(num_actions=18, forward_impl="fused1",
                              compute_dtype="bfloat16")
            thetas1 = jax.vmap(m1.init_theta)(jax.random.split(key, B))
            parts1 = m1.prepare_parts(jax.vmap(m1.unflatten)(thetas1))
            fops1 = m1.fuse_prepare(parts1, stats, style="one")
            split_a = np.asarray(model.batch_act_parts(
                model.prepare_parts(jax.vmap(model.unflatten)(thetas1)),
                obs, keys, stats))
            f1_a = np.asarray(jnp.argmax(m1.batch_scores_fused(fops1, obs), axis=-1))
            match = float((split_a == f1_a).mean())
            print(f"  [fused1 vs split action match: {match:.4f}]",
                  file=sys.stderr, flush=True)
            def f1_step(ops, t):
                o = ops["obs"] + 1e-6 * t.astype(jnp.float32)
                a = jnp.argmax(m1.batch_scores_fused(ops["fops"], o), axis=-1)
                return jnp.float32(jnp.sum(a))
            out["act_fused1"] = marginal(f1_step, {"obs": obs, "fops": fops1})

        if want("act_fused"):
            mf = VirtualBNDQN(num_actions=18, forward_impl="fused")
            thetas = jax.vmap(mf.init_theta)(jax.random.split(key, B))
            parts = mf.prepare_parts(jax.vmap(mf.unflatten)(thetas))
            fops = mf.fuse_prepare(parts, stats)
            # on-chip correctness: fused argmax == split argmax
            split_a = np.asarray(model.batch_act_parts(
                model.prepare_parts(jax.vmap(model.unflatten)(thetas)), obs, keys, stats))
            fused_a = np.asarray(jnp.argmax(mf.batch_scores_fused(fops, obs), axis=-1))
            match = float((split_a == fused_a).mean())
            print(f"  [fused vs split action match: {match:.4f}]", file=sys.stderr, flush=True)
            def fused_step(ops, t):
                o = ops["obs"] + 1e-6 * t.astype(jnp.float32)
                a = jnp.argmax(mf.batch_scores_fused(ops["fops"], o), axis=-1)
                return jnp.float32(jnp.sum(a))
            out["act_fused"] = marginal(fused_step, {"obs": obs, "fops": fops})

    for k, v in out.items():
        print(f"{k:16s} {v * 1e3:8.3f} ms/step  {v / B * 1e6:8.2f} us/member "
              f"({B / v:,.0f} member-steps/s)", file=sys.stderr, flush=True)
    print(json.dumps({"B": B, "stages_ms": {k: v * 1e3 for k, v in out.items()}}), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=256)
    p.add_argument("--only", default=None)
    p.add_argument("--model", default="small", choices=["small", "large"])
    a = p.parse_args()
    (main_large if a.model == "large" else main)(a.B, a.only)
