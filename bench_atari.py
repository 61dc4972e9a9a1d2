"""North-star workload benchmark: the Frostbite-ES device path at scale.

Three measurements, all on the real chip (reproducible versions of the
numbers RESULTS.md claims; VERDICT r1 weak #2):

1. **Population conv-net step throughput** — the per-engine-step device
   pipeline of the Atari path (algos/rollout_host.py `_device_step`): raw
   2×210×160 uint8 frames → palette-free grayscale/max/resize preprocessing
   (envs/preprocess.py, mirroring tf_atari.py:81-94) → 4-frame stack update →
   vmapped per-member VirtualBN-DQN forward (the ES-Frostbite policy,
   es_atari_config.json "ModelVirtualBN") → argmax actions, at B = 64 / 256 /
   512 distinct members. T steps are scanned inside ONE dispatch so the
   number measures device capability, not the axon tunnel's ~1 s dispatch RTT
   (real deployments drive this loop from a colocated host). Each engine step
   is 4 emulator frames (frameskip, tf_atari.cpp:64-75), so
   frames/s = B · 4 · T / wall.

2. **ES gradient at reference scale** — g = Σ wᵢ·ε(idxᵢ) over the 250M-float
   noise table for pop 5000 (2500 antithetic pairs) × the 1,008,450-param
   VBN-DQN:
   the Pallas streamed gather-matmul (ops/pallas_kernels.py) vs the XLA scan
   path (ops/fitness.py), reported as ms/call and effective HBM GB/s
   (bytes = pairs × D × 4 read once). This is the master's hot loop
   (es.py:291-296) that streamed ~10 GB per generation on CPU.

3. **Maze ES end-to-end** (secondary): full fused generations at pop 5000 on
   the device Hard Maze — the whole-algorithm number bench.py r1 reported.

Usage: python bench_atari.py [--json]   (run on the real chip)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# 720-core CPU cluster estimate for the reference Frostbite-ES workload
# (arXiv:1703.03864 lineage; ~500 env-steps/s/core): see BASELINE.md
REF_CPU_CLUSTER_FPS = 360_000.0

FRAMESKIP = 4  # emulator frames per engine step (tf_atari.cpp:64-75)

# Timing method: the axon tunnel makes per-dispatch wall clock (and even
# block_until_ready) unreliable, so every measurement is a MARGINAL cost:
# the same jitted program is run with K_small and K_big internally-scanned
# iterations, a scalar is fetched from each (forcing completion), and
# per-iteration time = (T_big - T_small) / (K_big - K_small). Tunnel RTT and
# result-transfer cost cancel in the subtraction.


def _timed_fetch(fn, *args):
    t0 = time.time()
    out = fn(*args)
    _ = np.asarray(out)  # forces completion through the tunnel
    return time.time() - t0


def bench_conv_population(
    batch_sizes=(64, 256, 512),
    steps=(20, 120),
    reps=3,
    compute_dtype="bfloat16",
    obs_mode="gray",
    model_factory=None,
):
    """Device pipeline steps/s for B distinct VBN-DQN members (marginal).

    Defaults measure the PRODUCTION path: engine-side palette decode
    (AtariEnv obs_mode='gray' — the device-side palette gather measured
    ~500 µs/member, 98% of the whole step, scripts/profile_atari_stages.py)
    and bf16 conv/fc GEMMs with the fc mat-vec through the Pallas
    member-pipelined kernel (ops/pallas_forward.py). obs_mode='indexed' +
    compute_dtype='float32' reproduces the r2 reference-exact path.

    T is a TRACED loop bound (lax.fori_loop), so each batch size compiles
    once — tunnel compiles cost 30-60 s each."""
    from deep_neuroevolution_tpu.envs.preprocess import (
        preprocess_frames, preprocess_gray_frames, stack_reset, stack_step,
    )
    from deep_neuroevolution_tpu.models.batchnorm import VirtualBNDQN

    if model_factory is None:
        model = VirtualBNDQN(num_actions=18, compute_dtype=compute_dtype)
    else:
        model = model_factory()
    pre = preprocess_gray_frames if obs_mode == "gray" else preprocess_frames
    results = {}
    for B in batch_sizes:
        key = jax.random.PRNGKey(0)
        act = model.make_batch_act()
        # Synthesize + prepare in member CHUNKS so no full [B, D] f32 stack
        # ever exists: the eager whole-population path peaks at f32 θ + f32
        # parts + compute-dtype layout simultaneously (~15.6 GB at LargeDQN
        # B=384 — the r4 OOM). Only the prepared compute-dtype pytree is
        # kept, exactly what the step loop reads.
        ref_batch = (
            jax.random.uniform(key, (128, 84, 84, 4), jnp.float32)
            if model.needs_ref_batch else None
        )
        chunk = min(B, 128)
        preps, stat_parts = [], []
        for s in range(0, B, chunk):
            ks = jax.random.split(jax.random.fold_in(key, s), min(chunk, B - s))
            th = jax.vmap(model.init_theta)(ks)
            st = model.batch_ref_stats(th, ref_batch) if model.needs_ref_batch else None
            p, st = act.prepare((th, st))
            jax.block_until_ready(p)
            preps.append(p)
            stat_parts.append(st)
            del th
        prepared = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, 0), *preps)
        stats = (
            jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, 0), *stat_parts)
            if model.needs_ref_batch else None
        )
        del preps, stat_parts
        jax.block_until_ready(prepared)
        frames0 = jax.random.randint(
            key, (B, 2, 210, 160), 0, 256, dtype=jnp.int32
        ).astype(jnp.uint8)

        @jax.jit
        def run(thetas, stats, frames0, T):
            stack0 = stack_reset(pre(frames0, 84, 84))

            def step(t, carry):
                stack, acc = carry
                # rolled frames stand in for the engine's observations (the
                # real loop feeds host frames; staging cost is the same)
                f = jnp.roll(frames0, t, axis=3)
                obs = pre(f, 84, 84)
                new_stack = stack_step(stack, obs)
                actions = act((thetas, stats), new_stack, None)
                return new_stack, acc + jnp.sum(actions)

            _, acc = jax.lax.fori_loop(0, T, step, (stack0, jnp.int32(0)))
            return acc

        t_small, t_big = steps
        for T in (t_small, t_big):  # compile once + warm
            _timed_fetch(run, prepared, stats, frames0, jnp.int32(T))
        dts, dtb = [], []
        for _ in range(reps):
            dts.append(_timed_fetch(run, prepared, stats, frames0, jnp.int32(t_small)))
            dtb.append(_timed_fetch(run, prepared, stats, frames0, jnp.int32(t_big)))
        per_step = (min(dtb) - min(dts)) / (t_big - t_small)
        del prepared, stats  # free this B's member stack before the next
        steps_per_s = B / per_step
        results[B] = {
            "engine_steps_per_s": steps_per_s,
            "frames_per_s": steps_per_s * FRAMESKIP,
            "ms_per_device_step": 1e3 * per_step,
        }
        print(
            f"conv[{obs_mode},{compute_dtype}] B={B}: {steps_per_s:,.0f} member-steps/s "
            f"({steps_per_s * FRAMESKIP / 1e6:.2f}M frames/s, "
            f"{results[B]['ms_per_device_step']:.3f} ms/step)",
            file=sys.stderr,
        )
    return results, model.num_params


def bench_gradient(dim: int, npairs=2500, table_count=250_000_000, ks=(1, 6), reps=3, pallas_only=False):
    """Pallas vs XLA streamed ES gradient at pop 5000 × dim params
    (marginal cost over K internally-scanned kernel calls)."""
    from deep_neuroevolution_tpu.ops import NoiseTable, fitness
    from deep_neuroevolution_tpu.ops.pallas_kernels import (
        gradient_from_noise_pallas, sample_aligned_indices,
    )

    # table generated ON DEVICE: the bench measures streaming bandwidth, not
    # RandomState parity, and shipping the reference-exact 1 GB host table
    # through the axon relay takes >20 min in this environment
    print(f"building {table_count:,}-float noise table on device...",
          file=sys.stderr, flush=True)
    t0 = time.time()
    table = NoiseTable.from_key(jax.random.PRNGKey(123), count=table_count)
    _ = np.asarray(table.noise[:8])
    print(f"table ready in {time.time() - t0:.0f}s", file=sys.stderr, flush=True)
    key = jax.random.PRNGKey(1)
    idxs = sample_aligned_indices(key, table_count, dim, npairs)
    w = jax.random.normal(key, (npairs,), jnp.float32)
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    out = {}
    kernels = {}
    if not pallas_only:
        kernels["xla_scan"] = lambda ww: fitness.gradient_from_noise(table.noise, idxs, ww, dim, 128)
    if on_tpu:
        kernels["pallas"] = lambda ww: gradient_from_noise_pallas(table.noise, idxs, ww, dim)
    for name, kernel in kernels.items():

        @partial(jax.jit, static_argnums=(2,))
        def many(table_noise, w, K, _kernel=kernel):
            def body(acc, k):
                g = _kernel(w * (1.0 + 1e-6 * k))  # vary input: no CSE
                return acc + jnp.sum(g), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ks[1], dtype=jnp.float32)[:K])
            return acc

        for K in ks:
            t = _timed_fetch(many, table.noise, w, K)  # compile + warm
            print(f"  [{name} compile+run K={K}: {t:.0f}s]", file=sys.stderr, flush=True)
        d_small = min(_timed_fetch(many, table.noise, w, ks[0]) for _ in range(reps))
        d_big = min(_timed_fetch(many, table.noise, w, ks[1]) for _ in range(reps))
        dt = (d_big - d_small) / (ks[1] - ks[0])
        gbs = npairs * dim * 4 / dt / 1e9
        out[name] = {"ms": dt * 1e3, "gb_per_s": gbs}
        print(f"gradient[{name}] pop {2 * npairs} × {dim:,}: "
              f"{dt * 1e3:.1f} ms, {gbs:.0f} GB/s", file=sys.stderr)
    return out


def bench_gradient_virtual(dim: int, npairs=2500, ks=(1, 3), reps=2, chunk=128):
    """The VirtualNoise HBM↔VPU tradeoff (VERDICT r3 weak #6 done-criterion):
    g = Σ wᵢ·ε(idxᵢ) with every ε row REGENERATED from fold_in(key, idx)
    instead of read from the HBM table — zero table memory, pure VPU threefry
    cost. Compare against gradient_pop5000_pallas (718 GB/s table streaming)."""
    import jax.numpy as jnp

    from deep_neuroevolution_tpu.ops import fitness
    from deep_neuroevolution_tpu.ops.noise import VirtualNoise

    src = VirtualNoise.from_seed(count=50_000_000)
    key = jax.random.PRNGKey(1)
    idxs = src.sample_index_batch(key, dim, npairs)
    w = jax.random.normal(key, (npairs,), jnp.float32)

    @partial(jax.jit, static_argnums=(1,))
    def many(w, K):
        def body(acc, k):
            g = fitness.gradient_from_noise(src, idxs, w * (1.0 + 1e-6 * k), dim, chunk)
            return acc + jnp.sum(g), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ks[1], dtype=jnp.float32)[:K])
        return acc

    for K in ks:
        t = _timed_fetch(many, w, K)
        print(f"  [grad_virtual compile+run K={K}: {t:.0f}s]", file=sys.stderr, flush=True)
    d_small = min(_timed_fetch(many, w, ks[0]) for _ in range(reps))
    d_big = min(_timed_fetch(many, w, ks[1]) for _ in range(reps))
    dt = (d_big - d_small) / (ks[1] - ks[0])
    eq_gbs = npairs * dim * 4 / dt / 1e9  # the table bandwidth this REPLACES
    print(f"gradient[virtual] pop {2 * npairs} × {dim:,}: {dt * 1e3:.1f} ms "
          f"(≡ {eq_gbs:.0f} GB/s of table reads avoided; zero table HBM)",
          file=sys.stderr)
    return {"ms": dt * 1e3, "equiv_table_gb_per_s": eq_gbs}


def bench_maze(pop=5000, warmup=4, reps=10):
    """Secondary: full fused maze-ES generations (r1's headline)."""
    from deep_neuroevolution_tpu.envs import MazeEnv
    from deep_neuroevolution_tpu.models import ContinuousMLP
    from deep_neuroevolution_tpu.ops import Adam, NoiseTable
    from deep_neuroevolution_tpu.parallel.es_pod import make_pod_es_step
    from deep_neuroevolution_tpu.parallel.mesh import make_pop_mesh

    mesh = make_pop_mesh()
    n_dev = mesh.devices.size
    env = MazeEnv()
    model = ContinuousMLP(obs_dim=11, ac_dim=2, hidden=16)
    opt = Adam(stepsize=0.05)
    use_pallas = jax.devices()[0].platform in ("tpu", "axon")
    step = make_pod_es_step(
        env, model, opt, mesh, npairs_per_device=pop // (2 * n_dev),
        use_pallas_grad=use_pallas,
    )
    table = NoiseTable.from_seed(count=5_000_000)
    theta = model.init_theta(jax.random.PRNGKey(0))
    opt_state = opt.init(model.num_params)
    tslimit, sigma = jnp.int32(env.default_timestep_cutoff), jnp.float32(0.05)

    def gen(theta, opt_state, i):
        keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(7), i), n_dev)
        return step(theta, opt_state, table.noise, keys, tslimit, sigma)

    res = gen(theta, opt_state, 0)
    _ = np.asarray(res.update_ratio)
    for i in range(1, warmup):
        res = gen(res.theta, res.opt_state, i)
        _ = np.asarray(res.update_ratio)
    t0 = time.time()
    frames = 0
    for i in range(warmup, warmup + reps):
        res = gen(res.theta, res.opt_state, i)
        frames += int(np.asarray(res.lengths_n2).sum())
    dt = time.time() - t0
    fps = frames / dt
    print(f"maze ES pop {pop}: {fps:,.0f} frames/s ({dt / reps:.3f} s/gen)",
          file=sys.stderr)
    return fps


def run_all():
    conv, dim = bench_conv_population()
    # wedge-safe gradient modes (50M device table, pallas-only) — the
    # 250M-table / XLA-scan programs hang this environment's remote compiler
    grad = bench_gradient(dim, table_count=50_000_000, ks=(1, 4), reps=2,
                          pallas_only=True)
    # GA-Atari scale: the large DQN (gpu ga_atari_config.json "LargeModel")
    from deep_neuroevolution_tpu.models import LargeDQN

    dim_large = LargeDQN(num_actions=18).num_params
    grad_large = bench_gradient(dim_large, table_count=50_000_000, ks=(1, 4),
                                reps=2, pallas_only=True)
    maze_fps = bench_maze()
    best_b = max(conv, key=lambda b: conv[b]["frames_per_s"])
    return {
        "conv": {str(k): v for k, v in conv.items()},
        "vbn_dqn_params": dim,
        "gradient_pop5000": grad,
        "large_dqn_params": dim_large,
        "gradient_pop5000_large": grad_large,
        "maze_es_frames_per_s_pop5000": maze_fps,
        "headline": {
            "metric": f"atari_es_device_frames_per_s_B{best_b}",
            "value": round(conv[best_b]["frames_per_s"], 1),
            "unit": "frames/s",
            "vs_baseline": round(conv[best_b]["frames_per_s"] / REF_CPU_CLUSTER_FPS, 3),
        },
    }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--json", action="store_true", help="dump the full result dict")
    p.add_argument(
        "--only",
        choices=["conv", "conv_indexed", "conv_large", "grad", "grad_pallas",
                 "grad_large", "grad_large_pallas", "grad_virtual", "maze"],
        help="run a single measurement (separate processes keep tunnel sessions short)",
    )
    args = p.parse_args()
    if args.only == "conv":
        conv, dim = bench_conv_population()
        print(json.dumps({"conv": {str(k): v for k, v in conv.items()}, "vbn_dqn_params": dim}))
    elif args.only == "conv_large":
        # GA-Atari forward: the LargeDQN (ga_atari_config.json "LargeModel",
        # ~4M params/member — fc streams through the K-tiled Pallas mat-vec)
        from deep_neuroevolution_tpu.models import LargeDQN

        def mk(**kw):
            return LargeDQN(num_actions=18, compute_dtype="bfloat16", **kw)

        import deep_neuroevolution_tpu.models.batchnorm  # noqa: F401
        # r5: chunked member synthesis+prepare removed the >=384 OOM (no
        # full f32 theta-stack ever exists — see bench_conv_population);
        # the sweep now covers the whole HBM-feasible batch axis
        conv, dim = bench_conv_population(
            batch_sizes=(64, 256, 384, 512), model_factory=mk
        )
        print(json.dumps({"conv_large": {str(k): v for k, v in conv.items()}, "large_dqn_params": dim}))
    elif args.only == "conv_indexed":
        # the r2 reference-exact path (device palette gather, f32) — kept to
        # quantify what the engine-side LUT + bf16 buy
        conv, dim = bench_conv_population(
            batch_sizes=(64, 256), compute_dtype="float32", obs_mode="indexed"
        )
        print(json.dumps({"conv_indexed": {str(k): v for k, v in conv.items()}, "vbn_dqn_params": dim}))
    elif args.only == "grad":
        from deep_neuroevolution_tpu.models.batchnorm import VirtualBNDQN

        dim = VirtualBNDQN(num_actions=18).num_params
        print(json.dumps({"gradient_pop5000": bench_gradient(dim), "dim": dim}))
    elif args.only == "grad_pallas":
        # pallas-only, reduced table/trip counts: the production gradient
        # path without the XLA-scan comparison arm, on a 50M-float table —
        # both the scan arm and the 250M-table programs repeatedly wedged
        # this environment's remote compiler (effective GB/s is unchanged:
        # the stream reads pairs x dim floats either way)
        from deep_neuroevolution_tpu.models.batchnorm import VirtualBNDQN

        dim = VirtualBNDQN(num_actions=18).num_params
        print(json.dumps({"gradient_pop5000": bench_gradient(dim, table_count=50_000_000,
                                                             ks=(1, 4), reps=2,
                                                             pallas_only=True), "dim": dim}))
    elif args.only == "grad_large":
        from deep_neuroevolution_tpu.models import LargeDQN

        dim = LargeDQN(num_actions=18).num_params
        print(json.dumps({"gradient_pop5000_large": bench_gradient(dim), "dim": dim}))
    elif args.only == "grad_large_pallas":
        from deep_neuroevolution_tpu.models import LargeDQN

        dim = LargeDQN(num_actions=18).num_params
        print(json.dumps({"gradient_pop5000_large": bench_gradient(dim, table_count=50_000_000,
                                                                   ks=(1, 4), reps=2,
                                                                   pallas_only=True), "dim": dim}))
    elif args.only == "grad_virtual":
        from deep_neuroevolution_tpu.models.batchnorm import VirtualBNDQN

        dim = VirtualBNDQN(num_actions=18).num_params
        print(json.dumps({"gradient_pop5000_virtual": bench_gradient_virtual(dim),
                          "dim": dim}))
    elif args.only == "maze":
        print(json.dumps({"maze_es_frames_per_s_pop5000": bench_maze()}))
    else:
        res = run_all()
        print(json.dumps(res if args.json else res["headline"]))
