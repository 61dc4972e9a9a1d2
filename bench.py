"""Benchmark: the north-star Atari ES device pipeline (VERDICT r2 #2).

HEADLINE — `atari_es_device_frames_per_s`: the per-engine-step device path
of Frostbite-ES (es_atari_config.json "ModelVirtualBN") at B=256 distinct
members: grayscale frames (engine-side palette LUT, nevo_observe_gray) →
2-frame max + align-corners resize matmuls → 4-frame stack → batch-explicit
VBN-DQN forward in bf16 with the fc mat-vec through the Pallas
member-pipelined kernel (ops/pallas_forward.py) → argmax actions. Each
engine step is 4 emulator frames (frameskip, tf_atari.cpp:64-75).

Timing is MARGINAL over a traced loop bound: the same compiled program runs
T_small and T_big internally-looped steps and per-step cost is the
difference — tunnel RTT and result-transfer cancel (bench_atari.py:49-54).

SECONDARY — maze ES end-to-end frames/s at pop 5000 (the r1/r2 headline),
appended to stderr and to results/bench_history.jsonl for regression
tracking.

Baseline denominator: the reference's ~720-core CPU cluster at ~500
env-steps/s/core ≈ 360k frames/s (BASELINE.md).

Prints exactly one JSON line on stdout.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_CPU_CLUSTER_FPS = 360_000.0  # 720 cores × ~500 steps/s (documented estimate)

ATARI_B = 256
MAZE_POP = 5000


def bench_atari_conv():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_atari import bench_conv_population

    conv, _ = bench_conv_population(batch_sizes=(ATARI_B,), reps=3)
    return conv[ATARI_B]


def bench_conv_large():
    """Secondary: the GA-Atari LargeDQN population forward (whole-net fused
    kernel) at B=256 — tracked per round since the r3→r4 4x regression-fix."""
    from bench_atari import bench_conv_population
    from deep_neuroevolution_tpu.models import LargeDQN

    conv, _ = bench_conv_population(
        batch_sizes=(ATARI_B,), reps=2,
        model_factory=lambda: LargeDQN(num_actions=18, compute_dtype="bfloat16"),
    )
    return conv[ATARI_B]


def bench_maze():
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
        env, model, opt, mesh, npairs_per_device=MAZE_POP // (2 * n_dev),
        use_pallas_grad=use_pallas,
    )
    table = NoiseTable.from_seed(count=5_000_000)
    theta = model.init_theta(jax.random.PRNGKey(0))
    opt_state = opt.init(model.num_params)
    tslimit, sigma = jnp.int32(env.default_timestep_cutoff), jnp.float32(0.05)

    def one_gen(theta, opt_state, i):
        keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(7), i), n_dev)
        return step(theta, opt_state, table.noise, keys, tslimit, sigma)

    res = one_gen(theta, opt_state, 0)
    res.theta.block_until_ready()
    for i in range(1, 4):
        res = one_gen(res.theta, res.opt_state, i)
        res.theta.block_until_ready()
    t0 = time.time()
    frames = 0
    for i in range(4, 12):
        res = one_gen(res.theta, res.opt_state, i)
        frames += int(np.asarray(res.lengths_n2).sum())
    res.theta.block_until_ready()
    return frames / (time.time() - t0)


def main():
    atari = bench_atari_conv()
    fps = atari["frames_per_s"]
    try:
        large = bench_conv_large()
    except Exception as e:  # secondary must never sink the headline
        print(f"conv_large secondary failed: {e}", file=sys.stderr)
        large = None
    try:
        maze_fps = bench_maze()
    except Exception as e:
        print(f"maze secondary failed: {e}", file=sys.stderr)
        maze_fps = None

    headline = {
        "metric": f"atari_es_device_frames_per_s_B{ATARI_B}",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / REF_CPU_CLUSTER_FPS, 3),
    }
    print(json.dumps(headline))
    print(
        f"atari B={ATARI_B}: {atari['engine_steps_per_s']:,.0f} member-steps/s, "
        f"{atari['ms_per_device_step']:.3f} ms/device-step; "
        f"ga-large: " + (f"{large['frames_per_s']:,.0f} frames/s" if large else "n/a")
        + f"; maze pop{MAZE_POP}: "
        + (f"{maze_fps:,.0f} frames/s" if maze_fps else "n/a"),
        file=sys.stderr,
    )
    # per-round regression tracking (VERDICT r2 next-step #2)
    try:
        hist_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "results", "bench_history.jsonl")
        os.makedirs(os.path.dirname(hist_path), exist_ok=True)
        with open(hist_path, "a") as f:
            f.write(json.dumps({
                "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                "atari_frames_per_s_B256": round(fps, 1),
                "atari_ms_per_device_step": round(atari["ms_per_device_step"], 4),
                "ga_large_frames_per_s_B256": round(large["frames_per_s"], 1) if large else None,
                "maze_frames_per_s_pop5000": round(maze_fps, 1) if maze_fps else None,
            }) + "\n")
    except OSError as e:
        print(f"history append failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
