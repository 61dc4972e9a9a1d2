"""Native env-engine throughput + host→device staging bench (VERDICT r3
weak #4: ground the deployment extrapolation).

Measures, on THIS host:
1. **Engine frames/s vs thread count** — the C++ thread-pooled simulator
   pool (native/env_engine.cpp; the reference's per-op thread-pool sharding,
   tf_env.cpp:115-318) stepping B slots with random actions + grayscale
   observation reads, for the toy backend and (when buildable) the ALE-stub
   backend. Per-core rates size the host pool a real deployment needs.
2. **uint8 host→device staging rate** — jnp.asarray + block of the exact
   [B, 2, 210, 160] frame batches the rollout engine ships per group. In
   THIS environment the transfer rides the axon relay (slow by design);
   the number is reported as the tunnel's rate, next to the requirement.

Writes results/engine_bench_r04.json; run host-only:
    NEVO_PLATFORM=cpu python scripts/bench_engine.py          # engine only
    python scripts/bench_engine.py --staging                  # + real chip
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if os.environ.get("NEVO_PLATFORM"):
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    import jax

    jax.config.update("jax_platforms", os.environ["NEVO_PLATFORM"])

import numpy as np  # noqa: E402

# What a deployment must feed: the r4 device capability at B=256
DEVICE_FRAMES_PER_S = 600_000.0  # results/bench_conv_r03.json (frameskip x4)
# Public per-core ALE throughput range incl. preprocessing overhead: the
# reference fleet achieved ~500 env-frames/s/core end to end (360k / 720,
# BASELINE.md); bare ALE commonly cites 2-6k frames/s/core
ALE_FRAMES_PER_CORE = (500.0, 2000.0, 6000.0)


def bench_backend(backend: str, arg: str, lib_path=None, batch=256,
                  threads_list=(1, 2, 4), steps=150, frameskip=4):
    from deep_neuroevolution_tpu.native.bridge import HostBatchEnv

    out = {}
    for nt in threads_list:
        env = HostBatchEnv(backend, arg, batch, num_threads=nt, lib_path=lib_path)
        try:
            rng = np.random.default_rng(0)
            env.reset(noops=rng.integers(1, 31, size=batch), max_frames=10**9)
            acts = rng.integers(0, env.num_actions, size=(steps, batch)).astype(np.int32)
            gray = getattr(env._lib, "nevo_has_gray", False)
            if gray:
                env.set_gray_lut(np.arange(256, dtype=np.uint8))
            # warm
            for t in range(5):
                env.step(acts[t])
                (env.observe_gray if gray else env.observe)()
            t0 = time.time()
            resets = 0
            for t in range(steps):
                _, done = env.step(acts[t])
                (env.observe_gray if gray else env.observe)()
                if done.any():  # keep all slots hot, like the rollout engine
                    idx = np.nonzero(done)[0].astype(np.int32)
                    env.reset(indices=idx,
                              noops=rng.integers(1, 31, size=idx.size),
                              max_frames=10**9)
                    resets += int(idx.size)
            dt = time.time() - t0
            eng_steps = steps * batch / dt
            out[str(nt)] = {
                "engine_steps_per_s": eng_steps,
                "frames_per_s": eng_steps * frameskip,
                "resets": resets,
            }
            print(f"{backend}[{nt}t] B={batch}: {eng_steps:,.0f} engine-steps/s "
                  f"({eng_steps * frameskip / 1e6:.2f}M frames/s)",
                  file=sys.stderr, flush=True)
        finally:
            env.close()
    return out


def bench_staging(batch=256, reps=8):
    import jax
    import jax.numpy as jnp

    frames = np.random.default_rng(0).integers(
        0, 256, size=(batch, 2, 210, 160), dtype=np.uint8)
    nbytes = frames.nbytes
    x = jnp.asarray(frames)  # warm path/alloc
    jax.block_until_ready(x)
    t0 = time.time()
    for i in range(reps):
        frames[0, 0, 0, 0] = i  # defeat any caching
        x = jnp.asarray(frames)
        jax.block_until_ready(x)
    dt = (time.time() - t0) / reps
    return {"bytes": int(nbytes), "s_per_transfer": dt,
            "gb_per_s": nbytes / dt / 1e9,
            "platform": jax.devices()[0].platform}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--staging", action="store_true",
                   help="also measure host→device uint8 staging (touches the chip)")
    p.add_argument("--batch", type=int, default=256)
    a = p.parse_args()

    res = {"batch": a.batch}
    res["toy"] = bench_backend("toy", "", batch=a.batch)
    try:
        from deep_neuroevolution_tpu.native.build import build_ale_stub

        stub = str(build_ale_stub())
        res["ale_stub"] = bench_backend("ale", "pong.bin", lib_path=stub,
                                        batch=a.batch)
        res["ale_stub_note"] = (
            "header-only ALE stub (no real game logic) — measures the "
            "engine framework's per-step overhead ceiling, not Atari cost"
        )
    except Exception as e:
        res["ale_stub"] = {"error": str(e)[:200]}

    if a.staging:
        res["staging_uint8"] = bench_staging(batch=a.batch)

    # deployment sizing: host cores + staging bandwidth needed to feed the
    # measured device capability (RESULTS.md 'engine-bound' replacement)
    member_steps = DEVICE_FRAMES_PER_S / 4
    frame_bytes = 2 * 210 * 160  # uint8 gray frames per engine step
    res["deployment_model"] = {
        "device_capability_frames_per_s": DEVICE_FRAMES_PER_S,
        "host_to_device_gbps_required": member_steps * frame_bytes / 1e9,
        "host_cores_needed_at_frames_per_core": {
            str(int(r)): round(DEVICE_FRAMES_PER_S / r) for r in ALE_FRAMES_PER_CORE
        },
        "note": "500 f/s/core = the reference fleet's end-to-end rate "
                "(360k/720, BASELINE.md); 2-6k = bare-ALE public range. "
                "Feeding one v5e chip at 600k frames/s therefore needs a "
                "~100-1200 core host fleet (or several TPU hosts sharing "
                "the chip's population shard), plus ~10 GB/s of uint8 DMA "
                "— within one TPU host's PCIe envelope.",
    }

    out_path = os.path.join(REPO, "results", "engine_bench_r04.json")
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({"toy_2t_frames_per_s": res["toy"]["2"]["frames_per_s"],
                      "out": out_path}))


if __name__ == "__main__":
    main()
