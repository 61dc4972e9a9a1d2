"""End-to-end Atari-shaped ES generation benchmark (VERDICT r2 next-step #5).

Full `ESTrainer.train_step` on the toy C++ engine + VBN-DQN at pop ≥ 512
(quota accounting across engine rounds), with the generation wall-clock
split into its phases:

  vbn_stats   per-round batch_ref_stats (the per-generation VBN pass)
  host_engine C++ nevo_step/observe time (the simulator side)
  update      gradient + Adam (+ the noise-table stream)
  other       device forward dispatches + tunnel RTT + python glue

TUNNEL CAVEAT: in this environment the chip sits behind the axon relay
(~24 ms/dispatch RTT); the host rollout loop dispatches one device step per
engine step, so "other" is dominated by RTT that a colocated host
(production deployment) would not pay. The per-phase numbers plus the
separately-benched device step (results/bench_conv_r03.json: 1.7 ms at
B=256) are what a real TPU+ALE host extrapolates from — match
concurrent_worker.py:167-179's throughput logs.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_atari_e2e.py
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


class PhaseClock:
    def __init__(self):
        self.t = {}

    def wrap(self, name, fn, sync=False):
        @functools.wraps(fn)
        def timed(*a, **kw):
            t0 = time.time()
            out = fn(*a, **kw)
            if sync:
                import jax

                out = jax.block_until_ready(out)
            self.t[name] = self.t.get(name, 0.0) + (time.time() - t0)
            return out

        return timed


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pop", type=int, default=512)
    p.add_argument("--slots", type=int, default=64)
    p.add_argument("--cutoff", type=int, default=200)
    p.add_argument("--gens", type=int, default=2)
    p.add_argument("--out", default="results/bench_e2e_r03.json")
    args = p.parse_args()

    import jax

    from deep_neuroevolution_tpu.algos import es as es_mod
    from deep_neuroevolution_tpu.algos.es import ESConfig, ESTrainer
    from deep_neuroevolution_tpu.envs.atari import AtariEnv
    from deep_neuroevolution_tpu.models.batchnorm import VirtualBNDQN
    from deep_neuroevolution_tpu.ops import Adam, NoiseTable
    from deep_neuroevolution_tpu.utils import tabular

    tabular.dump_tabular = lambda: tabular._logger._kvs.clear()

    env = AtariEnv("toy", batch_size=args.slots, pipeline_groups=2)
    model = VirtualBNDQN(num_actions=env.num_actions, compute_dtype="bfloat16")
    cfg = ESConfig(
        population_size=args.pop, noise_stdev=0.02, num_eval_episodes=0,
        episode_cutoff_mode=args.cutoff,
    )
    tr = ESTrainer(env, model, cfg, optimizer=Adam(stepsize=0.01),
                   noise_table=NoiseTable.from_seed(count=50_000_000), seed=0)

    clock = PhaseClock()
    orig_stats = VirtualBNDQN.batch_ref_stats
    VirtualBNDQN.batch_ref_stats = clock.wrap("vbn_stats", orig_stats, sync=True)
    env._env.step = clock.wrap("host_engine", env._env.step)
    env._env.observe_gray = clock.wrap("host_engine", env._env.observe_gray)
    es_mod._compute_update = clock.wrap("update", es_mod._compute_update, sync=True)

    # warm-up generation pays all compiles
    t0 = time.time()
    tr.train_step()
    warm = time.time() - t0
    print(f"warm-up gen (compiles): {warm:.1f}s", file=sys.stderr, flush=True)

    clock.t = {}
    t0 = time.time()
    episodes = timesteps = 0
    for _ in range(args.gens):
        st = tr.train_step()
        episodes += int(np.asarray(st.lengths).size)
        timesteps += int(np.asarray(st.lengths).sum())
    wall = time.time() - t0
    VirtualBNDQN.batch_ref_stats = orig_stats

    per_gen = wall / args.gens
    phases = {k: v / args.gens for k, v in clock.t.items()}
    phases["other_dispatch_rtt"] = per_gen - sum(phases.values())
    fps = timesteps * 4 / wall  # frameskip 4
    out = {
        "date": time.strftime("%Y-%m-%d"),
        "workload": f"toy engine B={args.slots} slots, VBN-DQN bf16, "
                    f"pop {args.pop}, cutoff {args.cutoff} engine-steps",
        "platform": jax.devices()[0].platform,
        "gens": args.gens,
        "s_per_generation": per_gen,
        "phase_s_per_generation": phases,
        "episodes_per_gen": episodes / args.gens,
        "member_steps_per_s": timesteps / wall,
        "frames_per_s": fps,
        "note": "axon tunnel adds ~24 ms RTT per device dispatch; "
                "'other_dispatch_rtt' is almost entirely that. Device-step "
                "capability measured separately in bench_conv_r03.json.",
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("s_per_generation", "phase_s_per_generation", "frames_per_s")}))
    env.close()


if __name__ == "__main__":
    main()
