"""Humanoid ES learning-curve validation (VERDICT r2 next-step #4).

Runs the reference Humanoid workload — 256×256 tanh MujocoMLP with obs
normalization (configurations/humanoid.json → es_distributed/policies.py:122-206)
— through the full ESTrainer on the MuJoCo host engine, with the
reference's calc_obstat_prob=0.01 Bernoulli obs-stat sampling ACTIVE
(es.py:356-363), for several seeds, and writes the learning curves +
obs-stat accounting to results/humanoid_curve.json.

Population is reduced from the reference's episodes_per_batch=10000 to fit
this host (the reference number assumed a 720-core fleet; flags below are
honest about that). The success criterion is the reference's qualitative
one: monotone-trending reward growth from the ~80-per-episode random policy
baseline, with the obs-stat count tracking the sampled fraction.

Run host-only (the chip stays free for benches):
    NEVO_PLATFORM=cpu python scripts/humanoid_curve.py --seeds 3 --gens 40
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("NEVO_PLATFORM"):
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    import jax

    jax.config.update("jax_platforms", os.environ["NEVO_PLATFORM"])

import numpy as np  # noqa: E402


def run_seed(seed: int, gens: int, pop: int, batch_size: int, tslimit: int,
             obstat_prob: float, resume_dir: str = None):
    """One seed's curve. With `resume_dir`, progress (curve JSON + full
    trainer checkpoint) is written every generation and a restart continues
    where the previous process stopped — long reference-scale runs survive
    round boundaries (VERDICT r3 missing #3)."""
    from deep_neuroevolution_tpu.algos.es import ESConfig, ESTrainer
    from deep_neuroevolution_tpu.envs.mujoco import MujocoHostEnv
    from deep_neuroevolution_tpu.models import MujocoMLP
    from deep_neuroevolution_tpu.ops import Adam, NoiseTable
    from deep_neuroevolution_tpu.utils import checkpoint, tabular

    tabular.dump_tabular = lambda: tabular._logger._kvs.clear()
    env = MujocoHostEnv("Humanoid-v5", batch_size=batch_size)
    sp = env.action_space
    # humanoid.json policy args: hidden_dims [256,256], tanh, continuous
    # actions, ac_noise_std 0.01 (policies.py:122-206)
    model = MujocoMLP(
        obs_dim=env.obs_shape[0], ac_dim=sp.dim,
        ac_low=tuple(sp.low), ac_high=tuple(sp.high),
        hidden_dims=(256, 256), nonlin_type="tanh", ac_noise_std=0.01,
    )
    cfg = ESConfig(
        # humanoid.json config block: l2coeff 0.005, noise_stdev 0.02,
        # calc_obstat_prob 0.01, adaptive tslimit via the cutoff DSL
        noise_stdev=0.02, l2coeff=0.005, population_size=pop,
        num_eval_episodes=4, calc_obstat_prob=obstat_prob,
        episode_cutoff_mode=tslimit,
    )
    tr = ESTrainer(env, model, cfg, optimizer=Adam(stepsize=0.01),
                   noise_table=NoiseTable.from_seed(count=5_000_000), seed=seed)
    curve, eval_curve, lens, obcounts = [], [], [], []
    ckpt = jpath = None
    if resume_dir:
        os.makedirs(resume_dir, exist_ok=True)
        ckpt = os.path.join(resume_dir, f"seed{seed}.ckpt")
        jpath = os.path.join(resume_dir, f"seed{seed}.json")
        if os.path.exists(ckpt) and os.path.exists(jpath):
            checkpoint.load_trainer(ckpt, tr)
            with open(jpath) as f:
                prev = json.load(f)
            curve, eval_curve = prev["curve"], prev["eval_curve"]
            lens, obcounts = prev["ep_len"], prev["ob_counts"]
            print(f"seed {seed}: resumed at gen {len(curve)}", file=sys.stderr, flush=True)
    t0 = time.time()
    for g in range(len(curve), gens):
        st = tr.train_step()
        curve.append(float(np.asarray(st.returns).mean()))
        eval_curve.append(float(np.asarray(st.eval_returns).mean())
                          if st.eval_returns.size else float("nan"))
        lens.append(float(np.asarray(st.lengths).mean()))
        obcounts.append(float(np.asarray(tr.state.ob_stat.count)))
        print(f"seed {seed} gen {g}: rew {curve[-1]:.1f} eval {eval_curve[-1]:.1f} "
              f"len {lens[-1]:.0f} obcount {obcounts[-1]:.0f} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
        if resume_dir:
            checkpoint.save_trainer(ckpt, tr)
            with open(jpath + ".tmp", "w") as f:
                json.dump({"curve": curve, "eval_curve": eval_curve, "ep_len": lens,
                           "ob_counts": obcounts,
                           "timesteps": int(tr.state.timesteps_so_far)}, f)
            os.replace(jpath + ".tmp", jpath)
    total_ts = tr.state.timesteps_so_far
    env.close()
    return {
        "curve": curve, "eval_curve": eval_curve, "ep_len": lens,
        "ob_counts": obcounts, "timesteps": int(total_ts),
        # calc_obstat_prob semantics check: sampled fraction of total steps
        "obstat_fraction": obcounts[-1] / max(total_ts, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--seed_list", default=None,
                   help="comma-separated explicit seeds (overrides --seeds); "
                        "lets one seed run per OS process for parallel campaigns")
    p.add_argument("--gens", type=int, default=40)
    p.add_argument("--pop", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--tslimit", type=int, default=1000)
    p.add_argument("--obstat_prob", type=float, default=0.01)
    p.add_argument("--out", default="results/humanoid_curve.json")
    p.add_argument("--resume_dir", default=None,
                   help="per-gen checkpoints + incremental per-seed JSON here; "
                        "restarts continue (long runs survive round boundaries)")
    args = p.parse_args()

    seeds = {}
    seed_values = ([int(s) for s in args.seed_list.split(",")]
                   if args.seed_list else list(range(args.seeds)))
    for s in seed_values:
        seeds[str(s)] = run_seed(s, args.gens, args.pop, args.batch_size,
                                 args.tslimit, args.obstat_prob,
                                 resume_dir=args.resume_dir)
    finals = np.array([v["curve"][-1] for v in seeds.values()])
    firsts = np.array([v["curve"][0] for v in seeds.values()])
    out = {
        "config": vars(args),
        "workload": "Humanoid-v5, 256x256 tanh MujocoMLP, calc_obstat_prob active "
                    "(configurations/humanoid.json reduced-pop variant)",
        "seeds": seeds,
        "first_gen_mean": float(firsts.mean()),
        "final_gen_mean": float(finals.mean()),
        "improved_all_seeds": bool(all(v["curve"][-1] > v["curve"][0] for v in seeds.values())),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("first_gen_mean", "final_gen_mean",
                                          "improved_all_seeds")}))


if __name__ == "__main__":
    main()
