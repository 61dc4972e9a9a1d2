"""Deceptive Hard-Maze: ES vs NS-ES head-to-head on one TPU chip.

The reference's scientific headline (README.md:13-19, nses.py): reward-driven
ES gets trapped in the maze's cul-de-sac (the fitness gradient points into
it), while novelty search (NS-ES) ignores reward and escapes. This script
reproduces that comparison with the framework's trainers and writes a
results artifact:

    results/maze_comparison.json
      { "es":   {"best_dist": ..., "parent_dist_curve": [...], ...},
        "nses": {"best_dist": ..., "parent_dist_curves": [[...]x M], ...} }

Distance-to-goal = −return (the maze reward is −distance at episode end,
tf_maze.cpp:77-93). The maze goal chamber is ~<5 units once entered; the
trap floor is ~39-40 units.

Run: PYTHONPATH="/root/repo:/root/.axon_site" python scripts/run_maze_comparison.py \
       [--es_gens 300] [--ns_iters 3000] [--out results/maze_comparison.json]
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deep_neuroevolution_tpu.algos.es import ESConfig, ESTrainer
from deep_neuroevolution_tpu.algos.nses import NSESConfig, NSESTrainer
from deep_neuroevolution_tpu.algos.rollout import rollout_batch
from deep_neuroevolution_tpu.envs import MazeEnv
from deep_neuroevolution_tpu.models import ContinuousMLP
from deep_neuroevolution_tpu.ops import Adam, NoiseTable
from deep_neuroevolution_tpu.utils import tabular


def make_eval(env, model):
    act = model.make_batch_act()

    @jax.jit
    def eval_theta(theta, key):
        res = rollout_batch(
            env, act, (theta[None], None), key[None],
            jnp.int32(env.default_timestep_cutoff),
        )
        return res.returns[0], res.bc[0]

    return eval_theta


def run_es(table, gens, eval_every, log):
    env = MazeEnv()
    model = ContinuousMLP(obs_dim=11, ac_dim=2)
    cfg = ESConfig(
        noise_stdev=0.05, population_size=512, num_eval_episodes=0,
        episode_cutoff_mode="env_default", return_proc_mode="centered_rank",
    )
    tr = ESTrainer(env, model, cfg, optimizer=Adam(stepsize=0.05),
                   noise_table=table, seed=0)
    ev = make_eval(env, model)
    curve, best = [], float("inf")
    t0 = time.time()
    for it in range(gens):
        stats = tr.train_step()
        best = min(best, -float(np.max(stats.returns)))
        if (it + 1) % eval_every == 0 or it == gens - 1:
            ret, bc = ev(tr.state.theta, jax.random.PRNGKey(it))
            dist = -float(ret)
            curve.append({"gen": it + 1, "parent_dist": dist,
                          "bc": np.asarray(bc).tolist()})
            log(f"ES gen {it + 1}: parent dist {dist:.2f} (best offspring ever {best:.2f})")
    return {
        "algo": "es", "generations": gens, "population": 512,
        "best_offspring_dist": best,
        "final_parent_dist": curve[-1]["parent_dist"],
        "parent_dist_curve": curve,
        "wall_s": round(time.time() - t0, 1),
    }


def run_nses(table, iters, eval_every, log, algo_type="ns",
             stepsize=0.01, sigma=0.05, selection="novelty_prob"):
    env = MazeEnv()
    model = ContinuousMLP(obs_dim=11, ac_dim=2)
    cfg = NSESConfig(
        noise_stdev=sigma, population_size=256, num_eval_episodes=0,
        episode_cutoff_mode="env_default",
        # default return_proc_mode="centered_sign_rank" ranks the NOVELTY
        # column (nses.py:221-222) — "centered_rank" would rank reward and
        # silently degrade NS-ES to plain ES
        algo_type=algo_type, k=10, meta_population_size=3, num_rollouts=1,
        selection_method=selection,
    )
    tr = NSESTrainer(env, model, cfg, optimizer=Adam(stepsize=stepsize),
                     noise_table=table, seed=0)
    ev = make_eval(env, model)
    curve, best = [], float("inf")
    t0 = time.time()
    for it in range(iters):
        stats = tr.train_step()
        best = min(best, -float(np.max(stats["returns"])))
        if (it + 1) % eval_every == 0 or it == iters - 1:
            dists = []
            for pi, parent in enumerate(tr.parents):
                ret, bc = ev(parent.theta, jax.random.PRNGKey(10_000 + it))
                dists.append(-float(ret))
            curve.append({"iter": it + 1, "parent_dists": dists,
                          "archive_size": int(tr.archive.count)})
            log(f"{algo_type.upper()}-ES iter {it + 1}: parent dists "
                f"{[f'{d:.1f}' for d in dists]} best offspring ever {best:.2f} "
                f"archive {int(tr.archive.count)}")
        if best < 5.0:  # goal chamber reached — deception escaped
            log(f"{algo_type.upper()}-ES reached the goal region at iter {it + 1}")
            break
    return {
        "algo": f"{algo_type}es", "iterations": it + 1, "population": 256,
        "meta_population": 3, "best_offspring_dist": best,
        "final_parent_dists": curve[-1]["parent_dists"] if curve else [],
        "parent_dist_curve": curve,
        "wall_s": round(time.time() - t0, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--es_gens", type=int, default=300)
    ap.add_argument("--ns_iters", type=int, default=3000)
    ap.add_argument("--eval_every", type=int, default=25)
    ap.add_argument("--out", default="results/maze_comparison.json")
    ap.add_argument("--ns_only", action="store_true", help="skip the ES phase")
    ap.add_argument("--ns_stepsize", type=float, default=0.01)
    ap.add_argument("--ns_sigma", type=float, default=0.05)
    ap.add_argument("--ns_selection", default="novelty_prob",
                    choices=["novelty_prob", "round_robin"])
    args = ap.parse_args()

    tabular.dump_tabular = lambda: tabular._logger._kvs.clear()  # quiet console

    def log(msg):
        print(msg, flush=True)

    table = NoiseTable.from_seed(count=5_000_000)
    out = {"meta": {
        "maze_trap_dist": "~39-40 (cul-de-sac floor)",
        "maze_goal_dist": "<5 (goal chamber)",
        "device": str(jax.devices()[0]),
    }}
    if not args.ns_only:
        out["es"] = run_es(table, args.es_gens, args.eval_every, log)
    out["nses"] = run_nses(
        table, args.ns_iters, args.eval_every, log,
        stepsize=args.ns_stepsize, sigma=args.ns_sigma, selection=args.ns_selection,
    )

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    es_best = out.get("es", {}).get("best_offspring_dist")
    log(f"ES best {es_best if es_best is not None else 'skipped'} vs "
        f"NS-ES best {out['nses']['best_offspring_dist']:.2f} → {args.out}")


if __name__ == "__main__":
    main()
