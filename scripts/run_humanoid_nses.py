"""Deceptive-humanoid: ES vs NS-ES on the trap world (VERDICT r3 missing #4).

The reference's second headline (README.md:82-84, extra/humanoid_maze.xml):
forward progress — the reward gradient — walks the humanoid into a U-shaped
wall trap; reward-driven ES converges into it, novelty search (NS-ES over
the final mass-center (x, y) BC, policies.py:293-296) must detour around.

This host (2 CPU cores vs the reference's 1440-core fleet) cannot train a
humanoid to walk 4 m, so the script records the measurable signature of the
same phenomenon at reduced scale: the final-position BC clouds and the
NS-ES archive's coverage of (x, y) space vs ES's reward-driven cluster,
plus the per-arm max forward progress against the trap geometry. The
--trap_distance knob optionally moves the wall closer so the deception
bites within reach of this compute budget (divergence from the reference's
4 m geometry is recorded in the artifact).

Resumable per generation (like humanoid_curve.py):
    NEVO_PLATFORM=cpu python scripts/run_humanoid_nses.py \
        --gens 150 --resume_dir results/humanoid_nses_ckpt
Writes results/humanoid_nses.json.
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


def _mk_env(batch_size, trap_distance, seed_base):
    from deep_neuroevolution_tpu.envs import mujoco

    return mujoco.MujocoHostEnv(
        mujoco.resolve_env_id("Humanoid-v5"),
        xml_file=mujoco.deceptive_humanoid_xml(distance=trap_distance),
        batch_size=batch_size, bc_mode="final_pos",
    )


def _mk_model(env):
    from deep_neuroevolution_tpu.models import MujocoMLP

    sp = env.action_space
    # humanoid_nses.json policy args (256x256 tanh, ac_noise_std 0.01)
    return MujocoMLP(
        obs_dim=env.obs_shape[0], ac_dim=sp.dim,
        ac_low=tuple(sp.low), ac_high=tuple(sp.high),
        hidden_dims=(256, 256), nonlin_type="tanh", ac_noise_std=0.01,
    )


def run_arm(arm: str, gens: int, pop: int, batch_size: int, trap_distance: float,
            seed: int, resume_dir: str = None):
    from deep_neuroevolution_tpu.algos.es import ESConfig, ESTrainer
    from deep_neuroevolution_tpu.algos.nses import NSESConfig, NSESTrainer
    from deep_neuroevolution_tpu.ops import Adam, NoiseTable
    from deep_neuroevolution_tpu.utils import checkpoint, tabular

    tabular.dump_tabular = lambda: tabular._logger._kvs.clear()
    env = _mk_env(batch_size, trap_distance, seed)
    model = _mk_model(env)
    noise = NoiseTable.from_seed(count=5_000_000)
    if arm == "es":
        cfg = ESConfig(noise_stdev=0.02, l2coeff=0.005, population_size=pop,
                       num_eval_episodes=4, calc_obstat_prob=0.01,
                       episode_cutoff_mode=1000)
        tr = ESTrainer(env, model, cfg, optimizer=Adam(stepsize=0.01),
                       noise_table=noise, seed=seed)
    else:
        # humanoid_nses.json novelty_search block (k 10, M 3, novelty_prob)
        cfg = NSESConfig(noise_stdev=0.02, l2coeff=0.005, population_size=pop,
                         calc_obstat_prob=0.01, episode_cutoff_mode=1000,
                         algo_type="ns", k=10, meta_population_size=3,
                         num_rollouts=1, selection_method="novelty_prob",
                         bc_mode="final", return_proc_mode="centered_sign_rank")
        tr = NSESTrainer(env, model, cfg, optimizer=Adam(stepsize=0.01),
                         noise_table=noise, seed=seed)

    hist = {"mean_ret": [], "mean_len": [], "bc_x": [], "bc_y": []}
    ckpt = jpath = None
    if resume_dir:
        os.makedirs(resume_dir, exist_ok=True)
        ckpt = os.path.join(resume_dir, f"{arm}.ckpt")
        jpath = os.path.join(resume_dir, f"{arm}.json")
        if os.path.exists(ckpt) and os.path.exists(jpath):
            checkpoint.load_trainer(ckpt, tr)
            with open(jpath) as f:
                hist = json.load(f)
            print(f"{arm}: resumed at gen {len(hist['mean_ret'])}",
                  file=sys.stderr, flush=True)
    t0 = time.time()
    for g in range(len(hist["mean_ret"]), gens):
        out = tr.train_step()
        if arm == "es":
            rets = np.asarray(out.returns)
            lens = np.asarray(out.lengths)
            # per-gen perturbed-rollout BC cloud (final mass-center x, y)
            flat = np.asarray(tr._last_bcs).reshape(-1, 2)
        else:
            rets = np.asarray(out["returns"])
            lens = np.asarray(out["lengths"])
            # the archive point inserted this generation (updated parent's
            # mean BC) — a 1-point cloud; the full archive is summarized at
            # the end
            flat = np.asarray(out["new_bc"]).reshape(-1, 2)
        hist["mean_ret"].append(float(rets.mean()))
        hist["mean_len"].append(float(lens.mean()))
        hist["bc_x"].append([float(flat[:, 0].min()), float(flat[:, 0].mean()),
                             float(flat[:, 0].max())])
        hist["bc_y"].append([float(np.abs(flat[:, 1]).max())])
        print(f"{arm} gen {g}: ret {hist['mean_ret'][-1]:.1f} "
              f"len {hist['mean_len'][-1]:.0f} "
              f"x_max {hist['bc_x'][-1][2] if hist['bc_x'] else float('nan'):.2f} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
        if resume_dir:
            checkpoint.save_trainer(ckpt, tr)
            with open(jpath + ".tmp", "w") as f:
                json.dump(hist, f)
            os.replace(jpath + ".tmp", jpath)

    # final characterization: archive cloud (NS-ES) / final positions
    summary = {"history": hist, "trap_distance": trap_distance}
    if arm == "nses":
        n = int(tr.archive.count)
        pts = np.asarray(tr.archive.points)[:n]
        summary["archive_points"] = pts.tolist()
        summary["archive_x_max"] = float(pts[:, 0].max())
        summary["archive_abs_y_max"] = float(np.abs(pts[:, 1]).max())
        summary["archive_spread"] = float(pts.std(axis=0).mean())
    env.close()
    return summary


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gens", type=int, default=150)
    p.add_argument("--pop", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--trap_distance", type=float, default=4.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--arms", default="es,nses")
    p.add_argument("--resume_dir", default="results/humanoid_nses_ckpt")
    p.add_argument("--out", default="results/humanoid_nses.json")
    args = p.parse_args()

    out = {"config": vars(args),
           "workload": "HumanoidTrap-v5 (generated trap world, "
                       "envs/mujoco.py deceptive_humanoid_xml), 256x256 tanh "
                       "MujocoMLP, humanoid_nses.json semantics at reduced pop"}
    for arm in args.arms.split(","):
        out[arm] = run_arm(arm, args.gens, args.pop, args.batch_size,
                           args.trap_distance, args.seed,
                           resume_dir=args.resume_dir)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    keys = {a: {"final_ret": out[a]["history"]["mean_ret"][-1]}
            for a in args.arms.split(",") if a in out}
    print(json.dumps(keys))


if __name__ == "__main__":
    main()
