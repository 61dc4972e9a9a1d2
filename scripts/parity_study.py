"""Statistical-parity study: do the engine's sampling divergences from the
reference shift learning? (VERDICT r1 weak #5 / next-step #10)

Two divergences are examined on the Hard Maze with the obs-normalizing
MujocoMLP policy (the reference's MujocoPolicy stack, policies.py:122-206):

1. **Eval scheduling** — the reference evaluates the unperturbed θ with prob
   `eval_prob` per worker rollout (es.py:388-405); this engine schedules a
   fixed eval batch. Claim: evals are pure diagnostics here — θ trajectories
   are BIT-IDENTICAL for any eval count (also asserted in
   tests/test_es.py::TestSamplingFidelity).

2. **Obs-stat sampling** — the reference accumulates a rollout's observations
   into the RunningStat with prob `calc_obstat_prob` (es.py:356-363); the
   engine's default accumulates every rollout (prob 1). Both semantics are
   implemented (ESConfig.calc_obstat_prob); this study runs N seeds × G
   generations under p=1.0 and p=0.01 (frostbite_es.json's value) and
   compares the eval-return learning curves.

Output: results/parity_obstat.json — per-seed curves, final-performance
mean±std per arm, Welch t statistic, and the eval bit-identity check.

Run: python scripts/parity_study.py [--seeds 5] [--gens 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# NEVO_PLATFORM=cpu runs the study host-only (the pendulum arm is small and
# must not claim the chip while benches run); same escape hatch as main.py
if os.environ.get("NEVO_PLATFORM"):
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    import jax

    jax.config.update("jax_platforms", os.environ["NEVO_PLATFORM"])

import numpy as np  # noqa: E402


def run_arm(obstat_prob: float, seed: int, gens: int, domain: str = "maze"):
    """One seed × one calc_obstat_prob arm. Domains:
    * 'maze'     — device Hard Maze, 400-step episodes (the r2 study);
    * 'pendulum' — MuJoCo InvertedPendulum host engine, the long-episode
      regime where obs-stat sampling actually bites (the reference's
      calc_obstat_prob=0.01 was tuned for 100k-step Humanoid rollouts,
      humanoid.json / es.py:356-363; VERDICT r2 next-step #8)."""
    import jax

    from deep_neuroevolution_tpu.algos.es import ESConfig, ESTrainer
    from deep_neuroevolution_tpu.models import MujocoMLP
    from deep_neuroevolution_tpu.ops import Adam, NoiseTable
    from deep_neuroevolution_tpu.utils import tabular

    tabular.dump_tabular = lambda: tabular._logger._kvs.clear()
    if domain == "maze":
        from deep_neuroevolution_tpu.envs import MazeEnv

        env = MazeEnv()
        model = MujocoMLP(obs_dim=11, ac_dim=2, ac_low=(-1.0, -1.0), ac_high=(1.0, 1.0),
                          hidden_dims=(32, 32))
        pop, lr, sigma = 256, 0.05, 0.05
    else:
        from deep_neuroevolution_tpu.envs.mujoco import MujocoHostEnv

        env = MujocoHostEnv("InvertedPendulum-v5", batch_size=32)
        sp = env.action_space
        model = MujocoMLP(obs_dim=env.obs_shape[0], ac_dim=sp.dim,
                          ac_low=tuple(sp.low), ac_high=tuple(sp.high),
                          hidden_dims=(16, 16))
        pop, lr, sigma = 64, 0.03, 0.05
    cfg = ESConfig(
        noise_stdev=sigma, l2coeff=0.005, population_size=pop,
        num_eval_episodes=8, calc_obstat_prob=obstat_prob,
    )
    tr = ESTrainer(env, model, cfg, optimizer=Adam(stepsize=lr),
                   noise_table=NoiseTable.from_seed(count=2_000_000), seed=seed)
    curve = []
    for _ in range(gens):
        st = tr.train_step()
        curve.append(float(st.eval_returns.mean()))
    obcount = float(np.asarray(tr.state.ob_stat.count))
    if hasattr(env, "close"):
        env.close()
    return curve, obcount


def eval_bit_identity(seed: int = 3, gens: int = 3):
    """θ after G generations is identical for eval counts 0 and 8."""
    from deep_neuroevolution_tpu.algos.es import ESConfig, ESTrainer
    from deep_neuroevolution_tpu.envs import CartPoleEnv
    from deep_neuroevolution_tpu.models import LinearClassifier
    from deep_neuroevolution_tpu.ops import Adam, NoiseTable
    from deep_neuroevolution_tpu.utils import tabular

    tabular.dump_tabular = lambda: tabular._logger._kvs.clear()
    table = NoiseTable.from_seed(count=200_000)
    thetas = {}
    for ne in (0, 8):
        tr = ESTrainer(
            CartPoleEnv(), LinearClassifier(obs_dim=4, num_actions=2),
            ESConfig(noise_stdev=0.2, population_size=32, num_eval_episodes=ne),
            optimizer=Adam(stepsize=0.1), noise_table=table, seed=seed,
        )
        for _ in range(gens):
            tr.train_step()
        thetas[ne] = np.asarray(tr.state.theta)
    return bool(np.array_equal(thetas[0], thetas[8]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--gens", type=int, default=30)
    p.add_argument("--domain", choices=["maze", "pendulum"], default="maze")
    p.add_argument("--out", default="results/parity_obstat.json")
    args = p.parse_args()

    arms = {}
    for prob, name in ((1.0, "all_rollouts_p1.0"), (0.01, "reference_p0.01")):
        curves, obcounts = [], []
        for s in range(args.seeds):
            c, oc = run_arm(prob, seed=s, gens=args.gens, domain=args.domain)
            curves.append(c)
            obcounts.append(oc)
            print(f"{name} seed {s}: final={c[-1]:.1f} obcount={oc:.0f}",
                  file=sys.stderr)
        finals = np.array([c[-1] for c in curves])
        arms[name] = {
            "curves": curves,
            "ob_counts": obcounts,
            "final_mean": float(finals.mean()),
            "final_std": float(finals.std(ddof=1)),
        }

    a = np.array([c[-1] for c in arms["all_rollouts_p1.0"]["curves"]])
    b = np.array([c[-1] for c in arms["reference_p0.01"]["curves"]])
    # Welch t statistic for the final-performance difference
    se = np.sqrt(a.var(ddof=1) / a.size + b.var(ddof=1) / b.size)
    t = float((a.mean() - b.mean()) / max(se, 1e-9))
    seed_spread = float(max(a.std(ddof=1), b.std(ddof=1)))
    verdict = {
        "final_diff": float(a.mean() - b.mean()),
        "welch_t": t,
        "within_seed_variance": bool(abs(a.mean() - b.mean()) <= 2.0 * seed_spread),
        "eval_count_bit_identical_theta": eval_bit_identity(),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"config": vars(args), "arms": arms, "verdict": verdict}, f, indent=1)
    print(json.dumps(verdict))


if __name__ == "__main__":
    main()
