"""Assemble the toy-Atari learning-campaign artifacts (VERDICT r4 #1).

Reads the per-generation metrics.jsonl written by `main.py train` for the
ES (VBN small-DQN, CPU-schema config with eval_prob + adaptive cutoff
active) and GA (LargeDQN + validation/test ladder) campaigns on the native
ToyCatch backend, and writes one curve artifact per campaign with a
clear-above-chance verdict.

Chance level: ToyCatch random play catches a drop with p ≈ paddle_width/
reachable_span; measured random-policy EpRewMean ≈ 0.4-0.5 (the first
generations of the campaigns themselves).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(log_dir):
    """Rows of metrics.jsonl, from the LAST Iteration==1 row onward: a
    crashed launch appends its partial generations to the same file, and a
    restart (not --resume) begins again at Iteration 1."""
    path = os.path.join(REPO, log_dir, "metrics.jsonl")
    rows = [json.loads(ln) for ln in open(path)]
    starts = [i for i, r in enumerate(rows) if r.get("Iteration") == 1]
    rows = rows[starts[-1]:] if starts else rows
    # a resumed run restarts from the last snapshot and re-logs the
    # generations after it; keep the LAST row per Iteration, in order
    by_it = {}
    for r in rows:
        by_it[r.get("Iteration")] = r
    return [by_it[k] for k in sorted(by_it)]


def cutoff_bumps(log_dir):
    """Adaptive-cutoff DSL activity from log.txt ('Increased timestep limit
    from X to Y' lines, es.py:113-116) — evidence the curriculum fired even
    in runs whose metrics predate the TimestepLimitPerEpisode row."""
    path = os.path.join(REPO, log_dir, "log.txt")
    bumps = []
    if os.path.exists(path):
        for ln in open(path):
            if "Increased timestep limit" in ln:
                bumps.append(ln.split("]")[-1].strip())
    return bumps


def significance(first5, last5, stds, n_eps):
    """(last5 - first5) in units of the SEM of a 5-generation window mean:
    per-gen SEM = EpRewStd/sqrt(episodes), window SEM = per-gen/sqrt(5).
    >5 sigma = unambiguous improvement regardless of the 3x heuristic."""
    import math
    s = sum(stds) / max(len(stds), 1)
    sem = s / math.sqrt(max(n_eps, 1)) / math.sqrt(5)
    return (last5 - first5) / max(sem, 1e-9)


def assemble_es(out="results/toy_es_curve_r05.json"):
    rows = load("results/toy_es_campaign")
    curve = [r.get("EpRewMean") for r in rows]
    ev = [r.get("EvalEpRewMean") for r in rows]
    base = sum(curve[:5]) / max(len(curve[:5]), 1)
    last5 = sum(curve[-5:]) / max(len(curve[-5:]), 1)
    sig = significance(base, last5, [r.get("EpRewStd", 0.0) for r in rows],
                       rows[0].get("EpisodesThisIter", 256))
    art = {
        "workload": "ES on native ToyCatch engine through main.py train "
                    "(configurations/es_toy_learn.json): ModelVirtualBN "
                    "small DQN, pop 256, eval_prob->8 evals/gen, adaptive "
                    "cutoff DSL active, on-chip",
        "generations": len(rows),
        "train_reward": curve,
        "eval_reward": ev,
        "ep_len": [r.get("EpLenMean") for r in rows],
        "eval_pop_rank": [r.get("EvalPopRank") for r in rows],
        "tslimit": [r.get("TimestepLimitPerEpisode") for r in rows],
        "cutoff_bumps": cutoff_bumps("results/toy_es_campaign"),
        "s_per_gen": [r.get("TimeElapsedThisIter") for r in rows],
        "random_baseline_first5": base,
        "final_mean_last5": last5,
        "best_eval": max((x for x in ev if x == x), default=float("nan")),
        "improvement_sigma": sig,  # window-mean difference / its SEM
        "clearly_above_chance": last5 > 3 * max(base, 0.2) or sig > 5.0,
    }
    with open(os.path.join(REPO, out), "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({k: art[k] for k in (
        "generations", "random_baseline_first5", "final_mean_last5",
        "best_eval", "improvement_sigma", "clearly_above_chance")}))


def assemble_ga(out="results/toy_ga_curve_r05.json"):
    rows = load("results/toy_ga_campaign")
    pop_mean = [r.get("PopulationEpRewMean") for r in rows]
    pop_max = [r.get("PopulationEpRewMax") for r in rows]
    trunc = [r.get("TruncatedPopulationRewMean") for r in rows]
    test = [r.get("TruncatedPopulationEliteTestRewMean") for r in rows]
    base = sum(pop_mean[:5]) / max(len(pop_mean[:5]), 1)
    last5 = sum(pop_mean[-5:]) / max(len(pop_mean[-5:]), 1)
    # GA logs no per-gen reward std; use the truncated-parent climb as the
    # secondary signal and the pooled-pop binomial-ish spread sqrt(mean) as a
    # conservative per-episode std for the significance measure
    sig = significance(base, last5, [max(m, 0.25) ** 0.5 for m in pop_mean],
                       rows[0].get("PopulationEpCount", 256))
    art = {
        "workload": "GA on native ToyCatch engine through main.py train "
                    "(configurations/ga_toy_learn.json): LargeDQN (fused "
                    "whole-net kernel route on TPU), pop 256, truncation 20, "
                    "validation ladder 10x4 + elite test 8, adaptive cutoff, "
                    "on-chip",
        "generations": len(rows),
        "pop_reward_mean": pop_mean,
        "pop_reward_max": pop_max,
        "truncated_parent_mean": trunc,
        "elite_test_reward": test,
        "tslimit": [r.get("TimestepLimitPerEpisode") for r in rows],
        "cutoff_bumps": cutoff_bumps("results/toy_ga_campaign"),
        "s_per_gen": [r.get("TimeElapsedThisIter") for r in rows],
        "random_baseline_first5": base,
        "final_mean_last5": last5,
        "improvement_sigma": sig,
        "clearly_above_chance": last5 > 3 * max(base, 0.2) or sig > 5.0,
    }
    with open(os.path.join(REPO, out), "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({k: art[k] for k in (
        "generations", "random_baseline_first5", "final_mean_last5",
        "improvement_sigma", "clearly_above_chance")}))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("es", "both"):
        assemble_es()
    if which in ("ga", "both"):
        assemble_ga()
