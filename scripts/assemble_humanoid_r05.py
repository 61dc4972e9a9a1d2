"""Assemble the r5 humanoid campaign artifacts (VERDICT r4 next-step #2).

* results/humanoid_curve_pop512_3seeds.json — the pop-512 stability claim on
  n=3: seed 0 (the r4 control, 212 gens) + fresh seeds 1 and 2 (this round,
  from their per-generation resume-dir JSONs), with a drift analysis per
  seed (peak vs final window) against the pop-128 drift signature.
* results/humanoid_curve_pop1000.json — the reference-design-point run
  (configurations/humanoid.json episodes_per_batch≈1000) in progress.

The parity bar (stated explicitly, as asked): Gymnasium Humanoid-v5's
"healthy" reward alone is 5/step; sustained walking at the reference's
quality is >= 6000 episode reward (1000 steps x (5 healthy + ~1+ forward)).
Intermediate markers: > 500 = standing/stepping beyond the ~125 random
plateau and still climbing; >= 1000 = locomotion onset (episode length
persistently > 200).
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _drift(curve, window=20):
    """peak(rolling mean) vs final rolling mean — the pop-128 signature was
    final << peak (e.g. 248→129 by gen 300)."""
    if len(curve) < 2 * window:
        return None
    roll = [sum(curve[i - window:i]) / window for i in range(window, len(curve) + 1)]
    peak = max(roll)
    final = roll[-1]
    return {"rolling_peak": peak, "rolling_final": final,
            "final_over_peak": final / peak if peak else None,
            "drifting": final < 0.8 * peak}


def main():
    seeds = {}
    # seed 0: the r4 control curve (212 generations, committed artifact)
    with open(os.path.join(REPO, "results/humanoid_curve_pop512_300.json")) as f:
        seeds["0"] = json.load(f)["seeds"]["0"]
    for s in ("1", "2"):
        p = os.path.join(REPO, f"results/humanoid_pop512_ckpt/seed{s}.json")
        if os.path.exists(p):
            with open(p) as f:
                seeds[s] = json.load(f)
    out = {
        "workload": "Humanoid-v5, 256x256 tanh MujocoMLP, calc_obstat_prob=0.01 "
                    "active, pop 512 (configurations/humanoid.json reduced-pop "
                    "variant; scripts/humanoid_curve.py)",
        "parity_bar": {
            "walking": ">=6000 mean episode reward (healthy 5/step x 1000 steps "
                       "+ forward progress) — the reference design point outcome",
            "locomotion_onset": ">=1000 reward with episode length persistently >200",
            "beyond_random_plateau": ">500 (random policy plateaus ~125, falls at ~27 steps)",
        },
        "seeds": {},
    }
    for s, v in seeds.items():
        curve = v["curve"]
        out["seeds"][s] = {
            "generations": len(curve),
            "curve": curve,
            "eval_curve": v.get("eval_curve"),
            "ep_len": v.get("ep_len"),
            "first": curve[0], "final": curve[-1], "max": max(curve),
            "best_eval": max((x for x in v.get("eval_curve", []) if x == x),
                             default=None),
            "drift": _drift(curve),
        }
    drifts = [out["seeds"][s]["drift"] for s in out["seeds"] if out["seeds"][s]["drift"]]
    out["no_drift_all_seeds"] = bool(drifts) and not any(d["drifting"] for d in drifts)
    with open(os.path.join(REPO, "results/humanoid_curve_pop512_3seeds.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({s: {k: out["seeds"][s][k] for k in ("generations", "first", "final", "max")}
                      for s in out["seeds"]}))
    print(json.dumps({"no_drift_all_seeds": out["no_drift_all_seeds"]}))

    p1000 = os.path.join(REPO, "results/humanoid_pop1000_ckpt/seed0.json")
    if os.path.exists(p1000):
        with open(p1000) as f:
            v = json.load(f)
        art = {
            "workload": "Humanoid-v5 at the reference design point population "
                        "(pop 1000; configurations/humanoid.json:1-36 uses "
                        "episodes_per_batch 1000) — in progress, per-gen "
                        "checkpointed (resume_dir)",
            "generations": len(v["curve"]),
            "curve": v["curve"], "eval_curve": v.get("eval_curve"),
            "ep_len": v.get("ep_len"),
            "first": v["curve"][0], "final": v["curve"][-1], "max": max(v["curve"]),
            "drift": _drift(v["curve"]),
        }
        with open(os.path.join(REPO, "results/humanoid_curve_pop1000.json"), "w") as f:
            json.dump(art, f, indent=1)
        print(json.dumps({"pop1000_gens": art["generations"], "final": art["final"],
                          "max": art["max"]}))


if __name__ == "__main__":
    main()
