"""VINE snapshot dumps — per-generation BC cloud files for the visual
inspector.

Reference: es_distributed/es_modified.py:140-199 (and ga_modified.py:22-64)
— the VINE-instrumented algorithm variants write, per generation, under
`snapshots/snapshot_gen_XXXX/`:
* `snapshot_offspring_XXXX.dat` — one space-separated row per rollout:
  [bc_vec (bc_dim floats, the final BC), fitness, length, noise_idx,
  policy_seed, sign]  (es_modified.py:179-199)
* `snapshot_parent_XXXX.dat` — one row for the eval rollout closest to the
  mean eval return: [bc_vec, fitness, length, seed, noise_stdev]
  (es_modified.py:156-177)
* `snapshot_parent_XXXX.h5` — the parent policy (here a policy-snapshot
  pickle with the same stem) and the pickled ref batch
  (es_modified.py:149-153)

The visual_inspector loads these via np.loadtxt / pd.read_csv(sep=' ')
(visual_inspector/figure_base/load_data.py:53-99); our files are
byte-format-compatible so either inspector can read them.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np


def _gen_dir(base: str, iteration: int) -> str:
    path = os.path.join(base, "snapshots", f"snapshot_gen_{int(iteration):04d}")
    os.makedirs(path, exist_ok=True)
    return path


def master_extract_cloud(
    base_dir: str,
    iteration: int,
    bcs_n2: np.ndarray,  # [n, 2, bc_dim] pos/neg final BCs
    returns_n2: np.ndarray,  # [n, 2]
    lengths_n2: np.ndarray,  # [n, 2]
    noise_idxs: np.ndarray,  # [n]
    policy_seeds: np.ndarray,  # [n]
) -> str:
    """Offspring cloud rows, antithetic pairs flattened with sign ±1
    (es_modified.py:179-199 row layout)."""
    path = _gen_dir(base_dir, iteration)
    fname = os.path.join(path, f"snapshot_offspring_{int(iteration):04d}.dat")
    n, _, bc_dim = bcs_n2.shape
    rows = []
    for i in range(n):
        for col, sign in ((0, 1.0), (1, -1.0)):
            rows.append(
                np.hstack(
                    [
                        bcs_n2[i, col].astype(np.float64),
                        returns_n2[i, col],
                        lengths_n2[i, col],
                        noise_idxs[i],
                        policy_seeds[i],
                        sign,
                    ]
                )
            )
    np.savetxt(fname, np.asarray(rows), fmt="%.10g", delimiter=" ")
    return fname


def master_extract_parent(
    base_dir: str,
    iteration: int,
    eval_bcs: np.ndarray,  # [e, bc_dim]
    eval_rets: np.ndarray,  # [e]
    eval_lens: np.ndarray,  # [e]
    noise_stdev: float,
    model=None,
    theta=None,
    ref_batch=None,
    seed: int = 0,
) -> Optional[str]:
    """Parent point = the eval rollout closest to the mean eval return
    (es_modified.py:163-167), plus the parent policy snapshot + ref batch."""
    path = _gen_dir(base_dir, iteration)
    if model is not None and theta is not None:
        from .checkpoint import save_policy_snapshot

        save_policy_snapshot(
            os.path.join(path, f"snapshot_parent_{int(iteration):04d}.h5"),
            model,
            theta,
            ref_batch=ref_batch,
        )
    if ref_batch is not None:
        with open(os.path.join(path, f"snapshot_parent_{int(iteration):04d}_rb.p"), "wb") as f:
            pickle.dump(np.asarray(ref_batch), f)
    if eval_rets.size == 0:
        return None
    target = int(np.mean(eval_rets))
    idx = int(np.abs(eval_rets - target).argmin())
    row = np.hstack(
        [
            eval_bcs[idx].astype(np.float64),
            eval_rets[idx],
            eval_lens[idx],
            seed,
            noise_stdev,
        ]
    )
    fname = os.path.join(path, f"snapshot_parent_{int(iteration):04d}.dat")
    np.savetxt(fname, row[None, :], fmt="%.10g", delimiter=" ")
    return fname
