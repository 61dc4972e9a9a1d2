"""Hi-dimensional BC reduction pipeline: assemble → reduce → disassemble.

Reference: visual_inspector/process_bc.py:19-53 and dimen_red/{assemble.py,
reduce.py, disassemble.py}: concatenate parent+offspring BC rows across a
generation range, reduce to 2-D (pca | tsne (PCA-50 preface) | lda |
downsampling | two_end), and write reduced .dat files per generation with
the trailing option columns preserved.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from .load_data import _gen_dir


def assemble(
    start_iter: int,
    end_iter: int,
    path: str,
    *,
    bc_dim: int,
    ds_ratio: float = 1.0,
    rng: Optional[np.random.Generator] = None,
):
    """Stack [parent_bc; offspring_bcs] per generation (assemble.py:5-37).
    Returns (X, parent_options, child_options, num_os_per_gen, labels)."""
    rng = rng or np.random.default_rng(0)
    X, parent_options, child_options, labels = [], [], [], []
    num_os = 0
    for gen in range(start_iter, end_iter + 1):
        pdata = np.loadtxt(os.path.join(_gen_dir(path, gen), f"snapshot_parent_{gen:04d}.dat"))
        X.append(pdata[:bc_dim][None, :])
        parent_options.append(pdata[bc_dim:])
        labels.append(pdata[bc_dim : bc_dim + 1][None, :])

        odata = np.loadtxt(
            os.path.join(_gen_dir(path, gen), f"snapshot_offspring_{gen:04d}.dat"), ndmin=2
        )
        n = odata.shape[0]
        selected = np.arange(n)
        if n >= 10 and ds_ratio < 1.0:
            selected = rng.permutation(n)[: max(10, int(n * ds_ratio))]
        X.append(odata[selected, :bc_dim])
        child_options.append(odata[selected, bc_dim:])
        labels.append(odata[selected, bc_dim : bc_dim + 1])
        num_os = len(selected)
    return np.vstack(X), parent_options, child_options, num_os, np.vstack(labels)


def reduce_dim(X: np.ndarray, *, labels: np.ndarray, method: str = "pca") -> np.ndarray:
    """2-D projection (dimen_red/reduce.py:6-31)."""
    from sklearn import decomposition, discriminant_analysis, manifold

    if method == "downsampling":
        return X
    if method == "lda":
        X2 = X.copy()
        X2.flat[:: X.shape[1] + 1] += 0.01
        return discriminant_analysis.LinearDiscriminantAnalysis(n_components=2).fit_transform(
            X2, labels
        )
    if method == "tsne":
        X_pca = decomposition.PCA(n_components=min(50, X.shape[1])).fit_transform(X)
        return manifold.TSNE(n_components=2, perplexity=min(30, max(5, X.shape[0] // 4)), random_state=0).fit_transform(
            X_pca
        )
    if method == "pca":
        return decomposition.PCA(n_components=2).fit_transform(X)
    if method == "two_end":
        nrow, ncol = X.shape
        return np.hstack(
            (X[:, int(ncol / 2 - 1)].reshape(nrow, 1), X[:, -1].reshape(nrow, 1))
        )
    raise NotImplementedError(method)


def disassemble(
    X_r: np.ndarray,
    parent_options: List[np.ndarray],
    child_options: List[np.ndarray],
    method: str,
    *,
    start_iter: int,
    end_iter: int,
    path: str,
    chunk: int,
) -> str:
    """Write reduced per-generation .dat files under `<path>_<method>/`
    (dimen_red/disassemble.py:10-41): same row layout with 2-D BCs."""
    out_root = f"{path}_{method}"
    for g_idx, gen in enumerate(range(start_iter, end_iter + 1)):
        rows = X_r[g_idx * chunk : (g_idx + 1) * chunk]
        out_dir = os.path.join(out_root, "snapshots", f"snapshot_gen_{gen:04d}")
        os.makedirs(out_dir, exist_ok=True)
        parent_row = np.hstack([rows[0], parent_options[g_idx]])
        np.savetxt(
            os.path.join(out_dir, f"snapshot_parent_{gen:04d}.dat"),
            parent_row[None, :],
            fmt="%.10g",
            delimiter=" ",
        )
        off_rows = np.hstack([rows[1:], child_options[g_idx]])
        np.savetxt(
            os.path.join(out_dir, f"snapshot_offspring_{gen:04d}.dat"),
            off_rows,
            fmt="%.10g",
            delimiter=" ",
        )
    return out_root
