"""TwoDGrid spectral-filter dataset (the LearningFilters workload).

Loads the 100x100 grid graph from `2Dgrid.mat` (keys A/F/mask), computes and
caches the full eigendecomposition of the sym-normalized Laplacian, and
generates analytic filter-regression labels y = V f(Lambda) V^T x for
low/high/band/rejection/comb/low_band filters (reference:
LearningFilters/utils.py:12-129).
"""
from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from ..spectral import eigh_np, sym_laplacian_np

FILTERS = ("low", "high", "band", "rejection", "comb", "low_band")


def filter_response(filter_type: str, lam: np.ndarray) -> np.ndarray:
    """Analytic spectral filter responses (reference: utils.py:85-123)."""
    if filter_type == "low":
        return np.exp(-10.0 * lam ** 2)
    if filter_type == "high":
        return 1.0 - np.exp(-10.0 * lam ** 2)
    if filter_type == "band":
        return np.exp(-10.0 * (lam - 1.0) ** 2)
    if filter_type == "rejection":
        return 1.0 - np.exp(-10.0 * (lam - 1.0) ** 2)
    if filter_type == "comb":
        return np.abs(np.sin(lam * np.pi))
    if filter_type == "low_band":
        out = np.where(lam < 0.5, 1.0,
                       np.where(lam < 1.0, np.exp(-100.0 * (lam - 0.5) ** 2),
                                np.exp(-50.0 * (lam - 1.5) ** 2)))
        return out
    raise ValueError(f"unknown filter {filter_type!r}")


def load_twodgrid(mat_path: str = "data/2dgrid/2Dgrid.mat",
                  cache_dir: str | None = None) -> dict:
    """Returns dict with senders/receivers/x (node images), mask m,
    eigvals/eigvecs of the sym-normalized Laplacian (cached to .npy)."""
    import scipy.io as sio
    a = sio.loadmat(mat_path)
    A = np.asarray(a["A"], dtype=np.float64)
    F = np.asarray(a["F"], dtype=np.float32)      # n x num_images
    Mmask = np.asarray(a["mask"], dtype=np.float32)

    s, r = np.nonzero(A > 0)
    n = A.shape[0]

    cache_dir = cache_dir or os.path.dirname(mat_path)
    vals_p = os.path.join(cache_dir, "eigenvalues.npy")
    vecs_p = os.path.join(cache_dir, "eigenvectors.npy")
    if os.path.exists(vals_p) and os.path.exists(vecs_p):
        vals = np.load(vals_p)
        vecs = np.load(vecs_p)
    else:
        L = sym_laplacian_np(A)
        vals, vecs = eigh_np(L, fix_sign=False)
        try:
            np.save(vals_p, vals)
            np.save(vecs_p, vecs)
        except OSError:
            pass

    return dict(
        senders=s.astype(np.int32), receivers=r.astype(np.int32),
        x=F, mask=Mmask.reshape(-1), n=n,
        eigvals=vals.astype(np.float32), eigvecs=vecs.astype(np.float32),
    )


def filter_labels(data: dict, filter_type: str,
                  cache_dir: str | None = None) -> np.ndarray:
    """y = V diag(f(lambda)) V^T x for all images (reference: utils.py:124-129)."""
    if cache_dir:
        p = os.path.join(cache_dir, f"y_{filter_type}.npy")
        if os.path.exists(p):
            return np.load(p).astype(np.float32)
    V, lam = data["eigvecs"], data["eigvals"]
    resp = filter_response(filter_type, lam).astype(np.float32)
    y = V @ (resp[:, None] * (V.T @ data["x"]))
    if cache_dir:
        try:
            np.save(os.path.join(cache_dir, f"y_{filter_type}.npy"), y)
        except OSError:
            pass
    return y.astype(np.float32)
