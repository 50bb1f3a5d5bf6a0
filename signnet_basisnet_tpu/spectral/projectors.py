"""Eigenspace projectors for BasisNet.

The reference rounds eigenvalues to 5 decimals, groups equal values into
eigenspaces, forms projectors P = V V^T per eigenspace, and buckets the
projectors by multiplicity so each bucket feeds one IGN encoder
(reference: LearningFilters/training.py:47-73).

TPU twist: multiplicities are data-dependent, so the bucket layout (which
multiplicities exist and how many eigenspaces fall in each) is computed once
on the host per dataset/graph; projectors are then *stacked* into fixed-shape
[num_spaces, n, n] arrays per multiplicity, which is exactly the static-shape
batched-IGN input the models consume.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import numpy as np


def round_eigvals(vals: np.ndarray, decimals: int = 5) -> np.ndarray:
    """round(x * 10^d) / 10^d — matches the reference's `around`
    (LearningFilters/training.py:47-49)."""
    scale = 10.0 ** decimals
    return np.round(vals * scale) / scale


@dataclass
class EigenspaceLayout:
    """Host-computed static layout of a spectrum's eigenspaces."""
    uniq_vals: np.ndarray          # [S] one representative eigenvalue per space
    counts: np.ndarray             # [S] multiplicity of each eigenspace
    sections: np.ndarray           # [S] cumulative end index of each space
    uniq_mults: List[int]          # sorted unique multiplicities
    spaces_per_mult: Dict[int, int]

    @property
    def num_spaces(self) -> int:
        return len(self.counts)


def eigenspace_layout(vals: np.ndarray, decimals: int = 5) -> EigenspaceLayout:
    rounded = round_eigvals(np.asarray(vals), decimals)
    uniq_vals, counts = np.unique(rounded, return_counts=True)
    sections = np.cumsum(counts)
    uniq_mults = sorted(set(int(c) for c in counts))
    spaces_per_mult = {m: int((counts == m).sum()) for m in uniq_mults}
    return EigenspaceLayout(uniq_vals, counts, sections, uniq_mults, spaces_per_mult)


def projectors_by_multiplicity(vecs: np.ndarray, layout: EigenspaceLayout
                               ) -> Dict[int, np.ndarray]:
    """Build {multiplicity: [num_spaces_with_that_mult, n, n]} projector stacks.

    P_s = V_s V_s^T where V_s holds the eigenvectors of eigenspace s
    (reference: LearningFilters/training.py:62-73).
    """
    n = vecs.shape[0]
    spaces = np.split(vecs, layout.sections[:-1], axis=1)
    buckets: Dict[int, List[np.ndarray]] = {m: [] for m in layout.uniq_mults}
    for s, Vs in enumerate(spaces):
        P = (Vs @ Vs.T).astype(np.float32)
        buckets[int(layout.counts[s])].append(P)
    return {m: np.stack(ps, axis=0) for m, ps in buckets.items() if ps}


def prop_higher_mult(layout: EigenspaceLayout, n: int) -> float:
    """Fraction of eigenvectors living in multiplicity>1 eigenspaces — the
    data sanity stat the reference prints (LearningFilters/training.py:60)."""
    c = layout.counts
    return float(c[c > 1].sum()) / float(n)
