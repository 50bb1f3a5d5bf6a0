"""Eigendecomposition pipeline: Laplacian PE, batched masked eigh.

Replaces the reference's per-graph LAPACK calls (`np.linalg.eig` in
GraphPrediction/data/molecules.py:164, `torch.linalg.eigh` in
Alchemy/sign_net/transform.py:22, `numpy.linalg.eigh` in
LearningFilters/utils.py:78) with:

- a host-side numpy path for dataset preprocessing (computed once and cached,
  unlike the Alchemy reference which recomputed the EVD on every dataset
  access), and
- a device-side *batched* `jnp.linalg.eigh` over padded dense Laplacians
  (vmapped), where padding is pushed to the top of the spectrum by placing
  a large constant on padded diagonal entries, so the k smallest eigenpairs
  of every graph are always the real ones.

Eigenvector sign is fixed deterministically (first nonzero entry positive) so
preprocessing is reproducible across backends; SignNet consumers are sign
invariant by construction anyway.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .laplacian import sym_laplacian_np, unnormalized_laplacian_np, adjacency_dense_np

# Padded diagonal entries get this eigenvalue, far above the sym-Laplacian
# spectrum bound of 2, so padding never contaminates the k smallest pairs.
PAD_EIGVAL = 256.0


def canonical_sign_np(V: np.ndarray) -> np.ndarray:
    """Flip each column so its first entry of max magnitude is positive."""
    idx = np.argmax(np.abs(V), axis=0)
    signs = np.sign(V[idx, np.arange(V.shape[1])])
    signs[signs == 0] = 1.0
    return V * signs[None, :]


def eigh_np(L: np.ndarray, fix_sign: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Full host-side eigh with ascending eigenvalues."""
    vals, vecs = np.linalg.eigh(L)
    if fix_sign:
        vecs = canonical_sign_np(vecs)
    return vals.astype(np.float32), vecs.astype(np.float32)


def lap_pe_np(senders, receivers, n, k, tau: float = 0.0,
              skip_first: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Laplacian-eigenvector PE for one graph, DGL-path semantics.

    Returns (eigvals[k], eigvecs[n, k]): the k eigenpairs after dropping the
    trivial first one (reference slices columns 1..k+1 of the sorted spectrum,
    GraphPrediction/data/molecules.py:164-177), zero-padded when the graph has
    fewer than k+1 nodes.
    """
    A = adjacency_dense_np(senders, receivers, n)
    L = sym_laplacian_np(A, tau=tau)
    vals, vecs = eigh_np(L)
    lo = 1 if skip_first else 0
    vals, vecs = vals[lo:lo + k], vecs[:, lo:lo + k]
    out_vals = np.zeros(k, np.float32)
    out_vecs = np.zeros((n, k), np.float32)
    out_vals[:len(vals)] = vals
    out_vecs[:, :vecs.shape[1]] = vecs
    return out_vals, out_vecs


def full_evd_np(senders, receivers, n, normalization: str | None = None):
    """All-n eigenpairs (PyG EVDTransform semantics; norm None or 'sym')."""
    A = adjacency_dense_np(senders, receivers, n)
    if normalization == "sym":
        L = sym_laplacian_np(A, clip_degree=False)
    else:
        L = unnormalized_laplacian_np(A)
    return eigh_np(L)


def rwpe_np(senders, receivers, n, k) -> np.ndarray:
    """Random-walk PE: diagonals of (A D^-1)^p for p = 1..k (reference:
    GraphPrediction/data/molecules.py:184-208)."""
    A = adjacency_dense_np(senders, receivers, n)
    d_inv = 1.0 / np.clip(A.sum(axis=1), 1.0, None)
    RW = A * d_inv[None, :]
    out = np.zeros((n, k), np.float32)
    M = RW.copy()
    for p in range(k):
        out[:, p] = np.diag(M)
        if p + 1 < k:
            M = M @ RW
    return out


# ---------------------------------------------------------------------------
# Device-side batched path
# ---------------------------------------------------------------------------

def masked_eigh(L: jnp.ndarray, node_mask: jnp.ndarray):
    """Batched eigh over padded dense Laplacians.

    ``L``: [..., n, n] with zero rows/cols (including zero diagonal) at padded
    slots; ``node_mask``: [..., n].  Padded diagonal entries are set to
    PAD_EIGVAL * (1 + slot index / n): distinct large values keep padding
    eigenvalues simple (non-degenerate) and strictly above the real spectrum.
    Returns ascending (vals[..., n], vecs[..., n, n]); the first ``n_g`` pairs
    of each graph are its true spectrum.
    """
    n = L.shape[-1]
    slot = jnp.arange(n, dtype=L.dtype)
    pad_diag = (1.0 - node_mask) * (PAD_EIGVAL * (1.0 + slot / n))
    Lp = L + jnp.zeros_like(L).at[..., jnp.arange(n), jnp.arange(n)].set(pad_diag)
    vals, vecs = jnp.linalg.eigh(Lp)
    # zero out padding eigenpairs: pair j of graph g is valid iff j < n_g
    n_real = node_mask.sum(axis=-1, keepdims=True)
    valid = (jnp.arange(n) < n_real).astype(L.dtype)
    vals = vals * valid
    vecs = vecs * valid[..., None, :] * node_mask[..., :, None]
    return vals, vecs, valid


def canonical_sign(V: jnp.ndarray) -> jnp.ndarray:
    """Device-side deterministic sign fix (argmax-magnitude entry positive)."""
    idx = jnp.argmax(jnp.abs(V), axis=-2)
    picked = jnp.take_along_axis(V, idx[..., None, :], axis=-2)[..., 0, :]
    signs = jnp.where(picked >= 0, 1.0, -1.0)
    return V * signs[..., None, :]


batched_masked_eigh = jax.jit(jax.vmap(masked_eigh))
