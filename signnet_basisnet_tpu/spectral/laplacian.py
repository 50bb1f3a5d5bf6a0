"""Graph Laplacian builders.

Semantics match the reference's two construction paths:
- DGL path: ``L = I - D^{-1/2} (A + tau/n) D_tau^{-1/2}`` with degrees clipped
  at 1 (reference: GraphPrediction/data/molecules.py:148-161);
- PyG path: ``get_laplacian(edge_index, normalization)`` with None/'sym'
  normalization (reference: Alchemy/sign_net/transform.py:17-23).

Dense construction is deliberate: molecules are tiny (<= ~40 nodes), so dense
padded Laplacians feed a *batched* `eigh` on the MXU (spectral/eigh.py), and
the O(n^2) memory is irrelevant.  Host-side numpy versions exist for the
CPU preprocessing pipeline (large single graphs, e.g. the 10k-node 2D grid).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def adjacency_dense_np(senders, receivers, n, weights=None):
    A = np.zeros((n, n), dtype=np.float64)
    w = np.ones(len(senders)) if weights is None else np.asarray(weights)
    np.add.at(A, (np.asarray(senders), np.asarray(receivers)), w)
    return A


def sym_laplacian_np(A: np.ndarray, tau: float = 0.0, clip_degree: bool = True):
    """Symmetric-normalized Laplacian from a dense adjacency (numpy).

    With ``tau > 0`` this is the regularized Laplacian of the DGL path
    (reference: GraphPrediction/data/molecules.py:159-161).
    """
    n = A.shape[0]
    deg = A.sum(axis=1)
    if clip_degree:
        deg = np.clip(deg, 1.0, None)
    A_t = A + tau / max(n, 1)
    d_inv_sqrt = (deg + tau) ** -0.5
    return np.eye(n) - (d_inv_sqrt[:, None] * A_t) * d_inv_sqrt[None, :]


def unnormalized_laplacian_np(A: np.ndarray):
    """L = D - A (PyG get_laplacian with normalization=None, the Alchemy /
    GINESignNetPyG default — EVDTransform passes norm=None)."""
    return np.diag(A.sum(axis=1)) - A


def sym_laplacian_dense(A: jnp.ndarray, node_mask: jnp.ndarray | None = None,
                        clip_degree: bool = True) -> jnp.ndarray:
    """Device-side sym-normalized Laplacian of a padded dense adjacency.

    Padded rows/cols are zero in A; with ``node_mask`` given, the identity
    diagonal is masked so padding contributes strictly zero blocks (their
    eigenvalues are handled downstream by `spectral.eigh.masked_eigh`).
    """
    deg = A.sum(axis=-1)
    if clip_degree:
        deg = jnp.clip(deg, 1.0, None)
    d_inv_sqrt = deg ** -0.5
    L = -(d_inv_sqrt[..., :, None] * A) * d_inv_sqrt[..., None, :]
    eye = jnp.eye(A.shape[-1], dtype=A.dtype)
    if node_mask is not None:
        eye = eye * node_mask[..., None, :]
    return L + eye


def unnormalized_laplacian_dense(A: jnp.ndarray) -> jnp.ndarray:
    deg = A.sum(axis=-1)
    n = A.shape[-1]
    return deg[..., :, None] * jnp.eye(n, dtype=A.dtype) - A


def dense_adjacency_from_graph(senders, receivers, num_nodes, edge_mask=None):
    """Scatter a padded COO edge list into a dense [N, N] adjacency (device)."""
    w = jnp.ones(senders.shape[0], jnp.float32) if edge_mask is None else edge_mask
    A = jnp.zeros((num_nodes, num_nodes), jnp.float32)
    return A.at[senders, receivers].add(w)
