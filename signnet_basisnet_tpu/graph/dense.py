"""Dense block-diagonal batched graphs — the MXU fast path.

Molecular graphs are tiny (ZINC <= 38 nodes), so instead of flat COO +
segment reductions, a batch can be a stack of padded per-graph blocks:
adjacency [G, M, M] and features [G, M, D].  Neighbor aggregation becomes a
batched dense matmul (adj @ x) — pure MXU work with zero scatter/gather,
the layout XLA loves.  This is the TPU-native answer to DGL/PyG sparse
kernels for small-graph workloads; the flat GraphBatch remains the general
path for large graphs.

`adj[g, i, j] = 1` iff edge j -> i (receiver-major), so `adj @ x` sums
source features into receivers, matching `segment.aggregate_edges`.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class DenseGraphBatch:
    adj: jnp.ndarray                 # [G, M, M] float32 receiver-major
    node_mask: jnp.ndarray           # [G, M] float32
    n_node: jnp.ndarray              # [G] int32
    graph_mask: jnp.ndarray          # [G] float32
    node_feat: Optional[jnp.ndarray] = None    # [G, M] or [G, M, F]
    edge_feat: Optional[jnp.ndarray] = None    # [G, M, M] int codes
    y: Optional[jnp.ndarray] = None            # [G] or [G, T]
    eigvecs: Optional[jnp.ndarray] = None      # [G, M, K]
    eigvals: Optional[jnp.ndarray] = None      # [G, K]
    eig_mask: Optional[jnp.ndarray] = None     # [G, M, K]
    extras: Dict[str, jnp.ndarray] = struct.field(default_factory=dict)

    @property
    def num_graphs(self) -> int:
        return self.node_mask.shape[0]

    @property
    def max_nodes(self) -> int:
        return self.node_mask.shape[1]

    def nodes_per_graph(self) -> jnp.ndarray:
        """[G, M]: size of the owning graph at every node slot (>=1)."""
        counts = jnp.maximum(self.n_node, 1).astype(jnp.float32)
        return jnp.broadcast_to(counts[:, None], self.node_mask.shape)

    def snorm(self) -> jnp.ndarray:
        return (1.0 / jnp.sqrt(self.nodes_per_graph()))[..., None] \
            * self.node_mask[..., None]

    def in_degrees(self) -> jnp.ndarray:
        return self.adj.sum(axis=-1)                       # [G, M]


def dense_batch_np(graphs: List[dict], num_graphs: int, max_nodes: int,
                   k: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Pack numpy graph dicts into dense block arrays.

    Last graph slot is NOT reserved (no padding graph needed — padding
    rows/cols are simply masked), but callers may pass num_graphs >
    len(graphs) for bucketing; extra slots are all-masked.
    """
    if len(graphs) > num_graphs:
        raise ValueError("too many graphs")
    G, M = num_graphs, max_nodes
    adj = np.zeros((G, M, M), np.float32)
    node_mask = np.zeros((G, M), np.float32)
    n_node = np.zeros(G, np.int32)
    graph_mask = np.zeros(G, np.float32)
    out: Dict[str, np.ndarray] = {}

    has = {key: all(key in g for g in graphs) for key in
           ("node_feat", "edge_feat", "y", "eigvecs", "eigvals")}
    if has["node_feat"]:
        nf0 = np.asarray(graphs[0]["node_feat"])
        nf_shape = (G, M) if nf0.ndim == 1 else (G, M, nf0.shape[1])
        node_feat = np.zeros(nf_shape, nf0.dtype)
    if has["edge_feat"]:
        edge_feat = np.zeros((G, M, M),
                             np.asarray(graphs[0]["edge_feat"]).dtype)
    if has["y"]:
        y0 = np.asarray(graphs[0]["y"], np.float32).reshape(-1)
        y = np.zeros((G, y0.shape[0]), np.float32)
    if has["eigvecs"]:
        if k is None:
            k = max(np.asarray(g["eigvecs"]).shape[1] for g in graphs)
        eigvecs = np.zeros((G, M, k), np.float32)
        eigvals = np.zeros((G, k), np.float32)
        eig_mask = np.zeros((G, M, k), np.float32)

    for gi, g in enumerate(graphs):
        n = int(np.asarray(g["node_feat"]).shape[0]) if has["node_feat"] \
            else int(g["n_node"])
        if n > M:
            raise ValueError(f"graph with {n} nodes exceeds max_nodes={M}")
        s = np.asarray(g["senders"])
        r = np.asarray(g["receivers"])
        adj[gi, r, s] = 1.0                       # receiver-major
        node_mask[gi, :n] = 1.0
        n_node[gi] = n
        graph_mask[gi] = 1.0
        if has["node_feat"]:
            node_feat[gi, :n] = np.asarray(g["node_feat"])
        if has["edge_feat"]:
            edge_feat[gi, r, s] = np.asarray(g["edge_feat"])
        if has["y"]:
            y[gi] = np.asarray(g["y"], np.float32).reshape(-1)
        if has["eigvecs"]:
            v = np.asarray(g["eigvecs"], np.float32)
            kk = min(v.shape[1], k)
            eigvecs[gi, :n, :kk] = v[:n, :kk]
            eig_mask[gi, :n, :kk] = 1.0
            if has["eigvals"]:
                sv = np.asarray(g["eigvals"], np.float32)
                eigvals[gi, :min(len(sv), k)] = sv[:k]

    out.update(adj=adj, node_mask=node_mask, n_node=n_node,
               graph_mask=graph_mask)
    if has["node_feat"]:
        out["node_feat"] = node_feat
    if has["edge_feat"]:
        out["edge_feat"] = edge_feat
    if has["y"]:
        out["y"] = y
    if has["eigvecs"]:
        out.update(eigvecs=eigvecs, eigvals=eigvals, eig_mask=eig_mask)
    return out


def dense_from_arrays(arrays: Dict[str, np.ndarray]) -> DenseGraphBatch:
    known = {f.name for f in DenseGraphBatch.__dataclass_fields__.values()}
    main = {key: jnp.asarray(v) for key, v in arrays.items() if key in known}
    extras = {key: jnp.asarray(v) for key, v in arrays.items()
              if key not in known}
    return DenseGraphBatch(**main, extras=extras)


def dense_neighbor_sum(adj, x):
    """adj [G, M, M] @ x [G, M, ...] -> receiver sums, batched on the MXU."""
    if x.ndim == 3:
        return jnp.einsum("gmn,gnd->gmd", adj, x)
    if x.ndim == 4:   # extra channel axis (eigvec channels)
        return jnp.einsum("gmn,gnkd->gmkd", adj, x)
    raise ValueError(f"unsupported rank {x.ndim}")


def dense_pool(x, node_mask, reduce="sum"):
    """Per-graph pooling over the node axis with masking."""
    m = node_mask.reshape(node_mask.shape + (1,) * (x.ndim - node_mask.ndim))
    if reduce == "sum":
        return (x * m).sum(axis=1)
    if reduce == "mean":
        return (x * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
    if reduce == "max":
        big = jnp.where(m > 0, x, -jnp.inf)
        out = big.max(axis=1)
        return jnp.where(jnp.isfinite(out), out, 0.0)
    raise ValueError(reduce)
