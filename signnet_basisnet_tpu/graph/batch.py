"""Fixed-shape padded batched graphs — the core data structure.

A `GraphBatch` is a block-diagonal batch of graphs laid out in flat padded
arrays so that every jitted computation sees static shapes (XLA requirement).
The layout follows the masked-padding idea of the reference's dense-EVD
batching (reference: Alchemy/sign_net/transform.py:26-61) and DGL's
`dgl.batch` block-diagonal batching (reference:
GraphPrediction/data/molecules.py:302-311), unified into one native format:

- nodes of all graphs are concatenated, then padded to ``num_nodes`` slots;
- edges are concatenated, **sorted by destination node**, then padded to
  ``num_edges`` slots.  Sorted destinations make segment reductions
  sorted-segment reductions, which XLA lowers efficiently and which our
  Pallas aggregation kernels rely on;
- the **last graph slot is a dedicated padding graph**: all padding nodes and
  padding edges belong to it, so pooling real graphs never mixes in padding;
- eigendata (Laplacian eigenvalues/eigenvectors) rides along in the masked
  padded layout: ``eigvecs[num_nodes, k]``, ``eigvals[num_graphs, k]``,
  ``eig_mask[num_nodes, k]``.

All index arrays are int32, all masks float32 (so they multiply straight into
bf16/f32 compute without bool->float casts inside the hot path).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class GraphBatch:
    """A padded block-diagonal batch of graphs (a JAX pytree).

    Shape vocabulary: N = padded node count, E = padded edge count,
    G = padded graph count (last slot = padding graph), K = padded
    eigen-dimension.
    """

    # --- structure -------------------------------------------------------
    senders: jnp.ndarray        # [E] int32, source node of each edge
    receivers: jnp.ndarray      # [E] int32, destination node of each edge
    graph_id: jnp.ndarray       # [N] int32, graph each node belongs to
    edge_graph_id: jnp.ndarray  # [E] int32, graph each edge belongs to
    n_node: jnp.ndarray         # [G] int32, real node count per graph
    n_edge: jnp.ndarray         # [G] int32, real edge count per graph
    node_mask: jnp.ndarray      # [N] float32, 1.0 for real nodes
    edge_mask: jnp.ndarray      # [E] float32, 1.0 for real edges
    graph_mask: jnp.ndarray     # [G] float32, 1.0 for real graphs

    # --- features --------------------------------------------------------
    node_feat: Optional[jnp.ndarray] = None   # [N] or [N, F] (int codes or floats)
    edge_feat: Optional[jnp.ndarray] = None   # [E] or [E, F]
    y: Optional[jnp.ndarray] = None           # [G] or [G, T] targets

    # --- spectral data (optional) ---------------------------------------
    eigvecs: Optional[jnp.ndarray] = None     # [N, K] per-node eigvec entries
    eigvals: Optional[jnp.ndarray] = None     # [G, K] per-graph eigenvalues
    eig_mask: Optional[jnp.ndarray] = None    # [N, K] float32 valid-eig mask

    # --- free-form extras (degrees, RWPE, edge 'real' flags, ...) -------
    extras: Dict[str, jnp.ndarray] = struct.field(default_factory=dict)

    # ---------------------------------------------------------------------
    @property
    def num_nodes(self) -> int:
        return self.node_mask.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_mask.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.graph_mask.shape[0]

    def nodes_per_graph(self) -> jnp.ndarray:
        """[N] float32: size of the graph owning each node (>=1)."""
        counts = jnp.maximum(self.n_node, 1).astype(jnp.float32)
        return counts[self.graph_id]

    def snorm(self) -> jnp.ndarray:
        """Graph-size normalisation 1/sqrt(|V_g|) per node, [N, 1].

        Mirrors the reference's ``snorm_n`` collate vector (reference:
        GraphPrediction/data/molecules.py:302-311).
        """
        return (1.0 / jnp.sqrt(self.nodes_per_graph()))[:, None] * self.node_mask[:, None]

    def in_degrees(self) -> jnp.ndarray:
        """[N] float32 in-degree of each node (over real edges)."""
        return jax.ops.segment_sum(
            self.edge_mask, self.receivers, num_segments=self.num_nodes
        )

    def replace_nodes(self, node_feat: jnp.ndarray) -> "GraphBatch":
        return self.replace(node_feat=node_feat)


def tile_first_fit(graphs, tile: int, num_nodes: int) -> np.ndarray:
    """First-fit node offsets placing each graph fully inside one `tile`-sized
    node tile (no graph straddles a tile boundary) — the layout contract of
    the tile-local Pallas aggregation kernels (ops/pallas_spmm.py).

    Returns per-graph node offsets; raises if the graphs don't fit.
    """
    if num_nodes % tile != 0:
        raise ValueError(f"num_nodes {num_nodes} not a multiple of tile {tile}")
    n_tiles = num_nodes // tile
    free = np.full(n_tiles, tile, dtype=np.int64)
    offsets = np.zeros(len(graphs), dtype=np.int64)
    for gi, g in enumerate(graphs):
        n = len_nodes(g)
        if n > tile:
            raise ValueError(f"graph with {n} nodes exceeds tile {tile}")
        t = int(np.argmax(free >= n))
        if free[t] < n:
            raise ValueError("graphs do not fit the tiled node budget")
        offsets[gi] = t * tile + (tile - free[t])
        free[t] -= n
    return offsets


def batch_np(
    graphs,
    num_nodes: int,
    num_edges: int,
    num_graphs: int,
    k: Optional[int] = None,
    sort_edges: bool = True,
    tile: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Pack a list of numpy graph dicts into padded flat arrays (host side).

    Each graph dict has: ``senders``, ``receivers`` (int arrays, [e]),
    optionally ``node_feat`` [n,...], ``edge_feat`` [e,...], ``y`` [...],
    ``eigvecs`` [n, k_g], ``eigvals`` [k_g].

    The final graph slot (index ``num_graphs - 1``) is the padding graph that
    absorbs all padding nodes/edges; callers must therefore pass
    ``num_graphs >= len(graphs) + 1``.

    With ``tile`` set, graphs are placed first-fit into `tile`-sized node
    tiles (padding interleaved, no graph straddles a boundary) and the output
    gains ``node_offset`` [G] plus ``tile_starts``/``tile_ends`` per-tile
    edge ranges for the tile-local Pallas kernels.
    """
    n_real_graphs = len(graphs)
    if n_real_graphs + 1 > num_graphs:
        raise ValueError(f"need num_graphs >= {n_real_graphs + 1}, got {num_graphs}")
    tot_n = int(sum(len_nodes(g) for g in graphs))
    tot_e = int(sum(len(g["senders"]) for g in graphs))
    if tot_n > num_nodes or tot_e > num_edges:
        raise ValueError(
            f"batch does not fit: {tot_n} nodes > {num_nodes} or {tot_e} edges > {num_edges}"
        )
    offsets = (tile_first_fit(graphs, tile, num_nodes)
               if tile is not None else None)

    pad_gid = num_graphs - 1
    senders = np.full(num_edges, num_nodes - 1, dtype=np.int32)
    receivers = np.full(num_edges, num_nodes - 1, dtype=np.int32)
    graph_id = np.full(num_nodes, pad_gid, dtype=np.int32)
    edge_graph_id = np.full(num_edges, pad_gid, dtype=np.int32)
    n_node = np.zeros(num_graphs, dtype=np.int32)
    n_edge = np.zeros(num_graphs, dtype=np.int32)
    node_mask = np.zeros(num_nodes, dtype=np.float32)
    edge_mask = np.zeros(num_edges, dtype=np.float32)
    graph_mask = np.zeros(num_graphs, dtype=np.float32)

    out: Dict[str, Any] = {}
    node_off = 0
    edge_off = 0
    feats: Dict[str, list] = {"node_feat": [], "edge_feat": [], "y": []}
    eig: Dict[str, list] = {"eigvecs": [], "eigvals": []}
    has = {k_: all(k_ in g for g in graphs) for k_ in
           ("node_feat", "edge_feat", "y", "eigvecs", "eigvals")}

    node_offsets_out = np.zeros(num_graphs, dtype=np.int32)
    for gi, g in enumerate(graphs):
        n = len_nodes(g)
        e = len(g["senders"])
        if offsets is not None:
            node_off = int(offsets[gi])
        senders[edge_off:edge_off + e] = np.asarray(g["senders"], np.int32) + node_off
        receivers[edge_off:edge_off + e] = np.asarray(g["receivers"], np.int32) + node_off
        graph_id[node_off:node_off + n] = gi
        edge_graph_id[edge_off:edge_off + e] = gi
        n_node[gi] = n
        n_edge[gi] = e
        node_mask[node_off:node_off + n] = 1.0
        edge_mask[edge_off:edge_off + e] = 1.0
        graph_mask[gi] = 1.0
        node_offsets_out[gi] = node_off
        node_off += n
        edge_off += e
        for key in ("node_feat", "edge_feat", "y"):
            if has[key]:
                feats[key].append(np.asarray(g[key]))
        for key in ("eigvecs", "eigvals"):
            if has[key]:
                eig[key].append(np.asarray(g[key]))

    if sort_edges:
        # Stable sort by receiver: padding edges (receiver = num_nodes-1) land
        # at the end; segment reductions become sorted-segment reductions.
        order = np.argsort(receivers, kind="stable")
        senders = senders[order]
        receivers = receivers[order]
        edge_graph_id = edge_graph_id[order]
        edge_mask = edge_mask[order]
    else:
        order = None

    out.update(
        senders=senders, receivers=receivers, graph_id=graph_id,
        edge_graph_id=edge_graph_id, n_node=n_node, n_edge=n_edge,
        node_mask=node_mask, edge_mask=edge_mask, graph_mask=graph_mask,
    )

    if has["node_feat"]:
        if offsets is None:
            nf = np.concatenate(feats["node_feat"], axis=0)
            out["node_feat"] = _pad_rows(nf, num_nodes)
        else:
            first = np.asarray(feats["node_feat"][0])
            nf = np.zeros((num_nodes,) + first.shape[1:], first.dtype)
            for gi, g in enumerate(graphs):
                a = np.asarray(feats["node_feat"][gi])
                nf[node_offsets_out[gi]:node_offsets_out[gi] + len(a)] = a
            out["node_feat"] = nf
    if has["edge_feat"]:
        ef = np.concatenate(feats["edge_feat"], axis=0)
        ef = _pad_rows(ef, num_edges)
        if order is not None:
            ef = ef[order]
        out["edge_feat"] = ef
    if has["y"]:
        ys = np.stack([np.asarray(v, np.float32) for v in feats["y"]], axis=0)
        pad_shape = (num_graphs - ys.shape[0],) + ys.shape[1:]
        out["y"] = np.concatenate([ys, np.zeros(pad_shape, ys.dtype)], axis=0)

    # optional per-edge extras ('edge_real' full-graph flags; 'k_rw' GraphiT
    # adaptive random-walk kernel weights)
    for extra in ("edge_real", "k_rw"):
        if all(extra in g for g in graphs):
            er = np.concatenate([np.asarray(g[extra], np.float32)
                                 for g in graphs])
            er = _pad_rows(er, num_edges)
            if order is not None:
                er = er[order]
            out[extra] = er

    if has["eigvecs"]:
        if k is None:
            k = max(v.shape[1] for v in eig["eigvecs"])
        V = np.zeros((num_nodes, k), dtype=np.float32)
        S = np.zeros((num_graphs, k), dtype=np.float32)
        M = np.zeros((num_nodes, k), dtype=np.float32)
        for gi, g in enumerate(graphs):
            n = len_nodes(g)
            off = int(node_offsets_out[gi])
            vg = np.asarray(eig["eigvecs"][gi], np.float32)
            kg = min(vg.shape[1], k)
            V[off:off + n, :kg] = vg[:n, :kg]
            M[off:off + n, :kg] = 1.0
            if has["eigvals"]:
                sg = np.asarray(eig["eigvals"][gi], np.float32)
                S[gi, :min(len(sg), k)] = sg[:k]
        out["eigvecs"] = V
        out["eigvals"] = S
        out["eig_mask"] = M

    if offsets is not None:
        out["node_offset"] = node_offsets_out
        n_tiles = num_nodes // tile
        # per-tile contiguous edge ranges over the receiver-sorted edge array
        bounds = np.searchsorted(receivers, np.arange(n_tiles + 1) * tile)
        out["tile_starts"] = bounds[:-1].astype(np.int32)
        out["tile_ends"] = bounds[1:].astype(np.int32)

    return out


def from_arrays(arrays: Dict[str, np.ndarray]) -> GraphBatch:
    """Build a GraphBatch pytree from the dict `batch_np` produces."""
    known = {f.name for f in GraphBatch.__dataclass_fields__.values()}
    main = {k: jnp.asarray(v) for k, v in arrays.items() if k in known}
    extras = {k: jnp.asarray(v) for k, v in arrays.items() if k not in known}
    return GraphBatch(**main, extras=extras)


def dense_node_index(gb: GraphBatch):
    """Per-node (graph, index-in-graph) coordinates for densification.

    Valid because nodes of a graph are contiguous in the flat layout; tiled
    layouts (interleaved padding) carry explicit offsets in
    ``extras['node_offset']``.
    """
    if "node_offset" in gb.extras:
        offsets = gb.extras["node_offset"]
    else:
        offsets = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   jnp.cumsum(gb.n_node)[:-1]])
    idx_in_graph = jnp.arange(gb.num_nodes, dtype=jnp.int32) \
        - offsets[gb.graph_id]
    return gb.graph_id, idx_in_graph


def to_dense_nodes(gb: GraphBatch, x: jnp.ndarray, n_max: int):
    """Scatter flat node features [N, ...] into [G, n_max, ...] + mask
    [G, n_max] (the dense layout for per-graph attention, the analog of the
    reference's to_dense_EVD padding, Alchemy/sign_net/transform.py:26-49)."""
    gid, idx = dense_node_index(gb)
    idx = jnp.minimum(idx, n_max - 1)
    dense = jnp.zeros((gb.num_graphs, n_max) + x.shape[1:], x.dtype)
    dense = dense.at[gid, idx].set(x * gb.node_mask.reshape(
        (-1,) + (1,) * (x.ndim - 1)))
    mask = jnp.zeros((gb.num_graphs, n_max), jnp.float32)
    mask = mask.at[gid, idx].set(gb.node_mask)
    return dense, mask


def from_dense_nodes(gb: GraphBatch, dense: jnp.ndarray):
    """Inverse of to_dense_nodes: gather back to the flat [N, ...] layout."""
    gid, idx = dense_node_index(gb)
    idx = jnp.minimum(idx, dense.shape[1] - 1)
    out = dense[gid, idx]
    return out * gb.node_mask.reshape((-1,) + (1,) * (out.ndim - 1))


def len_nodes(g) -> int:
    if "n_node" in g:
        return int(g["n_node"])
    return int(np.asarray(g["node_feat"]).shape[0])


def _pad_rows(a: np.ndarray, n: int) -> np.ndarray:
    pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad)
