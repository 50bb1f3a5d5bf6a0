"""ctypes bindings for the native C++ batch packer (native/batcher.cpp).

Falls back transparently to the numpy packer when the shared library has not
been built (`make -C native`).  The native path packs directly into
preallocated, reused buffers — one memcpy pass + counting sort — so host
packing keeps up with the TPU step at large batch rates.
"""
from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Optional

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native",
        "libsbt_native.so")
    if not os.path.exists(path):
        _LIB = False
        return False
    lib = ctypes.CDLL(path)
    lib.pack_batch.restype = ctypes.c_int
    _LIB = lib
    return lib


def native_available() -> bool:
    return bool(_load())


class GraphStore:
    """Concatenated column store of a graph dataset for the native packer."""

    def __init__(self, graphs: List[dict], k: Optional[int] = None):
        n_off = [0]
        e_off = [0]
        for g in graphs:
            n_off.append(n_off[-1] + int(np.asarray(g["node_feat"]).shape[0]))
            e_off.append(e_off[-1] + len(g["senders"]))
        self.node_off = np.asarray(n_off, np.int64)
        self.edge_off = np.asarray(e_off, np.int64)
        self.senders = np.concatenate(
            [np.asarray(g["senders"], np.int32) for g in graphs])
        self.receivers = np.concatenate(
            [np.asarray(g["receivers"], np.int32) for g in graphs])

        nf = [np.asarray(g["node_feat"], np.int32) for g in graphs]
        nf = [a[:, None] if a.ndim == 1 else a for a in nf]
        self.node_feat = np.ascontiguousarray(np.concatenate(nf, axis=0))
        self.nf_dim = self.node_feat.shape[1]

        if "edge_feat" in graphs[0]:
            ef = [np.asarray(g["edge_feat"], np.int32) for g in graphs]
            ef = [a[:, None] if a.ndim == 1 else a for a in ef]
            self.edge_feat = np.ascontiguousarray(np.concatenate(ef, axis=0))
            self.ef_dim = self.edge_feat.shape[1]
        else:
            self.edge_feat = None
            self.ef_dim = 0

        if "eigvecs" in graphs[0]:
            ks = max(np.asarray(g["eigvecs"]).shape[1] for g in graphs)
            self.k = k or ks
            evs = []
            counts = []
            for g in graphs:
                v = np.asarray(g["eigvecs"], np.float32)
                out = np.zeros((v.shape[0], self.k), np.float32)
                kk = min(v.shape[1], self.k)
                out[:, :kk] = v[:, :kk]
                evs.append(out)
                counts.append(kk)
            self.eig_counts = np.asarray(counts, np.int32)
            self.eigvecs = np.ascontiguousarray(np.concatenate(evs, axis=0))
            evals = np.zeros((len(graphs), self.k), np.float32)
            for i, g in enumerate(graphs):
                sv = np.asarray(g["eigvals"], np.float32)
                evals[i, :min(len(sv), self.k)] = sv[:self.k]
            self.eigvals = evals
        else:
            self.eigvecs = None
            self.eigvals = None
            self.eig_counts = None
            self.k = 0

        if "y" in graphs[0]:
            ys = [np.asarray(g["y"], np.float32).reshape(-1) for g in graphs]
            self.y = np.ascontiguousarray(np.stack(ys, axis=0))
            self.y_dim = self.y.shape[1]
        else:
            self.y = None
            self.y_dim = 0

        self.num_graphs = len(graphs)
        self.node_counts = np.diff(self.node_off)
        self.edge_counts = np.diff(self.edge_off)


def pack_batch_native(store: GraphStore, graph_sel: np.ndarray,
                      num_nodes: int, num_edges: int, num_graphs: int,
                      out: Optional[Dict[str, np.ndarray]] = None
                      ) -> Dict[str, np.ndarray]:
    lib = _load()
    if not lib:
        raise RuntimeError("native library not built; run `make -C native`")
    k = store.k
    if out is None:
        out = dict(
            senders=np.empty(num_edges, np.int32),
            receivers=np.empty(num_edges, np.int32),
            edge_mask=np.empty(num_edges, np.float32),
            graph_id=np.empty(num_nodes, np.int32),
            edge_graph_id=np.empty(num_edges, np.int32),
            node_mask=np.empty(num_nodes, np.float32),
            n_node=np.empty(num_graphs, np.int32),
            n_edge=np.empty(num_graphs, np.int32),
            graph_mask=np.empty(num_graphs, np.float32),
        )
        out["node_feat"] = np.empty((num_nodes, store.nf_dim), np.int32)
        if store.edge_feat is not None:
            out["edge_feat"] = np.empty((num_edges, store.ef_dim), np.int32)
        if store.eigvecs is not None:
            out["eigvecs"] = np.empty((num_nodes, k), np.float32)
            out["eigvals"] = np.empty((num_graphs, k), np.float32)
            out["eig_mask"] = np.empty((num_nodes, k), np.float32)
        if store.y is not None:
            out["y"] = np.empty((num_graphs, store.y_dim), np.float32)

    sel = np.ascontiguousarray(graph_sel, np.int32)
    P = lambda a, t: (a.ctypes.data_as(ctypes.POINTER(t))
                      if a is not None else None)
    i32, i64, f32 = ctypes.c_int32, ctypes.c_int64, ctypes.c_float
    rc = lib.pack_batch(
        P(sel, i32), i32(len(sel)),
        P(store.node_off, i64), P(store.edge_off, i64),
        P(store.senders, i32), P(store.receivers, i32),
        P(store.node_feat, i32), i32(store.nf_dim),
        P(store.edge_feat, i32), i32(store.ef_dim),
        P(store.eigvecs, f32), i32(k), P(store.eig_counts, i32),
        P(store.eigvals, f32), i32(k),
        P(store.y, f32), i32(store.y_dim),
        i32(num_nodes), i32(num_edges), i32(num_graphs), i32(k),
        P(out["senders"], i32), P(out["receivers"], i32),
        P(out["edge_mask"], f32), P(out["graph_id"], i32),
        P(out["edge_graph_id"], i32), P(out["node_mask"], f32),
        P(out["n_node"], i32), P(out["n_edge"], i32),
        P(out["graph_mask"], f32),
        P(out.get("node_feat"), i32), P(out.get("edge_feat"), i32),
        P(out.get("eigvecs"), f32), P(out.get("eigvals"), f32),
        P(out.get("eig_mask"), f32), P(out.get("y"), f32),
    )
    if rc != 0:
        raise ValueError("batch does not fit in budgets")
    res = dict(out)
    # squeeze 1-d feature columns back to vectors (graph/batch.py contract)
    if store.nf_dim == 1 and "node_feat" in res:
        res["node_feat"] = res["node_feat"][:, 0]
    if store.ef_dim == 1 and "edge_feat" in res:
        res["edge_feat"] = res["edge_feat"][:, 0]
    return res
