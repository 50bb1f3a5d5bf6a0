"""Model-parallel net execution: node/edge-partitioned layers with a
neighbor-only halo exchange (SURVEY.md §2.5 / §7 step 8, VERDICT r3 #6).

Partition: nodes in `mp` contiguous [N/mp] shards; each device owns the
edges whose destination is local (a contiguous slice of the dst-sorted
edge array).  Per layer, only the *boundary rows* — nodes that some other
device's edges read — move over ICI, as one `all_to_all` of [mp, H, D]
send blocks (H = max boundary rows per device pair, static, computed
host-side).  This replaces the r3 halo scheme that all-gathered the full
N*D feature matrix per hop (`halo_edge_aggregate`): traffic drops from
N*D to mp*H*D bytes per device per layer, H << N/mp for graph batches
with locality (ZINC-style batches packed contiguously have zero or tiny
halos; the worst case is bounded by the true boundary size).

Overlap: `mp_neighbor_sum` splits the aggregation into a local-edge
segment-sum (no communication) and a remote-edge segment-sum (consumes
the all_to_all result).  The exchange has no data dependency on the
local sum, so XLA's latency-hiding scheduler runs the collective
concurrently with the local aggregation — the double-buffered structure
of SURVEY §7 step 8 expressed as a dependence graph rather than manual
scheduling (the idiomatic TPU form: let the compiler schedule what the
dependence structure permits).

The reference has no distributed execution at all (SURVEY.md §2.5); the
single-device op this distributes is DGL's SpMM under batched graphs
(reference: GraphPrediction/layers/gatedgcn_layer.py:49-54).
"""
from __future__ import annotations

from contextlib import contextmanager
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..graph import segment as seg

# ---------------------------------------------------------------------------
# mp-axis context: layers read this (plus the presence of 'mp_send_idx' in
# gb.extras) to route aggregations through the halo path.  Set by
# build_mp_steps' workers around tracing; plain module global because jax
# tracing is single-threaded per transform.
# ---------------------------------------------------------------------------

_MP_AXIS: Optional[str] = None


def set_mp_axis(name: Optional[str]) -> None:
    global _MP_AXIS
    _MP_AXIS = name


def get_mp_axis() -> Optional[str]:
    return _MP_AXIS


@contextmanager
def mp_axis_ctx(name: str):
    prev = get_mp_axis()
    set_mp_axis(name)
    try:
        yield
    finally:
        set_mp_axis(prev)


# ---------------------------------------------------------------------------
# Host-side partitioner
# ---------------------------------------------------------------------------

_NODE_KEYS = ("node_feat", "node_mask", "graph_id", "eigvecs", "eig_mask")
_EDGE_KEYS = ("edge_feat", "edge_graph_id", "edge_real", "k_rw")
_REPL_KEYS = ("n_node", "n_edge", "graph_mask", "y", "eigvals")


def partition_batch_mp(arrays: Dict[str, np.ndarray], mp: int,
                       e_shard: Optional[int] = None,
                       halo: Optional[int] = None) -> Dict:
    """Split one packed batch (dst-sorted edges, from `batch_np`/
    `pack_batches`) into `mp` device shards with halo-exchange metadata.

    Returns a dict of:
      nodes:    {key: [mp, N/mp, ...]} node-axis leaves
      edges:    {senders, receivers, edge_mask, edge_feat, edge_graph_id}
                as [mp, E_sh, ...]; `senders` are remapped *augmented*
                indices — s < shard_n is a local row, s >= shard_n indexes
                the halo buffer at (owner * H + slot)
      send_idx: [mp, mp, H] int32 — send_idx[o, d] = owner-local rows
                device o must send to device d each layer
      repl:     graph-level leaves, replicated
      shard_n, halo, mp: layout ints

    `e_shard`/`halo` force static shapes across batches (pass dataset-wide
    maxima so every batch compiles to one program).
    """
    N = int(np.asarray(arrays["node_mask"]).shape[0])
    if N % mp != 0:
        raise ValueError(f"num_nodes {N} not divisible by mp={mp}")
    shard_n = N // mp
    send_np = np.asarray(arrays["senders"]).astype(np.int64)
    recv_np = np.asarray(arrays["receivers"]).astype(np.int64)
    emask = np.asarray(arrays["edge_mask"]).astype(np.float32)

    bounds = np.searchsorted(recv_np, np.arange(mp + 1) * shard_n)
    need_e = int(max((bounds[1:] - bounds[:-1]).max(), 1))
    e_sh = e_shard if e_shard is not None else -(-need_e // 8) * 8
    if need_e > e_sh:
        raise ValueError(f"edge shard {need_e} exceeds budget {e_sh}")

    # boundary rows each owner must ship to each destination device
    needed = [[np.zeros(0, np.int64) for _ in range(mp)] for _ in range(mp)]
    for d in range(mp):
        lo, hi = bounds[d], bounds[d + 1]
        src, m = send_np[lo:hi], emask[lo:hi]
        owner = src // shard_n
        for o in np.unique(owner[(m > 0) & (owner != d)]):
            sel = (owner == o) & (m > 0)
            needed[int(o)][d] = np.unique(src[sel] - o * shard_n)
    need_h = max([len(q) for row in needed for q in row] + [1])
    H = halo if halo is not None else -(-need_h // 8) * 8
    if need_h > H:
        raise ValueError(f"halo {need_h} exceeds budget {H}")
    send_idx = np.zeros((mp, mp, H), np.int32)
    for o in range(mp):
        for d in range(mp):
            q = needed[o][d]
            send_idx[o, d, :len(q)] = q

    S = np.zeros((mp, e_sh), np.int32)
    R = np.zeros((mp, e_sh), np.int32)
    M = np.zeros((mp, e_sh), np.float32)
    edges = {"senders": S, "receivers": R, "edge_mask": M}
    for key in _EDGE_KEYS:
        if key in arrays and arrays[key] is not None:
            a = np.asarray(arrays[key])
            edges[key] = np.zeros((mp, e_sh) + a.shape[1:], a.dtype)
    for d in range(mp):
        lo, hi = bounds[d], bounds[d + 1]
        n = hi - lo
        src, dst, m = send_np[lo:hi], recv_np[lo:hi], emask[lo:hi]
        owner = src // shard_n
        aug = src - d * shard_n
        for o in range(mp):
            if o == d or not len(needed[o][d]):
                continue
            sel = (owner == o) & (m > 0)
            if not sel.any():
                continue
            pos = np.searchsorted(needed[o][d], src[sel] - o * shard_n)
            aug[sel] = shard_n + o * H + pos
        aug[m == 0] = 0          # padding edges: any in-range index
        S[d, :n] = aug
        R[d, :n] = dst - d * shard_n
        M[d, :n] = m
        for key in _EDGE_KEYS:
            if key in edges:
                edges[key][d, :n] = np.asarray(arrays[key])[lo:hi]

    nodes = {}
    for key in _NODE_KEYS:
        if key in arrays and arrays[key] is not None:
            a = np.asarray(arrays[key])
            nodes[key] = a.reshape((mp, shard_n) + a.shape[1:])
    repl = {key: np.asarray(arrays[key]) for key in _REPL_KEYS
            if key in arrays and arrays[key] is not None}
    return dict(nodes=nodes, edges=edges, send_idx=send_idx, repl=repl,
                shard_n=shard_n, halo=H, mp=mp)


def mp_budgets(batches, mp: int):
    """Dataset-wide (e_shard, halo) maxima so every batch shares one
    compiled shape."""
    e_sh, H = 8, 8
    for arrays in batches:
        p = partition_batch_mp(arrays, mp)
        e_sh = max(e_sh, p["edges"]["senders"].shape[1])
        H = max(H, p["halo"])
    return e_sh, H


# ---------------------------------------------------------------------------
# Device-side ops (used inside shard_map workers; axis from get_mp_axis())
# ---------------------------------------------------------------------------


def mp_exchange(x, send_idx, axis: Optional[str] = None):
    """Ship this device's boundary rows to every peer; returns the received
    halo buffer [mp * H, ...] (block o = rows owned by device o).

    x: [shard_n, ...] local features; send_idx: [mp, H] (this device's row
    of the global [mp, mp, H] table).  One `all_to_all` over ICI.
    """
    axis = axis or get_mp_axis()
    mp, H = send_idx.shape
    buf = x[send_idx.reshape(-1)].reshape((mp, H) + x.shape[1:])
    recv = jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0)
    return recv.reshape((mp * H,) + x.shape[1:])


def mp_neighbor_sum(x, gb):
    """sum_{j in N(i)} x_j under the mp partition: local-edge segment sum
    (no comm) + remote-edge segment sum fed by the halo exchange.  The
    exchange is independent of the local sum — XLA overlaps them."""
    axis = get_mp_axis()
    send_idx = gb.extras["mp_send_idx"]
    shard_n = x.shape[0]
    s = gb.senders
    local = (s < shard_n).astype(gb.edge_mask.dtype)
    msg_l = x[jnp.clip(s, 0, shard_n - 1)]
    out = seg.aggregate_edges(msg_l, gb.receivers, shard_n,
                              edge_mask=gb.edge_mask * local)
    halo = mp_exchange(x, send_idx, axis)
    msg_r = halo[jnp.clip(s - shard_n, 0, halo.shape[0] - 1)]
    return out + seg.aggregate_edges(msg_r, gb.receivers, shard_n,
                                     edge_mask=gb.edge_mask * (1.0 - local))


def mp_pool_nodes(x, gb, reduce: str = "sum"):
    """Per-graph pooling when nodes are mp-sharded: graphs may straddle
    shard boundaries, so partial per-graph reductions are combined over the
    mp axis (psum for sum/mean parts, pmax for max)."""
    axis = get_mp_axis()
    G = gb.num_graphs
    if reduce == "sum":
        part = seg.pool_nodes(x, gb.graph_id, G, node_mask=gb.node_mask,
                              reduce="sum")
        return jax.lax.psum(part, axis)
    if reduce == "mean":
        m = gb.node_mask.reshape(gb.node_mask.shape
                                 + (1,) * (x.ndim - 1)).astype(x.dtype)
        s = jax.lax.psum(seg.pool_nodes(x * m, gb.graph_id, G, reduce="sum"),
                         axis)
        c = jax.lax.psum(
            seg.pool_nodes(jnp.broadcast_to(m, x.shape[:1] + (1,) * (x.ndim - 1)),
                           gb.graph_id, G, reduce="sum"), axis)
        return s / jnp.maximum(c, 1.0)
    if reduce == "max":
        part = seg.segment_max(x, gb.graph_id, G, mask=gb.node_mask,
                               empty_value=-1e30)
        out = jax.lax.pmax(part, axis)
        return jnp.where(out <= -1e29, 0.0, out)
    raise ValueError(f"unsupported mp reduce {reduce!r}")


# ---------------------------------------------------------------------------
# Full train/eval steps: the whole net runs inside one shard_map over the
# mp axis (per-layer partitioned aggregation + halo), gradients taken OUTSIDE
# the shard_map — modern shard_map transposes psum/all_to_all correctly, so
# replicated-path (readout head) and sharded-path (conv) parameters both get
# exact gradients with no manual combining (verified by
# tests/test_mp_halo.py against the single-device step).
# ---------------------------------------------------------------------------


def _gb_of(shard, repl):
    from ..graph.batch import GraphBatch
    nodes, edges, send_idx = shard["nodes"], shard["edges"], shard["send_idx"]
    extras = {"mp_send_idx": send_idx}
    for key in ("edge_real", "k_rw"):
        if key in edges:
            extras[key] = edges[key]
    return GraphBatch(
        senders=edges["senders"], receivers=edges["receivers"],
        graph_id=nodes["graph_id"], edge_graph_id=edges.get("edge_graph_id"),
        n_node=repl["n_node"], n_edge=repl["n_edge"],
        node_mask=nodes["node_mask"], edge_mask=edges["edge_mask"],
        graph_mask=repl["graph_mask"], node_feat=nodes.get("node_feat"),
        edge_feat=edges.get("edge_feat"), y=repl.get("y"),
        eigvecs=nodes.get("eigvecs"), eigvals=repl.get("eigvals"),
        eig_mask=nodes.get("eig_mask"),
        extras=extras,
    )


def device_arrays_mp(parts: Dict) -> Dict:
    """The jit-facing pytree from `partition_batch_mp` output."""
    return {"nodes": parts["nodes"], "edges": parts["edges"],
            "send_idx": parts["send_idx"], "repl": parts["repl"]}


def _shard_specs(arrs) -> Dict:
    return {"nodes": jax.tree.map(lambda _: P("mp"), arrs["nodes"]),
            "edges": jax.tree.map(lambda _: P("mp"), arrs["edges"]),
            "send_idx": P("mp"),
            "repl": jax.tree.map(lambda _: P(), arrs["repl"])}


def build_mp_steps(predict, tx, mesh: Mesh, axis: str = "mp", loss_fn=None):
    """(train_step, eval_step) for a net running model-parallel over `axis`.

    train_step(state, arrs, lr, rng) with `arrs` = device_arrays_mp(parts);
    params/opt replicated, node+edge arrays sharded, per-layer halo
    exchange inside the forward.  BN statistics are psum'd inside
    MaskedBatchNorm (mp-aware), pooling via mp_pool_nodes.
    """
    from ..training.optim import scale_updates
    from ..training.train import TrainState, l1_graph_loss
    from ..training import metrics as M
    loss_fn = loss_fn or l1_graph_loss

    def forward(params, batch_stats, arrs, rng, training: bool):
        def worker(params, batch_stats, nodes, edges, send_idx, repl, rng):
            with mp_axis_ctx(axis):
                shard = {"nodes": jax.tree.map(lambda x: x[0], nodes),
                         "edges": jax.tree.map(lambda x: x[0], edges),
                         "send_idx": send_idx[0]}
                gb = _gb_of(shard, repl)
                rngs = (None if rng is None else
                        {"dropout": rng,
                         "sign_flip": jax.random.fold_in(rng, 1)})
                pred, updates = predict(
                    {"params": params, "batch_stats": batch_stats},
                    gb, training, rngs, ["batch_stats"])
                loss = loss_fn(pred, gb)
                score = pred[0] if isinstance(pred, tuple) else pred
                y = (gb.y[:, 0] if (score.ndim == 1 and gb.y.ndim == 2)
                     else gb.y)
                mae = M.masked_l1(score, y, gb.graph_mask)
                return (loss, mae,
                        updates.get("batch_stats", batch_stats))

        sp = _shard_specs(arrs)
        f = jax.shard_map(
            worker, mesh=mesh,
            in_specs=(P(), P(), sp["nodes"], sp["edges"], sp["send_idx"],
                      sp["repl"], P()),
            out_specs=(P(), P(), P()), check_vma=False)
        return f(params, batch_stats, arrs["nodes"], arrs["edges"],
                 arrs["send_idx"], arrs["repl"], rng)

    def train_step(state, arrs, lr, rng):
        def _loss(params):
            loss, mae, bs = forward(params, state.batch_stats, arrs, rng,
                                    True)
            return loss, (mae, bs)

        (loss, (mae, new_bs)), grads = jax.value_and_grad(
            _loss, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = scale_updates(updates, lr)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(params=new_params, batch_stats=new_bs,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, {"loss": loss, "mae": mae}

    def eval_step(state, arrs, rng=None):
        # optional rng mirrors build_steps' eval contract (sign_flip eval)
        loss, mae, _ = forward(state.params, state.batch_stats, arrs, rng,
                               False)
        n = arrs["repl"]["graph_mask"].sum()
        return {"loss_sum": loss * n, "mae_sum": mae * n, "n": n}

    return jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step)
