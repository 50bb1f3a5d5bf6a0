"""Segment reductions — the message-passing primitives.

These replace the reference's library kernels: DGL's SpMM/segment-reduce
(`g.update_all`, `dgl.sum/mean/max_nodes`) and PyG's torch-scatter
(`scatter(..., reduce=...)`).  On TPU they lower to XLA scatter-adds over
**sorted** segment ids (the batcher sorts edges by destination), which XLA
tiles well; the Pallas kernels in `ops/` provide fused alternatives for the
hot paths.

All functions take a static `num_segments` and never produce NaNs on empty
segments (means/softmaxes are guarded), matching the epsilon-guarded behavior
of the reference (e.g. GatedGCN's `sum_sigma + 1e-6`, reference:
GraphPrediction/layers/gatedgcn_layer.py:54).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Large-but-finite stand-in for -inf so padded segments give 0 after exp.
_NEG_BIG = jnp.float32(-1e30)

# Global backend for sum-aggregations: 'xla' (scatter-add) or 'onehot'
# (MXU matmul against an on-the-fly one-hot; see ops/segment_matmul.py).
# Selected by benchmarking on the target chip (bench_ops.py).
_SUM_BACKEND = "xla"


def set_sum_backend(name: str) -> None:
    global _SUM_BACKEND
    if name not in ("xla", "onehot"):
        raise ValueError(name)
    _SUM_BACKEND = name


def get_sum_backend() -> str:
    return _SUM_BACKEND


# Backend for neighbor aggregation (models/conv.neighbor_sum): 'xla'
# (gather + sorted scatter-add), 'pallas_tile' (tile-local fused SpMM —
# requires batches packed with tile=bn, ops/pallas_spmm.spmm_tiled), or
# 'tile_dense' (same tile-local layout, block adjacency built once per
# batch + batched MXU matmul per layer, ops/tile_dense — the r5 default
# for the flagship step: the trace showed per-layer adjacency rebuilds at
# ~60% of step time).
_AGG_BACKEND = "xla"


def set_agg_backend(name: str) -> None:
    global _AGG_BACKEND
    if name not in ("xla", "pallas_tile", "tile_dense"):
        raise ValueError(name)
    _AGG_BACKEND = name


def get_agg_backend() -> str:
    return _AGG_BACKEND


def segment_sum(data, segment_ids, num_segments, indices_are_sorted=True):
    if _SUM_BACKEND == "onehot" and data.ndim >= 2:
        # out[s, :] = sum_e 1[ids[e]=s] data[e, :] as one MXU matmul;
        # trailing axes fold into the feature dim (rank-polymorphic)
        oh = jax.nn.one_hot(segment_ids, num_segments, dtype=data.dtype)
        flat = data.reshape(data.shape[0], -1)
        out = oh.T @ flat
        return out.reshape((num_segments,) + data.shape[1:])
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(data, segment_ids, num_segments, indices_are_sorted=True,
                 weights: Optional[jnp.ndarray] = None):
    """Mean over each segment; `weights` (e.g. an edge mask) masks entries."""
    if weights is not None:
        w = weights.reshape(weights.shape + (1,) * (data.ndim - weights.ndim))
        data = data * w
        ones = jnp.broadcast_to(w, data.shape[:1] + (1,) * (data.ndim - 1))
    else:
        ones = jnp.ones(data.shape[:1] + (1,) * (data.ndim - 1), data.dtype)
    s = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    c = segment_sum(ones, segment_ids, num_segments, indices_are_sorted)
    return s / jnp.maximum(c, 1.0)


def segment_max(data, segment_ids, num_segments, indices_are_sorted=True,
                mask: Optional[jnp.ndarray] = None, empty_value=0.0):
    """Max over segments; empty segments yield `empty_value`."""
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
        data = jnp.where(m > 0, data, _NEG_BIG)
    out = jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    return jnp.where(out <= _NEG_BIG / 2, empty_value, out)


def segment_min(data, segment_ids, num_segments, indices_are_sorted=True,
                mask: Optional[jnp.ndarray] = None, empty_value=0.0):
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
        data = jnp.where(m > 0, data, -_NEG_BIG)
    out = jax.ops.segment_min(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    return jnp.where(out >= -_NEG_BIG / 2, empty_value, out)


def segment_softmax(scores, segment_ids, num_segments, indices_are_sorted=True,
                    mask: Optional[jnp.ndarray] = None):
    """Numerically-stable per-segment softmax (per-destination attention).

    Subtracts the per-segment max before exponentiation — strictly better
    numerics than the reference's clamp(-5, 5) trick (reference:
    GraphPrediction/layers/transformer.py:35-52); see the `clamped_exp`
    variant below for bit-level behavioral parity with the reference.
    """
    maxes = segment_max(scores, segment_ids, num_segments, indices_are_sorted,
                        mask=mask, empty_value=0.0)
    scores = scores - maxes[segment_ids]
    ex = jnp.exp(scores)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (ex.ndim - mask.ndim))
        ex = ex * m
    denom = segment_sum(ex, segment_ids, num_segments, indices_are_sorted)
    return ex / jnp.maximum(denom, 1e-16)[segment_ids]


def clamped_exp(scores, clamp=5.0):
    """exp(clamp(x, -c, c)) — the reference transformer's softmax numerator
    (reference: GraphPrediction/layers/transformer.py:48-52)."""
    return jnp.exp(jnp.clip(scores, -clamp, clamp))


def gather_src(node_feat, senders):
    """Edge-wise gather of source-node features (SpMM gather half)."""
    return node_feat[senders]


def gather_dst(node_feat, receivers):
    return node_feat[receivers]


def aggregate_edges(edge_msg, receivers, num_nodes, edge_mask=None,
                    indices_are_sorted=True, reduce="sum"):
    """Reduce edge messages into destination nodes (SpMM scatter half)."""
    if edge_mask is not None and reduce in ("sum", "mean"):
        m = edge_mask.reshape(edge_mask.shape + (1,) * (edge_msg.ndim - edge_mask.ndim))
        edge_msg = edge_msg * m
    if reduce == "sum":
        return segment_sum(edge_msg, receivers, num_nodes, indices_are_sorted)
    if reduce == "mean":
        return segment_mean(edge_msg, receivers, num_nodes, indices_are_sorted,
                            weights=edge_mask)
    if reduce == "max":
        return segment_max(edge_msg, receivers, num_nodes, indices_are_sorted,
                           mask=edge_mask)
    if reduce == "min":
        return segment_min(edge_msg, receivers, num_nodes, indices_are_sorted,
                           mask=edge_mask)
    raise ValueError(f"unknown reduce {reduce!r}")


# ---------------------------------------------------------------------------
# Graph-level pooling (DGL's sum/mean/max_nodes; PyG's scatter over batch).
# ---------------------------------------------------------------------------

def pool_nodes(node_feat, graph_id, num_graphs, node_mask=None,
               indices_are_sorted=True, reduce="sum"):
    """Pool node features per graph: the readout primitive."""
    return aggregate_edges(node_feat, graph_id, num_graphs, edge_mask=node_mask,
                           indices_are_sorted=indices_are_sorted, reduce=reduce)


def broadcast_graphs(graph_feat, graph_id):
    """Broadcast per-graph values back to nodes (dgl.broadcast_nodes)."""
    return graph_feat[graph_id]
