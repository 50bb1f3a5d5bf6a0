"""Graph convolution layers on padded batched graphs.

Each layer consumes node features ``x`` plus the structural arrays of a
`GraphBatch` and runs gather -> edge compute -> masked segment reduce: the
TPU-native replacement for DGL's update_all/apply_edges SpMM/SDDMM kernels
and PyG's MessagePassing + torch-scatter.

Layer semantics follow the reference implementations cited per class; shapes
are static, padded edges carry zero weight through ``edge_mask``.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..graph import segment as seg
from ..nn.init import ACTIVATIONS, Linear
from ..nn.mlp import MLP, ElementsMLP, MaskedMLP
from ..nn.norm import MaskedBatchNorm


def neighbor_sum(x, gb):
    """sum_{j in N(i)} x_j.

    Flat GraphBatch: masked destination-sorted segment sum (SpMM), or the
    tile-local fused Pallas kernel when the batch carries the tiled layout
    and the backend is enabled (graph.segment.set_agg_backend).
    DenseGraphBatch: batched adj @ x on the MXU (zero scatter/gather).
    """
    from ..graph.dense import DenseGraphBatch, dense_neighbor_sum
    if isinstance(gb, DenseGraphBatch):
        return dense_neighbor_sum(gb.adj, x)
    if "mp_send_idx" in gb.extras:
        # model-parallel shard: local segment-sum + halo-exchange remote part
        from ..parallel.mp_halo import mp_neighbor_sum
        return mp_neighbor_sum(x, gb)
    if (seg.get_agg_backend() == "tile_dense"
            and "tile_starts" in gb.extras):
        from ..ops import spmm_tile_dense
        bn = gb.num_nodes // gb.extras["tile_starts"].shape[0]
        return spmm_tile_dense(x, gb.senders, gb.receivers, gb.edge_mask,
                               gb.num_nodes, bn)
    if (seg.get_agg_backend() == "pallas_tile"
            and "tile_starts" in gb.extras):
        from ..ops import spmm_tiled
        bn = gb.num_nodes // gb.extras["tile_starts"].shape[0]
        flat = x.reshape(x.shape[0], -1)
        out = spmm_tiled(flat, gb.senders, gb.receivers, gb.edge_mask,
                         gb.extras["tile_starts"], gb.extras["tile_ends"],
                         gb.num_nodes, bn)
        return out.reshape(x.shape)
    msg = x[gb.senders]
    return seg.aggregate_edges(msg, gb.receivers, gb.num_nodes,
                               edge_mask=gb.edge_mask)


def src_features(x, gb):
    """Rows of ``x`` addressable by ``gb.senders``.

    Plain batch: ``x`` itself.  Model-parallel shard (``mp_send_idx`` in
    extras): ``[x ‖ halo rows]`` — senders >= shard_n are augmented indices
    into the halo block received from peer devices, so one `all_to_all` per
    call makes every gather-based layer (GAT/PNA/GCN/GINE/attention) exact
    under the mp partition.  The exchange has no dependency on this layer's
    local compute, so XLA overlaps it (same contract as mp_neighbor_sum).
    """
    if "mp_send_idx" in gb.extras:
        from ..parallel.mp_halo import mp_exchange
        return jnp.concatenate(
            [x, mp_exchange(x, gb.extras["mp_send_idx"])], axis=0)
    return x


def pool_any(gb, x, reduce="sum"):
    """Per-graph pooling for either batch representation."""
    from ..graph.dense import DenseGraphBatch, dense_pool
    if isinstance(gb, DenseGraphBatch):
        return dense_pool(x, gb.node_mask, reduce=reduce)
    if "mp_send_idx" in gb.extras:
        # mp shard: graphs may straddle shards; combine partials over ICI
        from ..parallel.mp_halo import mp_pool_nodes
        return mp_pool_nodes(x, gb, reduce=reduce)
    return seg.pool_nodes(x, gb.graph_id, gb.num_graphs,
                          node_mask=gb.node_mask, reduce=reduce)


def node_mask_of(gb):
    """Flattened-compatible node mask for either representation."""
    return gb.node_mask


def node_mask_like(gb, x):
    """gb's node mask broadcast to x.shape[:-1] (adds eigvec-channel axes)."""
    m = gb.node_mask
    while m.ndim < x.ndim - 1:
        m = m[..., None]
    return jnp.broadcast_to(m, x.shape[:-1])


class GINConv(nn.Module):
    """x' = update_net((1 + eps) x + sum_j x_j).

    `learn_eps=False` matches DGL GINConv(MLP, 'sum') (reference:
    GraphPrediction/layers/gnns.py:81-114); `learn_eps=True` matches PyG
    GINConv(train_eps=True) (reference:
    Alchemy/sign_net/model_utils/pyg_gnn_wrapper.py:7-16).
    """
    update_net: nn.Module
    learn_eps: bool = False

    @nn.compact
    def __call__(self, gb, x, edge_attr=None, training: bool = True):
        del edge_attr
        agg = neighbor_sum(x, gb)
        eps = (self.param("eps", nn.initializers.zeros, ())
               if self.learn_eps else 0.0)
        out = (1.0 + eps) * x + agg
        # BN inside the update net must ignore padding rows (the reference
        # has no padding; stats run over true nodes only)
        return self.update_net(out, training=training,
                               mask=node_mask_like(gb, out))


class GINEConv(nn.Module):
    """x' = update_net((1 + eps) x + sum_j relu(x_j + e_ij)) — PyG GINEConv
    (reference: Alchemy/sign_net/model_utils/pyg_gnn_wrapper.py:19-28)."""
    update_net: nn.Module
    learn_eps: bool = True

    @nn.compact
    def __call__(self, gb, x, edge_attr, training: bool = True):
        from ..graph.dense import DenseGraphBatch
        if isinstance(gb, DenseGraphBatch):
            # edge_attr: [G, M(dst), M(src), D]; relu(x_src + e) summed over
            # sources with the adjacency mask — one einsum on the MXU
            msg = nn.relu(x[:, None, :, :] + edge_attr)
            agg = jnp.einsum("gmn,gmnd->gmd", gb.adj, msg)
        else:
            msg = nn.relu(src_features(x, gb)[gb.senders] + edge_attr)
            agg = seg.aggregate_edges(msg, gb.receivers, gb.num_nodes,
                                      edge_mask=gb.edge_mask)
        eps = (self.param("eps", nn.initializers.zeros, ())
               if self.learn_eps else 0.0)
        out = (1.0 + eps) * x + agg
        return self.update_net(out, training=training,
                               mask=node_mask_like(gb, out))


class MaskedGINConv(nn.Module):
    """GIN aggregation + MaskedMLP, zeroing padded (node, k) slots — the
    SignNet phi conv (reference: Alchemy/sign_net/model_utils/masked_layers.py:66-84).
    Works on [N, D] or (vmapped) per-k slices."""
    out: int
    hidden: Optional[int] = None

    @nn.compact
    def __call__(self, gb, x, edge_attr=None, mask=None, training: bool = True):
        del edge_attr
        agg = neighbor_sum(x, gb)
        eps = self.param("eps", nn.initializers.zeros, ())
        out = (1.0 + eps) * x + agg
        return MaskedMLP(self.out, num_layers=2, with_final_activation=False,
                         hidden=self.hidden, name="nn")(out, mask=mask,
                                                        training=training)


class MaskedGINEConv(nn.Module):
    """Edge-featured GIN aggregation (`relu(x_src + e)` summed into dst,
    train_eps) + MaskedMLP, zeroing padded (node, k) slots — the GINE variant
    of the SignNet phi conv (reference:
    Alchemy/sign_net/model_utils/masked_layers.py:87-102).

    x: [N, D] or [N, K, D]; edge_attr: [E, D] (broadcast over the K axis)."""
    out: int
    hidden: Optional[int] = None

    @nn.compact
    def __call__(self, gb, x, edge_attr, mask=None, training: bool = True):
        from ..graph.dense import DenseGraphBatch
        if isinstance(gb, DenseGraphBatch):
            # edge_attr: [G, M(dst), M(src), D]; x: [G, M, D] or [G, M, K, D]
            if x.ndim == 4:
                msg = nn.relu(x[:, None, :, :, :]
                              + edge_attr[:, :, :, None, :])
                agg = jnp.einsum("gmn,gmnkd->gmkd", gb.adj, msg)
            else:
                msg = nn.relu(x[:, None, :, :] + edge_attr)
                agg = jnp.einsum("gmn,gmnd->gmd", gb.adj, msg)
        else:
            src = src_features(x, gb)[gb.senders]
            e = edge_attr
            if src.ndim == e.ndim + 1:
                e = e[:, None, :]
            if src.shape[-1] not in (1, e.shape[-1]):
                # layer 0 of GNN3d has D=1 x against n_out-dim encoded edges;
                # that broadcast is intentional — anything else is a caller bug
                raise ValueError(
                    f"MaskedGINEConv feature mismatch: x D={src.shape[-1]} "
                    f"vs edge D={e.shape[-1]} (only D=1 may broadcast)")
            msg = nn.relu(src + e)
            agg = seg.aggregate_edges(msg, gb.receivers, gb.num_nodes,
                                      edge_mask=gb.edge_mask)
        eps = self.param("eps", nn.initializers.zeros, ())
        out = (1.0 + eps) * x + agg
        if mask is not None:
            out = out * mask[..., None]
        return MaskedMLP(self.out, num_layers=2, with_final_activation=False,
                         hidden=self.hidden, name="nn")(out, mask=mask,
                                                        training=training)


class GCNConv(nn.Module):
    """Symmetric-normalized graph convolution.

    `add_self_loops=True` -> PyG GCNConv semantics; False -> DGL GraphConv
    (norm='both', degrees clipped at 1) used by GCNDeepSigns (reference:
    GraphPrediction/layers/gnns.py:15-45).
    """
    features: int
    add_self_loops: bool = True
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, gb, x, edge_attr=None, training: bool = True):
        del edge_attr, training
        deg = gb.in_degrees()
        if self.add_self_loops:
            deg = deg + gb.node_mask
        d_inv_sqrt = jnp.where(deg > 0, deg ** -0.5, 0.0)
        h = Linear(self.features, name="weight")(x)
        msg = src_features(h * d_inv_sqrt[:, None], gb)[gb.senders]
        agg = seg.aggregate_edges(msg, gb.receivers, gb.num_nodes,
                                  edge_mask=gb.edge_mask)
        if self.add_self_loops:
            agg = agg + h * d_inv_sqrt[:, None]
        out = agg * d_inv_sqrt[:, None]
        out = out + self.param("bias", nn.initializers.zeros, (self.features,))
        if self.activation:
            out = ACTIVATIONS[self.activation](out)
        return out


class GATConv(nn.Module):
    """Multi-head graph attention (GATv1 scoring, LeakyReLU(0.2) + segment
    softmax).  `add_self_loops=True` -> PyG semantics (reference:
    Alchemy/sign_net/model_utils/pyg_gnn_wrapper.py:30-37); False -> DGL
    GATConv as used in GraphPrediction (layers/gat_net.py)."""
    features: int      # per-head output dim
    num_heads: int = 1
    concat: bool = True
    add_self_loops: bool = True
    negative_slope: float = 0.2
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, gb, x, edge_attr=None, training: bool = True):
        del edge_attr, training
        H, F = self.num_heads, self.features
        # shape-polymorphic: x may be [N, D] or [N, K, D] (k-channel phi);
        # gathers ride axis 0, segment masks broadcast over the middle axes
        h = Linear(H * F, use_bias=False, name="weight")(x)
        h = h.reshape(h.shape[:-1] + (H, F))
        a_src = self.param("attn_src", nn.initializers.glorot_uniform(), (1, H, F))
        a_dst = self.param("attn_dst", nn.initializers.glorot_uniform(), (1, H, F))
        el = (h * a_src).sum(-1)  # [N, ..., H]
        er = (h * a_dst).sum(-1)

        senders, receivers, emask = gb.senders, gb.receivers, gb.edge_mask
        h_src = src_features(h, gb)      # mp: [shard_n + mp*H halo, ..., H, F]
        el_src = (h_src * a_src).sum(-1)
        scores = el_src[senders] + er[receivers]              # [E, ..., H]
        scores = nn.leaky_relu(scores, negative_slope=self.negative_slope)

        def bmask(ref):
            return emask.reshape(emask.shape + (1,) * (ref.ndim - 1))

        if self.add_self_loops:
            # fold self-loop contribution in by appending virtual edges is
            # shape-hostile; instead compute softmax including the self term
            # analytically: alpha_ii ~ exp(s_ii) with s_ii = el_i + er_i.
            self_scores = nn.leaky_relu(el + er, negative_slope=self.negative_slope)
            m = seg.segment_max(scores, receivers, gb.num_nodes, mask=emask,
                                empty_value=-1e30)
            m = jnp.maximum(m, self_scores)
            ex = jnp.exp(scores - m[receivers]) * bmask(scores)
            ex_self = jnp.exp(self_scores - m)
            denom = seg.segment_sum(ex, receivers, gb.num_nodes) + ex_self
            alpha = ex / jnp.maximum(denom, 1e-16)[receivers]
            agg = seg.segment_sum(alpha[..., None] * h_src[senders], receivers,
                                  gb.num_nodes)
            agg = agg + (ex_self / jnp.maximum(denom, 1e-16))[..., None] * h
        else:
            alpha = seg.segment_softmax(scores, receivers, gb.num_nodes,
                                        mask=emask)
            agg = seg.segment_sum(alpha[..., None] * h_src[senders] *
                                  bmask(scores)[..., None], receivers,
                                  gb.num_nodes)
        bias = self.param("bias", nn.initializers.zeros,
                          (H * F,) if self.concat else (F,))
        out = (agg.reshape(agg.shape[:-2] + (H * F,)) if self.concat
               else agg.mean(axis=-2))
        out = out + bias
        if self.activation:
            out = ACTIVATIONS[self.activation](out)
        return out


class GatedGCNLayer(nn.Module):
    """Residual gated graph conv (Bresson & Laurent).

    e' = Dh_u + Eh_v + Ce ; h' = Ah + sum_v sigma(e') .* Bh_v / (sum sigma + 1e-6),
    then snorm graph-norm, BN, ReLU, residual, dropout — exactly the reference
    data flow (reference: GraphPrediction/layers/gatedgcn_layer.py:12-77).
    """
    features: int
    dropout: float = 0.0
    batch_norm: bool = True
    residual: bool = False
    graph_norm: bool = True

    @nn.compact
    def __call__(self, gb, h, e, snorm_n=None, training: bool = True):
        h_in, e_in = h, e
        A = Linear(self.features, name="A")
        B = Linear(self.features, name="B")
        C = Linear(self.features, name="C")
        D = Linear(self.features, name="D")
        E = Linear(self.features, name="E")
        Ah, Bh, Ce, Dh, Eh = A(h), B(h), C(e), D(h), E(h)

        if "mp_send_idx" in gb.extras:
            # model-parallel shard: one halo exchange of h per layer; the
            # big local linears above have no dependency on it (XLA overlaps
            # the all_to_all with them), then B/D are applied to the small
            # received halo block and appended so the shared src-gather /
            # gate / segment-sum code below works unchanged on augmented
            # indices (senders >= shard_n point into the halo block)
            from ..parallel.mp_halo import mp_exchange
            halo_h = mp_exchange(h, gb.extras["mp_send_idx"])
            Bh = jnp.concatenate([Bh, B(halo_h)], axis=0)
            Dh = jnp.concatenate([Dh, D(halo_h)], axis=0)

        if (seg.get_agg_backend() == "pallas_tile"
                and "tile_starts" in gb.extras):
            # fused Pallas gate+aggregate (ops/pallas_gatedgcn)
            from ..ops import gatedgcn_gate_tiled
            bn = gb.num_nodes // gb.extras["tile_starts"].shape[0]
            agg, e_new = gatedgcn_gate_tiled(
                Bh, Dh, Eh, Ce, gb.senders, gb.receivers, gb.edge_mask,
                gb.extras["tile_starts"], gb.extras["tile_ends"],
                gb.num_nodes, bn)
            h_new = Ah + agg
        else:
            e_new = Dh[gb.senders] + Eh[gb.receivers] + Ce
            sigma = nn.sigmoid(e_new)
            em = gb.edge_mask[:, None]
            sum_sigma_h = seg.segment_sum(sigma * Bh[gb.senders] * em,
                                          gb.receivers, gb.num_nodes)
            sum_sigma = seg.segment_sum(sigma * em, gb.receivers,
                                        gb.num_nodes)
            h_new = Ah + sum_sigma_h / (sum_sigma + 1e-6)

        if self.graph_norm and snorm_n is not None:
            h_new = h_new * snorm_n
        if self.batch_norm:
            h_new = MaskedBatchNorm(self.features, name="bn_h")(
                h_new, mask=gb.node_mask, training=training)
            e_new = MaskedBatchNorm(self.features, name="bn_e")(
                e_new, mask=gb.edge_mask, training=training)
        h_new = nn.relu(h_new)
        e_new = nn.relu(e_new)
        if self.residual and h_in.shape == h_new.shape:
            h_new = h_in + h_new
            e_new = e_in + e_new
        h_new = nn.Dropout(self.dropout, deterministic=not training)(h_new)
        e_new = nn.Dropout(self.dropout, deterministic=not training)(e_new)
        return h_new, e_new


class GatedGCNLSPELayer(nn.Module):
    """GatedGCN layer with learnable structural+positional channels (LSPE).

    The reference net instantiates ``GatedGCNLSPELayer`` for its LSPE path
    (reference: GraphPrediction/nets/ZINC_graph_regression/gatedgcn_net.py:63-65)
    but never defines or imports that class anywhere in the repo — the path
    crashes with a NameError as shipped.  This implements the intended layer
    per the MPGNNs-LSPE equations (Dwivedi et al., "Graph Neural Networks with
    Learnable Structural and Positional Representations", eqs. 9-11):

        ehat_ij = B1 h_i + B2 h_j + B3 e_ij ;  eta = sigma(ehat)
        h_i' = h_i + ReLU(BN(A1 [h_i||p_i] + sum_j eta .* A2 [h_j||p_j] / (sum eta + eps)))
        p_i' = p_i + tanh(C1 p_i + sum_j eta .* C2 p_j / (sum eta + eps))
        e_ij' = e_ij + ReLU(BN(ehat_ij))
    """
    features: int
    dropout: float = 0.0
    batch_norm: bool = True
    residual: bool = True

    @nn.compact
    def __call__(self, gb, h, p, e, snorm_n=None, training: bool = True):
        del snorm_n
        h_in, p_in, e_in = h, p, e
        hp = jnp.concatenate([h, p], axis=-1)
        A1hp = Linear(self.features, name="A1")(hp)
        A2hp = Linear(self.features, name="A2")(hp)
        B1h = Linear(self.features, name="B1")(h)
        B2h = Linear(self.features, name="B2")(h)
        B3e = Linear(self.features, name="B3")(e)
        C1p = Linear(self.features, name="C1")(p)
        C2p = Linear(self.features, name="C2")(p)

        e_new = B1h[gb.receivers] + src_features(B2h, gb)[gb.senders] + B3e
        eta = nn.sigmoid(e_new) * gb.edge_mask[:, None]
        sum_eta = seg.segment_sum(eta, gb.receivers, gb.num_nodes) + 1e-6

        h_new = A1hp + seg.segment_sum(
            eta * src_features(A2hp, gb)[gb.senders], gb.receivers,
            gb.num_nodes) / sum_eta
        p_new = C1p + seg.segment_sum(
            eta * src_features(C2p, gb)[gb.senders], gb.receivers,
            gb.num_nodes) / sum_eta

        if self.batch_norm:
            h_new = MaskedBatchNorm(self.features, name="bn_h")(
                h_new, mask=gb.node_mask, training=training)
            e_new = MaskedBatchNorm(self.features, name="bn_e")(
                e_new, mask=gb.edge_mask, training=training)
        h_new = nn.relu(h_new)
        e_new = nn.relu(e_new)
        p_new = jnp.tanh(p_new)
        if self.residual and h_in.shape == h_new.shape:
            h_new = h_in + h_new
            e_new = e_in + e_new
            p_new = p_in + p_new
        h_new = nn.Dropout(self.dropout, deterministic=not training)(h_new)
        e_new = nn.Dropout(self.dropout, deterministic=not training)(e_new)
        return h_new, p_new, e_new


# ---------------------------------------------------------------------------
# PNA
# ---------------------------------------------------------------------------

PNA_EPS = 1e-5


def pna_aggregate(msg, gb, aggregators: Sequence[str]):
    """Multi-aggregator edge reduction via segment moments.

    The DGL reference materializes a padded neighbor mailbox and reduces over
    it (reference: GraphPrediction/layers/pna_layer.py:49-54,
    layers/pna_utils.py:12-62); on TPU we compute every statistic from masked
    segment sums instead — no mailbox, no dynamic shapes.
    """
    recv, E = gb.receivers, gb.edge_mask[:, None]
    N = gb.num_nodes
    deg = jnp.maximum(seg.segment_sum(gb.edge_mask, recv, N), 1.0)[:, None]

    outs = []
    s1 = seg.segment_sum(msg * E, recv, N)
    mean = s1 / deg
    need_var = any(a in ("std", "var", "moment3", "moment4", "moment5")
                   for a in aggregators)
    if need_var:
        s2 = seg.segment_sum(msg * msg * E, recv, N)
        var = nn.relu(s2 / deg - mean * mean)
    for a in aggregators:
        if a == "mean":
            outs.append(mean)
        elif a == "sum":
            outs.append(s1)
        elif a == "max":
            outs.append(seg.segment_max(msg, recv, N, mask=gb.edge_mask))
        elif a == "min":
            outs.append(seg.segment_min(msg, recv, N, mask=gb.edge_mask))
        elif a == "var":
            outs.append(var)
        elif a == "std":
            outs.append(jnp.sqrt(var + PNA_EPS))
        elif a in ("moment3", "moment4", "moment5"):
            n = int(a[-1])
            centered = msg - mean[recv]
            mn = seg.segment_sum((centered ** n) * E, recv, N) / deg
            outs.append(jnp.sign(mn) * (jnp.abs(mn) + PNA_EPS) ** (1.0 / n))
        else:
            raise ValueError(f"unknown aggregator {a!r}")
    return outs, deg


def pna_scale(h, deg, avg_d_log, scalers: Sequence[str]):
    """Degree scalers (reference: GraphPrediction/layers/pna_utils.py:73-87)."""
    outs = []
    logd = jnp.log(deg + 1.0)
    for s in scalers:
        if s == "identity":
            outs.append(h)
        elif s == "amplification":
            outs.append(h * (logd / avg_d_log))
        elif s == "attenuation":
            outs.append(h * (avg_d_log / jnp.maximum(logd, 1e-6)))
        else:
            raise ValueError(f"unknown scaler {s!r}")
    return outs


class PNATower(nn.Module):
    """One PNA tower: edge pretrans MLP -> aggregators x scalers -> posttrans
    (reference: GraphPrediction/layers/pna_layer.py:16-81)."""
    features: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    avg_d_log: float
    dropout: float = 0.0
    graph_norm: bool = True
    batch_norm: bool = True
    edge_features: bool = False
    pretrans_layers: int = 1
    posttrans_layers: int = 1

    @nn.compact
    def __call__(self, gb, h, e, snorm_n=None, training: bool = True):
        in_dim = h.shape[-1]
        h_src = src_features(h, gb)
        if self.edge_features:
            z = jnp.concatenate([h_src[gb.senders], h[gb.receivers], e],
                                axis=-1)
        else:
            z = jnp.concatenate([h_src[gb.senders], h[gb.receivers]], axis=-1)
        msg = MLP(hidden=in_dim, out=in_dim, num_layers=self.pretrans_layers,
                  activation="relu", dropout=0.0, name="pretrans")(
                      z, training=training)
        aggs, deg = pna_aggregate(msg, gb, self.aggregators)
        hcat = jnp.concatenate(aggs, axis=-1)
        hcat = jnp.concatenate(
            pna_scale(hcat, deg, self.avg_d_log, self.scalers), axis=-1)
        hcat = jnp.concatenate([h, hcat], axis=-1)
        out = MLP(hidden=self.features, out=self.features,
                  num_layers=self.posttrans_layers, activation="relu",
                  name="posttrans")(hcat, training=training)
        if self.graph_norm and snorm_n is not None:
            out = out * snorm_n
        if self.batch_norm:
            out = MaskedBatchNorm(self.features, name="bn")(
                out, mask=gb.node_mask, training=training)
        return nn.Dropout(self.dropout, deterministic=not training)(out)


class PNALayer(nn.Module):
    """Tower-split PNA layer with mixing FC (reference:
    GraphPrediction/layers/pna_layer.py:84-158)."""
    features: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    avg_d_log: float
    towers: int = 1
    dropout: float = 0.0
    graph_norm: bool = True
    batch_norm: bool = True
    residual: bool = False
    edge_features: bool = False
    divide_input: bool = True
    pretrans_layers: int = 1
    posttrans_layers: int = 1

    @nn.compact
    def __call__(self, gb, h, e, snorm_n=None, training: bool = True):
        h_in = h
        in_dim = h.shape[-1]
        tower_in = in_dim // self.towers if self.divide_input else in_dim
        tower_out = self.features // self.towers
        outs = []
        for t in range(self.towers):
            ht = (h[:, t * tower_in:(t + 1) * tower_in]
                  if self.divide_input else h)
            outs.append(PNATower(
                tower_out, self.aggregators, self.scalers, self.avg_d_log,
                dropout=self.dropout, graph_norm=self.graph_norm,
                batch_norm=self.batch_norm, edge_features=self.edge_features,
                pretrans_layers=self.pretrans_layers,
                posttrans_layers=self.posttrans_layers,
                name=f"tower_{t}")(gb, ht, e, snorm_n, training=training))
        out = jnp.concatenate(outs, axis=-1)
        out = Linear(self.features, name="mixing")(out)
        out = nn.leaky_relu(out, negative_slope=0.01)
        if self.residual and h_in.shape == out.shape:
            out = h_in + out
        return out


class PNANoTowersLayer(nn.Module):
    """Towerless PNA / DGN-style layer (reference:
    GraphPrediction/layers/pna_layer.py:168-269).

    Reference quirks preserved: the pretrans edge MLP runs only when
    `edge_features`; without edge features the mailbox holds raw neighbor
    features and posttrans sees only the aggregations (no [h, agg] concat);
    scalers apply only when more than one is configured (pna_layer.py:226);
    graph-norm applies only when `edge_features` (pna_layer.py:249-251).
    """
    features: int
    aggregators: Sequence[str]
    scalers: Sequence[str]
    avg_d_log: float
    dropout: float = 0.0
    graph_norm: bool = True
    batch_norm: bool = True
    residual: bool = True
    edge_features: bool = False
    pretrans_layers: int = 1
    posttrans_layers: int = 1

    @nn.compact
    def __call__(self, gb, h, e, snorm_n=None, training: bool = True):
        in_dim = h.shape[-1]
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
        h_in = h
        h_src = src_features(h, gb)
        if self.edge_features:
            z = jnp.concatenate([h_src[gb.senders], h[gb.receivers], e],
                                axis=-1)
            msg = MLP(hidden=in_dim, out=in_dim,
                      num_layers=self.pretrans_layers, activation="relu",
                      name="pretrans_h")(z, training=training)
        else:
            msg = h_src[gb.senders]
        aggs, deg = pna_aggregate(msg, gb, self.aggregators)
        hcat = jnp.concatenate(aggs, axis=-1)
        if len(self.scalers) > 1:
            hcat = jnp.concatenate(
                pna_scale(hcat, deg, self.avg_d_log, self.scalers), axis=-1)
        if self.edge_features:
            hcat = jnp.concatenate([h, hcat], axis=-1)
        out = MLP(hidden=self.features, out=self.features,
                  num_layers=self.posttrans_layers, activation="relu",
                  name="posttrans_h")(hcat, training=training)
        if self.graph_norm and self.edge_features and snorm_n is not None:
            out = out * snorm_n
        if self.batch_norm:
            out = MaskedBatchNorm(self.features, name="bn_h")(
                out, mask=gb.node_mask, training=training)
        out = nn.relu(out)
        if self.residual and h_in.shape == out.shape:
            out = h_in + out
        return out


class SimplifiedPNAConv(nn.Module):
    """PyG-style simplified PNA: pretrans on [x_i, x_j, e], multi-aggregator
    scatter, degree embedding, posttrans on [x, aggs, deg_emb] (reference:
    Alchemy/sign_net/model_utils/pyg_gnn_wrapper.py:50-103)."""
    features: int
    aggregators: Sequence[str] = ("mean",)
    max_degree: int = 13

    @nn.compact
    def __call__(self, gb, x, edge_attr=None, training: bool = True):
        from ..nn.init import Embedding
        nin = x.shape[-1]
        x_src = src_features(x, gb)
        if edge_attr is not None:
            z = jnp.concatenate([x[gb.receivers], x_src[gb.senders],
                                 edge_attr], -1)
        else:
            z = jnp.concatenate([x[gb.receivers], x_src[gb.senders]], -1)
        msg = ElementsMLP(nin, num_layers=2, with_final_activation=False,
                          name="pre_nn")(z, training=training)
        aggs, _ = pna_aggregate(msg, gb, self.aggregators)
        deg = seg.segment_sum(gb.edge_mask, gb.receivers, gb.num_nodes)
        deg_emb = Embedding(self.max_degree, nin, name="deg_embedder")(
            jnp.clip(deg.astype(jnp.int32), 0, self.max_degree - 1))
        out = jnp.concatenate([x] + aggs + [deg_emb], axis=-1)
        return ElementsMLP(self.features, num_layers=2,
                           with_final_activation=False,
                           name="post_nn")(out, training=training)


class GraphTransformerAttention(nn.Module):
    """Sparse edge-score attention: SDDMM scores + clamped-exp segment softmax
    + SpMM value aggregation, with optional edge-feature modulation and the
    full-graph real/fake-edge gamma mix (reference:
    GraphPrediction/layers/transformer.py:14-228)."""
    out_dim: int           # per-head dim
    num_heads: int
    use_edge: bool = False
    full_graph: bool = False
    use_bias: bool = False

    @nn.compact
    def __call__(self, gb, h, e, training: bool = True):
        del training
        H, D = self.num_heads, self.out_dim
        N = gb.num_nodes

        mods = {}

        def proj(name, v):
            if name not in mods:
                mods[name] = Linear(H * D, use_bias=self.use_bias, name=name)
            return mods[name](v).reshape(-1, H, D)

        Qh, Kh, Vh = proj("Q", h), proj("K", h), proj("V", h)

        halo_h = None
        if "mp_send_idx" in gb.extras:
            # model-parallel shard: ship boundary h rows once, project them
            # through the same K/V (and K_2) maps, and append so the sender
            # gathers below read augmented indices (>= shard_n -> halo
            # block).  The softmax needs no collective: edges are
            # dst-partitioned, so every in-edge of a local node is local;
            # the partitioner's halo covers fake full-graph edges too since
            # it is built from the actual edge list.  (mp_halo.py design.)
            from ..parallel.mp_halo import mp_exchange
            halo_h = mp_exchange(h, gb.extras["mp_send_idx"])
            Kh = jnp.concatenate([Kh, proj("K", halo_h)], axis=0)
            Vh = jnp.concatenate([Vh, proj("V", halo_h)], axis=0)

        # Fused Pallas path: SDDMM + clamped-exp segment softmax + SpMM in
        # one kernel (ops/pallas_attention), available for tile-local batches
        # on the sparse (non-full-graph) path.  Engaged under tile_dense too:
        # attention weights are per-edge-per-head so the once-built block
        # adjacency doesn't apply, and the fused kernel wins 2.38x at net
        # level (results/r4/bench_ops.log).
        import jax
        if (seg.get_agg_backend() in ("pallas_tile", "tile_dense")
                and "tile_starts" in gb.extras and not self.full_graph
                and jax.default_backend() != "cpu"):
            from ..ops import edge_softmax_attention_tiled
            E1 = proj("E", e) if self.use_edge else jnp.ones(
                (gb.senders.shape[0], H, D), Qh.dtype)
            bn = gb.num_nodes // gb.extras["tile_starts"].shape[0]
            return edge_softmax_attention_tiled(
                Qh, Kh, Vh, E1, gb.senders, gb.receivers,
                gb.edge_mask, gb.extras["tile_starts"],
                gb.extras["tile_ends"], gb.num_nodes, bn)

        # score_ij = (K_src * Q_dst) / sqrt(d), per head
        score = Kh[gb.senders] * Qh[gb.receivers] / math.sqrt(D)
        if self.use_edge:
            E1 = proj("E", e)
            if self.full_graph:
                Q2, K2, E2 = proj("Q_2", h), proj("K_2", h), proj("E_2", e)
                if halo_h is not None:
                    K2 = jnp.concatenate([K2, proj("K_2", halo_h)], axis=0)
                real = gb.extras["edge_real"][:, None, None]
                score2 = K2[gb.senders] * Q2[gb.receivers] / math.sqrt(D)
                score = jnp.where(real > 0, score * E1, score2 * E2)
            else:
                score = score * E1

        s = jnp.exp(jnp.clip(score.sum(-1, keepdims=True), -5.0, 5.0))
        if self.full_graph:
            gamma = jnp.clip(self.param("gamma",
                                        lambda *_: jnp.full((), 0.1)), 0.0, 1.0)
            real = gb.extras["edge_real"][:, None, None]
            s = jnp.where(real > 0, s / (gamma + 1.0), gamma * s / (gamma + 1.0))
        s = s * gb.edge_mask[:, None, None]

        wV = seg.segment_sum(s * Vh[gb.senders], gb.receivers, N)
        z = seg.segment_sum(s, gb.receivers, N)
        return wV / (z + 1e-6)


class GraphTransformerLayer(nn.Module):
    """Attention + O-proj + FFN block with BN/LN + residuals (reference:
    GraphPrediction/layers/transformer.py:231-317)."""
    features: int
    num_heads: int
    dropout: float = 0.0
    layer_norm: bool = False
    batch_norm: bool = True
    residual: bool = True
    use_bias: bool = False
    use_edge: bool = False
    full_graph: bool = False

    @nn.compact
    def __call__(self, gb, h, e, training: bool = True):
        from ..nn.norm import MaskedLayerNorm
        h_in1 = h
        attn = GraphTransformerAttention(
            self.features // self.num_heads, self.num_heads,
            use_edge=self.use_edge, full_graph=self.full_graph,
            use_bias=self.use_bias, name="attention")(gb, h, e,
                                                      training=training)
        h = attn.reshape(-1, self.features)
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
        h = Linear(self.features, name="O_h")(h)
        if self.residual:
            h = h_in1 + h
        if self.layer_norm:
            h = MaskedLayerNorm(self.features, name="ln1")(h, mask=gb.node_mask)
        if self.batch_norm:
            h = MaskedBatchNorm(self.features, name="bn1")(
                h, mask=gb.node_mask, training=training)
        h_in2 = h
        h = Linear(self.features * 2, name="ffn1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
        h = Linear(self.features, name="ffn2")(h)
        if self.residual:
            h = h_in2 + h
        if self.layer_norm:
            h = MaskedLayerNorm(self.features, name="ln2")(h, mask=gb.node_mask)
        if self.batch_norm:
            h = MaskedBatchNorm(self.features, name="bn2")(
                h, mask=gb.node_mask, training=training)
        return h
