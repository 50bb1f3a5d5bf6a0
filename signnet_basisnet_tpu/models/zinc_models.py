"""ZINC graph-regression nets (the DGL-style model family).

Each net follows the reference pattern (atom/bond embeddings, PE merge,
conv stack, readout, MLP head) with signature
``apply(gb, pos_enc) -> [G] scores`` (reference:
GraphPrediction/nets/ZINC_graph_regression/{gin,gatedgcn,gat,pna,transformer}_net.py).

PE handling: `pe_init` in {none, lap_pe, rand_walk}; `lap_method` selects the
sign treatment, with `sign_inv` owning a DeepSigns submodule exactly like the
reference nets do.  The LSPE branch (learned positional updates + Laplacian
auxiliary loss) is implemented for GatedGCN/GIN via `use_lspe`.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..graph import segment as seg
from ..nn.init import Embedding, Linear
from ..nn.mlp import MLP, MLPReadout
from .conv import (GatedGCNLayer, GatedGCNLSPELayer, GATConv, GINConv,
                   GraphTransformerLayer, PNALayer, PNANoTowersLayer)
from .signnet import GINDeepSigns, MaskedGINDeepSigns, TransformerDeepSigns


def lapeig_loss(gb, p):
    """Laplacian-eigenvector auxiliary loss for LSPE:
    trace(p^T L p) and ||P^T P - I||_F^2 per graph, batched device-side
    (reference computed these on host with scipy block_diag,
    GraphPrediction/nets/ZINC_graph_regression/gin_net.py:140-174).

    Returns (trace_term, ortho_term); caller combines as
    (tr + lambda * ortho) / (k * batch_size * n).
    """
    deg = jnp.clip(gb.in_degrees(), 1.0, None)
    dis = deg ** -0.5
    # trace(p^T L p) = sum_i |p_i|^2 - sum_e p_s.p_r / sqrt(d_s d_r)
    tr = (p ** 2 * gb.node_mask[:, None]).sum()
    cross = ((p[gb.senders] * p[gb.receivers]).sum(-1)
             * dis[gb.senders] * dis[gb.receivers] * gb.edge_mask).sum()
    trace_term = tr - cross
    # per-graph P^T P (outer products segment-summed over nodes)
    outer = p[:, :, None] * p[:, None, :] * gb.node_mask[:, None, None]
    ptp = seg.segment_sum(outer, gb.graph_id, gb.num_graphs)   # G K K
    eye = jnp.eye(p.shape[1])[None]
    ortho = (((ptp - eye) ** 2).sum((-2, -1)) * gb.graph_mask).sum()
    return trace_term, ortho


def normalize_p(gb, p):
    """LSPE positional post-processing: center per graph, then divide by the
    per-graph column L2 norm (reference: gin_net.py:105-120).  Pooling goes
    through pool_any so per-graph statistics are psum-combined when the
    batch is mp-sharded (graphs may straddle shard boundaries)."""
    from .conv import pool_any
    means = pool_any(gb, p, reduce="mean")
    p = (p - means[gb.graph_id]) * gb.node_mask[:, None]
    # eps inside the sqrt: padding graphs have all-zero p and d/dp sqrt(0)
    # is NaN, which would poison the whole gradient
    norms = jnp.sqrt(pool_any(gb, p ** 2 * gb.node_mask[:, None],
                              reduce="sum") + 1e-12)
    return p / norms[gb.graph_id]


class _Base(nn.Module):
    """Shared config for ZINC nets."""
    num_atom_type: int = 28
    num_bond_type: int = 4
    hidden_dim: int = 95
    out_dim: int = 95
    n_layers: int = 16
    readout: str = "mean"
    in_feat_dropout: float = 0.0
    dropout: float = 0.0
    batch_norm: bool = True
    residual: bool = True
    edge_feat: bool = True
    pe_init: str = "lap_pe"           # none | lap_pe | rand_walk
    lap_method: str = "none"          # none|sign_flip|abs_val|canonical|sign_inv
    pos_enc_dim: int = 8
    sign_inv_net: str = "gin"         # gin | gcn | masked_gin
    sign_inv_layers: int = 8
    phi_out_dim: int = 4
    pe_aggregate: str = "add"         # add | concat
    use_lspe: bool = False
    max_nodes: int = 40               # dense n_max for the transformer phi
    remat: bool = False               # rematerialize each conv layer
    #   (jax.checkpoint: trade recompute for activation memory on deep
    #    stacks / huge batched graphs)

    def sign_inv_module(self):
        """sign_inv_net factory (reference:
        GraphPrediction/nets/ZINC_graph_regression/sign_inv_net.py:3-17)."""
        if self.sign_inv_net == "transformer":
            return TransformerDeepSigns(
                hidden=self.hidden_dim, num_layers=min(self.sign_inv_layers, 4),
                k=self.pos_enc_dim, n_max=self.max_nodes, name="sign_inv_net")
        # use_bn=True always: the reference hardcodes it for every sign_inv
        # variant (sign_inv_net.py:8-14) and it is load-bearing — without BN
        # the 8-layer sum-aggregation phi produces unbounded activations
        # (~1e8 on outlier batches), which transiently poison the base net's
        # BN running stats and caused the r2 val-MAE spikes (results/r3/
        # probe_spike.log: max running var 1e16 by epoch 20 without phi BN).
        kw = dict(hidden=self.hidden_dim, phi_out=self.phi_out_dim,
                  num_layers=self.sign_inv_layers, k=self.pos_enc_dim,
                  use_bn=True, dropout=self.dropout, name="sign_inv_net")
        if self.sign_inv_net == "masked_gin":
            return MaskedGINDeepSigns(**kw)
        if self.sign_inv_net not in ("gin", "gcn", "gat"):
            raise ValueError(f"unknown sign_inv_net {self.sign_inv_net!r}")
        return GINDeepSigns(kind=self.sign_inv_net, **kw)

    def embed_inputs(self, gb, pos_enc, training):
        from ..graph.dense import DenseGraphBatch
        dense = isinstance(gb, DenseGraphBatch)
        node_codes = gb.node_feat.astype(jnp.int32)
        # scalar atom codes: [N] flat, [G, M] dense; drop a trailing
        # feature column if present
        if node_codes.ndim == 2 and not dense:
            node_codes = node_codes[:, 0]
        if node_codes.ndim == 3:
            node_codes = node_codes[..., 0]
        h = Embedding(self.num_atom_type, self.hidden_dim,
                      name="embedding_h")(node_codes)
        h = nn.Dropout(self.in_feat_dropout, deterministic=not training)(h)
        p = None
        if self.pe_init in ("lap_pe", "rand_walk") and pos_enc is not None:
            if self.pe_init == "lap_pe" and self.lap_method == "sign_inv":
                pos_enc = self.sign_inv_module()(gb, pos_enc, training=training)
            p = Linear(self.hidden_dim, name="embedding_p")(pos_enc)
        if self.pe_init == "lap_pe" and p is not None and not self.use_lspe:
            if self.pe_aggregate == "concat":
                h = Linear(self.hidden_dim, name="embedding_hp")(
                    jnp.concatenate([h, p], axis=-1))
            else:
                h = h + p
            p = None
        if self.edge_feat:
            e = Embedding(self.num_bond_type, self.hidden_dim,
                          name="embedding_e")(
                              gb.edge_feat.astype(jnp.int32))
        elif dense:
            e = Linear(self.hidden_dim, name="embedding_e")(
                jnp.ones(gb.adj.shape + (1,), jnp.float32))
        else:
            e = Linear(self.hidden_dim, name="embedding_e")(
                jnp.ones((gb.num_edges, 1), jnp.float32))
        return h, p, e

    def readout_head(self, gb, h, training):
        from .conv import pool_any
        hg = pool_any(gb, h, reduce=self.readout)
        return MLPReadout(1, name="mlp_readout")(hg, training=training)[:, 0]

    def maybe_remat(self, cls, training_argnum: int):
        """jax.checkpoint around each conv layer when `remat` is set —
        activations recomputed in the backward pass instead of stored
        (deep stacks / huge batched graphs).  `training_argnum` is the
        positional index of the `training` flag in the layer's __call__
        (counting self as 0) — it must stay a static python bool, and the
        call sites pass it positionally."""
        if not self.remat:
            return cls
        return nn.remat(cls, static_argnums=(training_argnum,))


class GatedGCNNet(_Base):
    """reference: GraphPrediction/nets/ZINC_graph_regression/gatedgcn_net.py.

    The ZINC net disables graph-norm in its GatedGCN layers
    (gatedgcn_net.py:69-71).  The LSPE branch runs GatedGCNLSPELayer with
    learned p-channel updates, then the p_out/normalize/Whp merge
    (gatedgcn_net.py:115-133; the reference's LSPE layer class is undefined in
    the repo — see conv.GatedGCNLSPELayer)."""

    @nn.compact
    def __call__(self, gb, pos_enc=None, training: bool = True,
                 return_p: bool = False):
        h, p, e = self.embed_inputs(gb, pos_enc, training)
        lspe = self.use_lspe or self.pe_init == "rand_walk"
        for i in range(self.n_layers):
            out_dim = self.hidden_dim if i < self.n_layers - 1 else self.out_dim
            if lspe and p is not None:
                h, p, e = self.maybe_remat(GatedGCNLSPELayer, 6)(
                    out_dim, dropout=self.dropout,
                    batch_norm=self.batch_norm, residual=self.residual,
                    name=f"layer_{i}")(gb, h, p, e, None, training)
            else:
                h, e = self.maybe_remat(GatedGCNLayer, 5)(
                    out_dim, dropout=self.dropout, batch_norm=self.batch_norm,
                    residual=self.residual, graph_norm=False,
                    name=f"layer_{i}")(gb, h, e, None, training)
        if lspe and p is not None:
            p = Linear(self.pos_enc_dim, name="p_out")(p)
            p = normalize_p(gb, p)
            h = Linear(self.out_dim, name="Whp")(
                jnp.concatenate([h, p], axis=-1))
        out = self.readout_head(gb, h, training)
        if return_p:
            return out, p
        return out


class GINNet(_Base):
    """reference: GraphPrediction/nets/ZINC_graph_regression/gin_net.py
    (LSPE branch incl. p centering/normalization and Whp merge:
    gin_net.py:105-124)."""

    @nn.compact
    def __call__(self, gb, pos_enc=None, training: bool = True,
                 return_p: bool = False):
        h, p, e = self.embed_inputs(gb, pos_enc, training)
        for i in range(self.n_layers):
            out_dim = self.hidden_dim if i < self.n_layers - 1 else self.out_dim
            update = MLP(hidden=self.hidden_dim, out=out_dim, num_layers=2,
                         use_bn=self.batch_norm, dropout=self.dropout,
                         name=f"mlp_{i}")
            h = self.maybe_remat(GINConv, 4)(
                update, learn_eps=False,
                name=f"layer_{i}")(gb, h, None, training)
        if (self.pe_init == "rand_walk" or self.use_lspe) and p is not None:
            p = Linear(self.pos_enc_dim, name="p_out")(p)
            p = normalize_p(gb, p)
            h = Linear(self.out_dim, name="Whp")(
                jnp.concatenate([h, p], axis=-1))
        out = self.readout_head(gb, h, training)
        if return_p:
            return out, p
        return out


class GATNet(_Base):
    """reference: GraphPrediction/nets/ZINC_graph_regression/gat_net.py —
    heads concatenated between layers, single-head final layer."""
    num_heads: int = 8

    @nn.compact
    def __call__(self, gb, pos_enc=None, training: bool = True):
        h, p, e = self.embed_inputs(gb, pos_enc, training)
        head_dim = self.hidden_dim // self.num_heads
        for i in range(self.n_layers - 1):
            h = GATConv(head_dim, num_heads=self.num_heads, concat=True,
                        add_self_loops=False, activation="elu",
                        name=f"layer_{i}")(gb, h, training=training)
        h = GATConv(self.out_dim, num_heads=1, concat=False,
                    add_self_loops=False,
                    name=f"layer_{self.n_layers - 1}")(gb, h, training=training)
        return self.readout_head(gb, h, training)


class PNANet(_Base):
    """reference: GraphPrediction/nets/ZINC_graph_regression/pna_net.py"""
    aggregators: Sequence[str] = ("mean", "max", "min", "std")
    scalers: Sequence[str] = ("identity", "amplification", "attenuation")
    avg_d_log: float = 1.0
    towers: int = 5
    divide_input: bool = True
    graph_norm: bool = True
    pretrans_layers: int = 1
    posttrans_layers: int = 1
    gru: bool = False                 # GRU between layers (pna_net.py:128-132)
    no_towers: bool = False           # PNANoTowersLayer / DGN-style stack

    @nn.compact
    def __call__(self, gb, pos_enc=None, training: bool = True):
        from ..nn.set2set import GRUStep
        h, p, e = self.embed_inputs(gb, pos_enc, training)
        snorm = gb.snorm()
        gru = GRUStep(self.hidden_dim, name="gru") if self.gru else None
        for i in range(self.n_layers):
            if self.no_towers:
                h_t = self.maybe_remat(PNANoTowersLayer, 5)(
                    self.hidden_dim, self.aggregators, self.scalers,
                    self.avg_d_log, dropout=self.dropout,
                    graph_norm=self.graph_norm, batch_norm=self.batch_norm,
                    residual=self.residual, edge_features=self.edge_feat,
                    pretrans_layers=self.pretrans_layers,
                    posttrans_layers=self.posttrans_layers,
                    name=f"layer_{i}")(gb, h, e, snorm, training)
            else:
                h_t = self.maybe_remat(PNALayer, 5)(
                    self.hidden_dim, self.aggregators, self.scalers,
                    self.avg_d_log, towers=self.towers, dropout=self.dropout,
                    graph_norm=self.graph_norm, batch_norm=self.batch_norm,
                    residual=self.residual, edge_features=self.edge_feat,
                    divide_input=self.divide_input,
                    pretrans_layers=self.pretrans_layers,
                    posttrans_layers=self.posttrans_layers,
                    name=f"layer_{i}")(gb, h, e, snorm, training)
            if gru is not None and i != self.n_layers - 1:
                h_t = gru(h, h_t)
            h = h_t
        return self.readout_head(gb, h, training)


class TransformerNet(_Base):
    """reference: GraphPrediction/nets/ZINC_graph_regression/transformer_net.py"""
    num_heads: int = 8
    full_graph: bool = False
    layer_norm: bool = False

    @nn.compact
    def __call__(self, gb, pos_enc=None, training: bool = True):
        h, p, e = self.embed_inputs(gb, pos_enc, training)
        for i in range(self.n_layers):
            h = self.maybe_remat(GraphTransformerLayer, 4)(
                self.hidden_dim, self.num_heads, dropout=self.dropout,
                layer_norm=self.layer_norm, batch_norm=self.batch_norm,
                residual=self.residual, use_edge=self.edge_feat,
                full_graph=self.full_graph,
                name=f"layer_{i}")(gb, h, e, training)
        return self.readout_head(gb, h, training)


MODEL_REGISTRY = {
    "GatedGCN": GatedGCNNet,
    "GIN": GINNet,
    "GAT": GATNet,
    "PNA": PNANet,
    "Transformer": TransformerNet,
}


def gnn_model(name: str, **net_params):
    """Model registry (reference:
    GraphPrediction/nets/ZINC_graph_regression/load_net.py:27-36)."""
    return MODEL_REGISTRY[name](**net_params)
