"""Baseline nets: NetGINE (Alchemy's GINE + Set2Set baseline).

reference: Alchemy/baseline_gin.py:9-61 — custom GINConv whose messages pass
bond features through an MLP, relu(x_j + W e), sum aggregation, eps-weighted
self term, 6 conv layers, Set2Set pooling, 2-layer regression head.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..graph import segment as seg
from ..nn.init import Linear
from ..nn.set2set import Set2Set


class GINEBondConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, gb, x, edge_attr, training: bool = True):
        e = nn.relu(Linear(self.features, name="bond_1")(edge_attr))
        e = Linear(self.features, name="bond_2")(e)
        from .conv import src_features
        msg = nn.relu(src_features(x, gb)[gb.senders] + e)
        agg = seg.aggregate_edges(msg, gb.receivers, gb.num_nodes,
                                  edge_mask=gb.edge_mask)
        eps = self.param("eps", nn.initializers.zeros, ())
        h = (1 + eps) * x + agg
        h = nn.relu(Linear(self.features, name="mlp_1")(h))
        return Linear(self.features, name="mlp_2")(h)


class NetGINE(nn.Module):
    hidden: int = 64
    num_layers: int = 6
    out: int = 12
    edge_dim: int = 4

    @nn.compact
    def __call__(self, gb, training: bool = True):
        x = gb.node_feat.astype(jnp.float32)
        if x.ndim == 1:
            x = x[:, None]
        e = gb.edge_feat.astype(jnp.float32)
        if e.ndim == 1:
            e = jnp.eye(self.edge_dim, dtype=jnp.float32)[
                gb.edge_feat.astype(jnp.int32)]
        x = nn.relu(Linear(self.hidden, name="input")(x))
        for i in range(self.num_layers):
            x = nn.relu(GINEBondConv(self.hidden, name=f"conv_{i}")(
                gb, x, e, training=training))
        hg = Set2Set(self.hidden, processing_steps=6, name="set2set")(
            x, gb.graph_id, gb.num_graphs, gb.node_mask, training=training)
        h = nn.relu(Linear(self.hidden, name="fc1")(hg))
        return Linear(self.out, name="fc4")(h)
