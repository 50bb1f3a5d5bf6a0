"""PyG-style GNN backbone and the SignNetGNN composition.

`GNN`: DiscreteEncoder input, per-layer edge encoders, conv stack with
BN+ReLU+dropout+residual, add/mean pooling, MLP output head (reference:
Alchemy/sign_net/model.py:9-64; GINESignNetPyG/core/model.py adds a size
embedder — exposed here via `use_size_embedder`).

`SignNetGNN`: pos = SignNet(batch); out = GNN(batch, additional_x=pos)
(reference: Alchemy/sign_net/sign_net.py:120-132).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..graph import segment as seg
from ..nn.encoders import DiscreteEncoder
from ..nn.init import Embedding, Linear
from ..nn.mlp import ElementsMLP
from ..nn.norm import MaskedBatchNorm
from .conv import GATConv, GCNConv, GINConv, GINEConv, SimplifiedPNAConv
from .signnet import SignNet


def make_conv(gnn_type: str, nhid: int, name: str, use_bias: bool):
    """Uniform (gb, x, edge_attr) conv registry (reference:
    Alchemy/sign_net/model_utils/pyg_gnn_wrapper.py)."""
    if gnn_type == "GINConv":
        update = ElementsMLP(nhid, num_layers=2, with_final_activation=False,
                             with_norm=False, bias=use_bias, name=f"{name}_nn")
        return GINConv(update, learn_eps=True, name=name)
    if gnn_type == "GINEConv":
        update = ElementsMLP(nhid, num_layers=2, with_final_activation=False,
                             bias=use_bias, name=f"{name}_nn")
        return GINEConv(update, learn_eps=True, name=name)
    if gnn_type == "GCNConv":
        return GCNConv(nhid, add_self_loops=True, name=name)
    if gnn_type == "GATConv":
        return GATConv(nhid, num_heads=1, add_self_loops=True, name=name)
    if gnn_type == "SimplifiedPNAConv":
        return SimplifiedPNAConv(nhid, name=name)
    raise ValueError(f"unknown gnn_type {gnn_type!r}")


class GNN(nn.Module):
    nhid: int
    nout: int
    nlayer: int
    gnn_type: str = "GINEConv"
    dropout: float = 0.0
    pooling: str = "add"
    res: bool = True
    bn: bool = True
    nfeat_node: Optional[int] = None   # None -> discrete codes
    nfeat_edge: Optional[int] = None
    node_vocab: int = 100
    edge_vocab: int = 100
    use_size_embedder: bool = False
    dos_bins: int = 0    # (L)DOS features (reference: core/model.py:11-29,
    #                      125-131): node-level pdos concat + graph-level dos

    @nn.compact
    def __call__(self, gb, additional_x=None, training: bool = True):
        nin = self.nhid - self.dos_bins
        if self.nfeat_node is None:
            x = DiscreteEncoder(nin, max_num_values=self.node_vocab,
                                name="input_encoder")(gb.node_feat)
        else:
            x = ElementsMLP(nin, num_layers=1,
                            name="input_encoder")(
                gb.node_feat.astype(jnp.float32), training=training)
        if self.dos_bins > 0:
            x = jnp.concatenate([x, gb.extras["pdos"]], axis=-1)
        if additional_x is not None:
            x = Linear(self.nhid, name="merge")(
                jnp.concatenate([x, additional_x], axis=-1))

        edge_codes = (gb.edge_feat if gb.edge_feat is not None
                      else jnp.zeros((gb.num_edges,), jnp.int32))

        prev = x
        for i in range(self.nlayer):
            if self.nfeat_edge is None:
                e = DiscreteEncoder(self.nhid, max_num_values=self.edge_vocab,
                                    name=f"edge_encoder_{i}")(edge_codes)
            else:
                e = ElementsMLP(self.nhid, num_layers=1,
                                name=f"edge_encoder_{i}")(
                    edge_codes.astype(jnp.float32), training=training)
            conv = make_conv(self.gnn_type, self.nhid, f"conv_{i}",
                             use_bias=not self.bn)
            x = conv(gb, x, e, training=training)
            if self.bn:
                x = MaskedBatchNorm(self.nhid, name=f"norm_{i}")(
                    x, mask=gb.node_mask, training=training)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
            if self.res:
                x = x + prev
                prev = x

        from .conv import pool_any
        if self.pooling == "mean":
            hg = pool_any(gb, x, reduce="mean")
            if self.use_size_embedder:
                hg = hg + Embedding(200, self.nhid, name="size_embedder")(
                    jnp.clip(gb.n_node, 0, 199))
        else:
            hg = pool_any(gb, x, reduce="sum")
        if self.dos_bins > 0:
            hg = hg + ElementsMLP(self.nhid, num_layers=2,
                                  with_final_activation=False,
                                  name="dos_encoder")(
                gb.extras["dos"], training=training)
        out = ElementsMLP(self.nout, num_layers=2, with_final_activation=False,
                          with_norm=(self.pooling != "mean"),
                          name="output_encoder")(hg, training=training)
        return out


class SignNetGNN(nn.Module):
    """SignNet PE + base GNN (reference: Alchemy/sign_net/sign_net.py:120-132;
    the GINESignNetPyG variant fixes ignore_eigval=True, nl_rho=1)."""
    n_hid: int
    n_out: int
    nl_signnet: int
    nl_gnn: int
    nl_rho: int = 4
    ignore_eigval: bool = False
    gnn_type: str = "GINEConv"
    phi_gnn_type: str = "MaskedGINConv"
    node_vocab: int = 100
    edge_vocab: int = 100

    @nn.compact
    def __call__(self, gb, training: bool = True):
        pos = SignNet(self.n_hid, self.nl_signnet, nl_rho=self.nl_rho,
                      ignore_eigval=self.ignore_eigval,
                      phi_gnn_type=self.phi_gnn_type,
                      edge_vocab=self.edge_vocab,
                      name="sign_net")(gb, training=training)
        return GNN(self.n_hid, self.n_out, self.nl_gnn,
                   gnn_type=self.gnn_type, node_vocab=self.node_vocab,
                   edge_vocab=self.edge_vocab,
                   name="gnn")(gb, additional_x=pos, training=training)
