"""SignNet — sign-invariant positional encoders.

f(v_1..v_k) = rho([phi(v_i) + phi(-v_i)]_i), with phi a GNN over the graph
and rho a set aggregator over the k axis.  Covers all reference variants:

- `SignNet` (+ `GNN3d` phi, SetTransformer rho, eigenvalue encoder) — the
  Alchemy/GINESignNetPyG module (reference: Alchemy/sign_net/sign_net.py).
- `GINDeepSigns` / `GCNDeepSigns` (fixed-k, flatten rho MLP) and
  `MaskedGINDeepSigns` (variable-k, sum over k) — the DGL modules (reference:
  GraphPrediction/layers/deepsigns.py).
- `SignPlus` — the generic phi(v) + phi(-v) wrapper (reference:
  LearningFilters/signbasisnet.py:11-20).

TPU-first layout: eigvec channels live on axis 1 of x [N, K, D]; message
passing gathers/segments on axis 0 with K riding along, so one conv call
covers all k eigenvectors (replacing GNN3d's k-as-batch transpose trick,
reference: Alchemy/sign_net/sign_net.py:28-44).  The +-v pair is fused by
concatenation along K into a single phi call: batched matmuls twice as large
for the MXU, and the joint BN statistics are symmetric under sign flips, so
sign invariance is exact even with batch-mode normalization.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..graph import segment as seg
from ..nn.init import Linear
from ..nn.mlp import MLP, MaskedMLP
from ..nn.norm import MaskedBatchNorm
from ..nn.encoders import DiscreteEncoder
from ..nn.set_transformer import SetTransformer
from .conv import GCNConv, GINConv, MaskedGINConv, MaskedGINEConv


def sign_fuse(x, mask=None):
    """Stack (+x, -x) along the k axis (-2 of x, -1 of mask) -> one phi call.
    Works for flat [N, K, D] and dense [G, M, K, D] layouts."""
    x2 = jnp.concatenate([x, -x], axis=-2)
    m2 = None if mask is None else jnp.concatenate([mask, mask], axis=-1)
    return x2, m2


def sign_unfuse(y):
    k = y.shape[-2] // 2
    return y[..., :k, :] + y[..., k:, :]


class GNN3d(nn.Module):
    """Stack of masked GIN(E) convs over x: [N, K, D] with mask [N, K]
    (reference: Alchemy/sign_net/sign_net.py:12-44; gnn_type selection and
    per-layer edge encoders: GINESignNetPyG/core/sign_net.py:18-40 — the
    reference creates DiscreteEncoders but passes raw edge_attr with the
    encoded path commented out; we encode, which is the functional form)."""
    n_out: int
    n_layer: int
    gnn_type: str = "MaskedGINConv"
    edge_vocab: int = 500

    @nn.compact
    def __call__(self, gb, x, mask=None, training: bool = True):
        if self.gnn_type not in ("MaskedGINConv", "MaskedGINEConv"):
            # the reference's getattr(masked_layers, gnn_type) raises on a
            # typo; a silent fallback would train without edge features
            raise ValueError(f"unsupported GNN3d gnn_type {self.gnn_type!r}")
        prev = 0.0
        for i in range(self.n_layer):
            if self.gnn_type == "MaskedGINEConv":
                e = DiscreteEncoder(self.n_out,
                                    max_num_values=self.edge_vocab,
                                    name=f"edge_enc_{i}")(
                    gb.edge_feat, training=training)
                x = MaskedGINEConv(self.n_out, hidden=self.n_out,
                                   name=f"conv_{i}")(gb, x, e, mask=mask,
                                                     training=training)
            else:
                x = MaskedGINConv(self.n_out, hidden=self.n_out,
                                  name=f"conv_{i}")(gb, x, mask=mask,
                                                    training=training)
            if mask is not None:
                x = x * mask[..., None]
            x = MaskedBatchNorm(self.n_out, name=f"norm_{i}")(
                x, mask=mask, training=training)
            x = nn.relu(x)
            x = x + prev
            prev = x
        return x


class SignNet(nn.Module):
    """[N, K] eigvec entries -> [N, n_hid] sign-invariant PE
    (reference: Alchemy/sign_net/sign_net.py:74-118)."""
    n_hid: int
    nl_phi: int
    nl_rho: int = 2
    ignore_eigval: bool = False
    phi_gnn_type: str = "MaskedGINConv"
    edge_vocab: int = 500

    @nn.compact
    def __call__(self, gb, training: bool = True):
        x = gb.eigvecs[..., None]                  # N K 1
        mask = gb.eig_mask                         # N K
        if not self.ignore_eigval:
            eigval_rows = gb.eigvals[gb.graph_id]  # N K
            pos = MaskedMLP(self.n_hid, num_layers=2, name="eigen_encoder")(
                eigval_rows[..., None], mask=mask, training=training)
        else:
            pos = 0.0
        x2, m2 = sign_fuse(x, mask)
        y = GNN3d(self.n_hid, self.nl_phi, gnn_type=self.phi_gnn_type,
                  edge_vocab=self.edge_vocab,
                  name="phi")(gb, x2, mask=m2, training=training)
        x = sign_unfuse(y)
        x = SetTransformer(self.n_hid, self.nl_rho, name="rho")(
            x, pos, mask=mask, training=training)
        return x


class SignPlus(nn.Module):
    """phi(v) + phi(-v) for an arbitrary inner module; optional non-negated
    extra features are concatenated before phi (reference:
    LearningFilters/signbasisnet.py:11-20)."""
    model: nn.Module

    @nn.compact
    def __call__(self, v, x=None, training: bool = True):
        if x is None:
            return (self.model(v, training=training)
                    + self.model(-v, training=training))
        return (self.model(jnp.concatenate([v, x], -1), training=training)
                + self.model(jnp.concatenate([-v, x], -1), training=training))


class _KChannelGNN(nn.Module):
    """GIN, GCN, or GAT phi over [N, K, D] x (the DGL k-channel encoders,
    reference: GraphPrediction/layers/gnns.py:15-114).  BN inside the MLPs
    normalizes per-feature over all N*K slots, matching the reference's 3-D
    BN path.  The GAT variant keeps [N, K, D] shape by averaging heads (the
    reference's GAT phi stacks DGL GATConvs without flattening the heads axis,
    gnns.py:48-79, which grows tensor rank per layer and cannot run as
    written; head-mean is the shape-preserving completion of its intent)."""
    kind: str
    hidden: int
    out: int
    n_layers: int
    use_bn: bool = True
    dropout: float = 0.0
    activation: str = "relu"
    num_heads: int = 4

    @nn.compact
    def __call__(self, gb, x, training: bool = True):
        from .conv import node_mask_like
        for i in range(self.n_layers):
            if i != 0:
                x = nn.Dropout(self.dropout, deterministic=not training)(x)
                if self.use_bn:
                    x = MaskedBatchNorm(x.shape[-1], name=f"bn_{i - 1}")(
                        x, mask=node_mask_like(gb, x), training=training)
            feats = self.out if i == self.n_layers - 1 else self.hidden
            if self.kind == "gin":
                update = MLP(hidden=self.hidden, out=feats, num_layers=2,
                             use_bn=self.use_bn, dropout=self.dropout,
                             activation=self.activation, name=f"mlp_{i}")
                x = GINConv(update, learn_eps=False,
                            name=f"conv_{i}")(gb, x, training=training)
            elif self.kind == "gcn":
                act = self.activation if i < self.n_layers - 1 else None
                x = GCNConv(feats, add_self_loops=False, activation=act,
                            name=f"conv_{i}")(gb, x, training=training)
            elif self.kind == "gat":
                from .conv import GATConv
                act = self.activation if i < self.n_layers - 1 else None
                x = GATConv(feats, num_heads=self.num_heads, concat=False,
                            add_self_loops=False, activation=act,
                            name=f"conv_{i}")(gb, x, training=training)
            else:
                raise ValueError(self.kind)
        return x


class GINDeepSigns(nn.Module):
    """Fixed-k DeepSigns: phi over k channels, flatten, rho MLP -> [N, K]
    (reference: GraphPrediction/layers/deepsigns.py:33-51)."""
    hidden: int
    phi_out: int
    num_layers: int
    k: int
    kind: str = "gin"
    use_bn: bool = False
    dropout: float = 0.5
    activation: str = "relu"

    @nn.compact
    def __call__(self, gb, eigvecs, training: bool = True):
        x = eigvecs[..., None]                         # N K 1
        enc = _KChannelGNN(self.kind, self.hidden, self.phi_out,
                           self.num_layers, use_bn=self.use_bn,
                           dropout=self.dropout, activation=self.activation,
                           name="enc")
        x2, _ = sign_fuse(x)
        x = sign_unfuse(enc(gb, x2, training=training))  # [..., K, phi_out]
        x = x.reshape(x.shape[:-2] + (-1,))
        x = MLP(hidden=self.hidden, out=self.k, num_layers=self.num_layers,
                use_bn=self.use_bn, dropout=self.dropout,
                activation=self.activation, name="rho")(x, training=training)
        return x                                        # [..., K]


class MaskedGINDeepSigns(nn.Module):
    """Variable-k DeepSigns: mask eig slots i >= n_g, sum over k, rho MLP
    (reference: GraphPrediction/layers/deepsigns.py:54-86)."""
    hidden: int
    phi_out: int
    num_layers: int
    k: int
    use_bn: bool = False
    dropout: float = 0.5
    activation: str = "relu"

    @nn.compact
    def __call__(self, gb, eigvecs, training: bool = True):
        x = eigvecs[..., None]
        enc = _KChannelGNN("gin", self.hidden, self.phi_out, self.num_layers,
                           use_bn=self.use_bn, dropout=self.dropout,
                           activation=self.activation, name="enc")
        x2, _ = sign_fuse(x)
        x = sign_unfuse(enc(gb, x2, training=training))  # [..., K, phi_out]
        K = x.shape[-2]
        n_per_node = gb.nodes_per_graph()               # [N] or [G, M]
        kmask = (jnp.arange(K) < n_per_node[..., None]).astype(x.dtype)
        x = (x * kmask[..., None]).sum(axis=-2)         # [..., phi_out]
        x = MLP(hidden=self.hidden, out=self.k, num_layers=self.num_layers,
                use_bn=self.use_bn, dropout=self.dropout,
                activation=self.activation, name="rho")(x, training=training)
        return x


GCNDeepSigns = lambda **kw: GINDeepSigns(kind="gcn", **kw)  # noqa: E731


class TransformerDeepSigns(nn.Module):
    """phi = set-transformer encoder over each graph's node set, applied per
    eigenvector; rho = flatten + MLP (reference:
    GraphPrediction/layers/deepsigns.py:89-119, DGL SetTransformerEncoder).

    Runs in the dense per-graph layout [G, n_max, ...]: the k eigvec channels
    and the +-v pair fold into the attention batch axis, so the whole phi is
    a handful of big batched MXU matmuls.
    """
    hidden: int
    num_layers: int
    k: int
    n_max: int
    num_heads: int = 2
    use_bn: bool = False
    dropout: float = 0.0
    activation: str = "relu"

    @nn.compact
    def __call__(self, gb, eigvecs, training: bool = True):
        from ..graph.batch import from_dense_nodes, to_dense_nodes
        from ..nn.set_transformer import TransformerEncoderLayer

        n = eigvecs.shape[0]
        embed = Linear(self.hidden, name="embed")   # shared for +-v
        x_plus = embed(eigvecs[..., None])          # N K H
        x_minus = embed(-eigvecs[..., None])

        dense_p, mask = to_dense_nodes(gb, x_plus, self.n_max)  # G M K H
        dense_n, _ = to_dense_nodes(gb, x_minus, self.n_max)

        G, Mx = dense_p.shape[:2]

        def fold(d):  # G M K H -> (K G) M H
            return jnp.moveaxis(d, 2, 0).reshape(self.k * G, Mx, self.hidden)

        h = jnp.concatenate([fold(dense_p), fold(dense_n)], axis=0)
        m = jnp.tile(mask[None], (self.k, 1, 1)).reshape(self.k * G, Mx)
        m = jnp.concatenate([m, m], axis=0)
        for i in range(self.num_layers):
            h = TransformerEncoderLayer(self.hidden, n_head=self.num_heads,
                                        name=f"sab_{i}")(h, mask=m,
                                                         training=training)
        h = h[:self.k * G] + h[self.k * G:]
        h = h.reshape(self.k, G, Mx, self.hidden)
        h = jnp.moveaxis(h, 0, 2)                              # G M K H
        flat = from_dense_nodes(gb, h)                         # N K H
        flat = flat.reshape(n, -1)
        out = MLP(hidden=self.hidden, out=self.k, num_layers=4,
                  use_bn=self.use_bn, dropout=self.dropout,
                  activation=self.activation, name="rho")(flat,
                                                          training=training)
        return out
