"""Spectral-filter model family (the LearningFilters baselines).

Node-level regression models on a single (batched) graph: MLP, equivariant
DeepSets, Transformer, and the polynomial spectral filters GPRNet / ARMANet /
GcnNet / GatNet / ChebNet / BernNet (reference: LearningFilters/models.py).

Propagation uses explicit edge weights + a separate self-loop term so shapes
stay static (no materialized self-loop edges).
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..graph import segment as seg
from ..nn.deepsets import EqDeepSetsEncoder
from ..nn.init import ACTIVATIONS, Linear
from ..nn.mlp import MLP as _MLP
from .conv import GATConv


def gcn_norm_weights(gb, add_self_loops=True):
    """Edge weights of D^-1/2 (A [+I]) D^-1/2 plus the self-loop diagonal."""
    deg = gb.in_degrees()
    if add_self_loops:
        deg = deg + gb.node_mask
    dis = jnp.where(deg > 0, deg ** -0.5, 0.0)
    w = dis[gb.senders] * dis[gb.receivers] * gb.edge_mask
    self_w = dis * dis * gb.node_mask if add_self_loops else None
    return w, self_w


def propagate(gb, x, w, self_w=None):
    """x' = sum_j w_ij x_j (+ self_w_i x_i)."""
    out = seg.segment_sum(w[:, None] * x[gb.senders], gb.receivers,
                          gb.num_nodes)
    if self_w is not None:
        out = out + self_w[:, None] * x
    return out


class MLPNet(nn.Module):
    """reference: LearningFilters/models.py:18-56 (bn track_running_stats=False)."""
    hidden: int = 32
    out: int = 1
    num_layers: int = 3
    use_bn: bool = False

    @nn.compact
    def __call__(self, gb, x, training: bool = True):
        return _MLP(hidden=self.hidden, out=self.out,
                    num_layers=self.num_layers, use_bn=self.use_bn,
                    bn_track_running_stats=False, dropout=0.0,
                    name="mlp")(x, training=training)


class DeepSetsNet(nn.Module):
    """EqDeepSets over the node axis (reference: models.py:58-113)."""
    hidden: int = 32
    out: int = 1
    num_layers: int = 3
    use_bn: bool = False

    @nn.compact
    def __call__(self, gb, x, training: bool = True):
        return EqDeepSetsEncoder(hidden=self.hidden, out=self.out,
                                 num_layers=self.num_layers,
                                 use_bn=self.use_bn,
                                 name="ds")(x, training=training)


class TransformerNet(nn.Module):
    """Pre-norm torch TransformerEncoderLayer stack over the node axis
    (reference: models.py:115-135; norm_first=True, dim_ff = hidden)."""
    hidden: int = 32
    out: int = 1
    num_layers: int = 2
    num_heads: int = 4

    @nn.compact
    def __call__(self, gb, x, training: bool = True):
        # torch nn.MultiheadAttention init: xavier_uniform_ on the stacked
        # (3d, d) in_proj weight -> bound sqrt(6/(3d+d)) = sqrt(1.5/d);
        # in_proj/out_proj biases zeroed (torch MultiheadAttention
        # ._reset_parameters); LayerNorm eps 1e-5 (torch default).
        import jax as _jax

        def _inproj_init(key, shape, dtype=jnp.float32):
            bound = (1.5 / self.hidden) ** 0.5
            return _jax.random.uniform(key, shape, dtype, -bound, bound)

        x = Linear(self.hidden, name="fc1")(x)
        squeeze = x.ndim == 2
        if squeeze:
            x = x[None]
        for i in range(self.num_layers):
            # pre-LN self-attention
            h = nn.LayerNorm(epsilon=1e-5, name=f"ln1_{i}")(x)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, qkv_features=self.hidden,
                kernel_init=_inproj_init, bias_init=nn.initializers.zeros,
                deterministic=True, name=f"attn_{i}")(h, h)
            x = x + h
            h = nn.LayerNorm(epsilon=1e-5, name=f"ln2_{i}")(x)
            h = Linear(self.hidden, name=f"ff1_{i}")(h)
            h = nn.relu(h)
            h = Linear(self.hidden, name=f"ff2_{i}")(h)
            x = x + h
        if squeeze:
            x = x[0]
        return Linear(self.out, name="fc2")(x)


class GPRNet(nn.Module):
    """Generalized PageRank propagation with learned hop weights
    (reference: models.py:138-218; PPR-style init)."""
    hidden: int = 32
    num_layers: int = 2
    K: int = 10
    alpha: float = 0.1

    @nn.compact
    def __call__(self, gb, x, training: bool = True):
        for i in range(self.num_layers):
            x = nn.relu(Linear(self.hidden, name=f"lin_{i}")(x))

        def temp_init(key, shape, dtype=jnp.float32):
            import jax
            bound = np.sqrt(3.0 / (self.K + 1))
            t = jax.random.uniform(key, shape, dtype, -bound, bound)
            return t / jnp.abs(t).sum()

        temp = self.param("temp", temp_init, (self.K + 1,))
        w, sw = gcn_norm_weights(gb, add_self_loops=True)
        hidden = x * temp[0]
        for k in range(self.K):
            x = propagate(gb, x, w, sw)
            hidden = hidden + temp[k + 1] * x
        return Linear(1, name="fc2")(hidden)


class ARMANet(nn.Module):
    """1-stack 1-layer ARMA convs: x' = act(A_hat x W + x V)
    (reference: models.py:221-235, ARMAConv(h, h, 1, 1, False))."""
    hidden: int = 32
    num_layers: int = 2

    @nn.compact
    def __call__(self, gb, x, training: bool = True):
        # PyG ARMAConv propagates over D^-1/2 A D^-1/2 without self loops
        w, _ = gcn_norm_weights(gb, add_self_loops=False)
        for i in range(self.num_layers):
            h = Linear(self.hidden, use_bias=False, name=f"w_{i}")(x)
            h = propagate(gb, h, w)
            root = Linear(self.hidden, name=f"v_{i}")(x)
            x = nn.relu(h + root)
        return Linear(1, name="fc2")(x)


class GcnNet(nn.Module):
    """GCNConv stack (reference: models.py:238-254)."""
    hidden: int = 32
    num_layers: int = 2

    @nn.compact
    def __call__(self, gb, x, training: bool = True):
        w, sw = gcn_norm_weights(gb, add_self_loops=True)
        for i in range(self.num_layers):
            h = Linear(self.hidden, use_bias=False, name=f"w_{i}")(x)
            x = propagate(gb, h, w, sw)
            x = x + self.param(f"bias_{i}", nn.initializers.zeros,
                               (self.hidden,))
            x = nn.relu(x)
        return Linear(1, name="fc2")(x)


class GatNet(nn.Module):
    """GATConv stack, ELU activations (reference: models.py:256-272)."""
    hidden: int = 32
    num_heads: int = 4
    num_layers: int = 2

    @nn.compact
    def __call__(self, gb, x, training: bool = True):
        for i in range(self.num_layers):
            x = GATConv(self.hidden // self.num_heads,
                        num_heads=self.num_heads, concat=True,
                        add_self_loops=True, activation="elu",
                        name=f"conv_{i}")(gb, x, training=training)
        return Linear(1, name="fc2")(x)


class ChebNet(nn.Module):
    """Chebyshev filters, K=3, lambda_max=2 (reference: models.py:274-289)."""
    hidden: int = 32
    num_layers: int = 2
    K: int = 3

    @nn.compact
    def __call__(self, gb, x, training: bool = True):
        # L_hat = L_sym - I = -D^-1/2 A D^-1/2 (lambda_max = 2)
        w, _ = gcn_norm_weights(gb, add_self_loops=False)
        w = -w
        for i in range(self.num_layers):
            Tx0 = x
            out = Linear(self.hidden, use_bias=False, name=f"w_{i}_0")(Tx0)
            if self.K > 1:
                Tx1 = propagate(gb, x, w)
                out = out + Linear(self.hidden, use_bias=False,
                                   name=f"w_{i}_1")(Tx1)
                for k in range(2, self.K):
                    Tx2 = 2.0 * propagate(gb, Tx1, w) - Tx0
                    out = out + Linear(self.hidden, use_bias=False,
                                       name=f"w_{i}_{k}")(Tx2)
                    Tx0, Tx1 = Tx1, Tx2
            x = nn.relu(out + self.param(f"bias_{i}", nn.initializers.zeros,
                                         (self.hidden,)))
        return Linear(1, name="fc2")(x)


class BernNet(nn.Module):
    """Bernstein-polynomial filter, K=10, shared relu(coe) across layers
    (reference: models.py:291-377)."""
    hidden: int = 32
    num_layers: int = 2
    K: int = 10

    @nn.compact
    def __call__(self, gb, x, training: bool = True):
        coe = self.param("coe", nn.initializers.ones, (self.K + 1,))
        temp = nn.relu(coe)
        # L = I - D^-1/2 A D^-1/2 ; 2I - L = I + D^-1/2 A D^-1/2
        w, _ = gcn_norm_weights(gb, add_self_loops=False)

        def prop_L(v):       # L v
            return v * gb.node_mask[:, None] - propagate(gb, v, w)

        def prop_2I_L(v):    # (2I - L) v
            return v * gb.node_mask[:, None] + propagate(gb, v, w)

        from scipy.special import comb
        for i in range(self.num_layers):
            tmp = [x]
            for _ in range(self.K):
                tmp.append(prop_2I_L(tmp[-1]))
            out = (comb(self.K, 0) / (2 ** self.K)) * temp[0] * tmp[self.K]
            for j in range(self.K):
                v = tmp[self.K - j - 1]
                for _ in range(j + 1):
                    v = prop_L(v)
                out = out + (comb(self.K, j + 1) / (2 ** self.K)) \
                    * temp[j + 1] * v
            x = nn.relu(Linear(self.hidden, name=f"w_{i}")(out))
        return Linear(1, name="fc2")(x)


FILTER_MODEL_REGISTRY = {
    "MLP": MLPNet,
    "DS": DeepSetsNet,
    "Transformer": TransformerNet,
    "GPRNet": GPRNet,
    "ARMANet": ARMANet,
    "GcnNet": GcnNet,
    "GatNet": GatNet,
    "ChebNet": ChebNet,
    "BernNet": BernNet,
}
