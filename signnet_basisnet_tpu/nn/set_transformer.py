"""Masked set-transformer blocks (the SignNet rho aggregator).

Masked multi-head attention over the eigenvector axis per node, matching the
reference's transformer_module (reference:
Alchemy/sign_net/model_utils/transformer_module.py:8-127):

- attention scores masked with -1e10 fill + post-softmax mask multiply,
- attention dropout 0.1 (the reference's ScaledDotProductAttention default),
- Q/K/V/O projections without bias,
- masked LayerNorm (eps 1e-6) after residual adds,
- hard zeroing of padded slots between sublayers.

Input layout is [n, k, d] with mask [n, k]; on TPU the n axis is the batch
axis so the k x k attention matmuls batch onto the MXU.
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .init import Linear
from .norm import MaskedBatchNorm, MaskedLayerNorm


class PositionalEncoding(nn.Module):
    """Sinusoidal encoding of continuous positions (eigenvalues in [0, 2])."""
    dim_model: int
    freq: float = 100.0

    def __call__(self, pos, mask: Optional[jnp.ndarray] = None):
        # pos: [n, k] -> [n, k, d]
        half = self.dim_model // 2
        div = jnp.exp(jnp.arange(0, self.dim_model, 2, dtype=jnp.float32)
                      * (-math.log(self.freq) / self.dim_model))
        ang = pos[..., None] * div          # n k d/2
        enc = jnp.zeros(pos.shape + (self.dim_model,), jnp.float32)
        enc = enc.at[..., 0::2].set(jnp.sin(ang))
        enc = enc.at[..., 1::2].set(jnp.cos(ang[..., :self.dim_model - half]))
        if mask is not None:
            enc = enc * mask[..., None]
        return enc


class MultiHeadAttention(nn.Module):
    n_head: int
    d_model: int
    dropout: float = 0.0
    attn_dropout: float = 0.1

    @nn.compact
    def __call__(self, q, k, v, mask: Optional[jnp.ndarray] = None,
                 training: bool = True):
        d_k = self.d_model // self.n_head
        n, lq, _ = q.shape
        residual = q

        def split_heads(x, name):
            x = Linear(self.n_head * d_k, use_bias=False, name=name)(x)
            return x.reshape(n, -1, self.n_head, d_k).transpose(0, 2, 1, 3)

        qh = split_heads(q, "w_qs")
        kh = split_heads(k, "w_ks")
        vh = split_heads(v, "w_vs")

        attn = jnp.einsum("nhqd,nhkd->nhqk", qh / math.sqrt(d_k), kh)
        if mask is not None:
            pair = (mask[:, None, :, None] * mask[:, None, None, :])  # n 1 q k
            attn = jnp.where(pair > 0, attn, -1e10)
        attn = nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_dropout, deterministic=not training)(attn)
        if mask is not None:
            attn = attn * pair
        out = jnp.einsum("nhqk,nhkd->nhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(n, lq, -1)
        out = Linear(self.d_model, use_bias=False, name="fc")(out)
        out = nn.Dropout(self.dropout, deterministic=not training)(out)
        out = out + residual
        out = MaskedLayerNorm(self.d_model, name="norm")(out, mask=mask)
        return out


class PositionwiseFeedForward(nn.Module):
    d_model: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 training: bool = True):
        residual = x
        x = nn.relu(Linear(self.d_model, name="w_1")(x))
        if mask is not None:
            x = x * mask[..., None]
        x = Linear(self.d_model, name="w_2")(x)
        if mask is not None:
            x = x * mask[..., None]
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        x = x + residual
        return MaskedLayerNorm(self.d_model, name="norm")(x, mask=mask)


class TransformerEncoderLayer(nn.Module):
    d_model: int
    n_head: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 training: bool = True):
        x = MultiHeadAttention(self.n_head, self.d_model, dropout=self.dropout,
                               name="slf_attn")(x, x, x, mask=mask,
                                                training=training)
        if mask is not None:
            x = x * mask[..., None]
        x = PositionwiseFeedForward(self.d_model, dropout=self.dropout,
                                    name="pos_ffn")(x, mask=mask,
                                                    training=training)
        if mask is not None:
            x = x * mask[..., None]
        return x


class SetTransformer(nn.Module):
    """rho: masked transformer over the k axis, sum over k, linear+BN
    (reference: Alchemy/sign_net/sign_net.py:46-72)."""
    nhid: int
    nlayer: int

    @nn.compact
    def __call__(self, x, pos, mask: Optional[jnp.ndarray] = None,
                 training: bool = True):
        x = x + pos
        for i in range(self.nlayer):
            x = TransformerEncoderLayer(self.nhid, n_head=4,
                                        name=f"layer_{i}")(x, mask=mask,
                                                           training=training)
        x = x.sum(axis=1)  # n x d
        x = Linear(self.nhid, use_bias=False, name="out_lin")(x)
        x = MaskedBatchNorm(self.nhid, name="out_bn")(x, training=training)
        return x
