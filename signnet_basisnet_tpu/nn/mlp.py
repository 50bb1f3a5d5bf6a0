"""MLP family covering all four reference MLP styles.

1. `MLP` — GraphPrediction style (reference: GraphPrediction/layers/mlp.py:5-56
   and LearningFilters/models.py:18-56): lin -> act -> [BN] -> [LN] ->
   [residual] -> dropout, plain final linear.  Works on 2-D [N, D] and 3-D
   [B, S, D] inputs (3-D BN normalizes over batch*set, the reference's
   ``bn(x.transpose(2,1)).transpose(2,1)``).
2. `ElementsMLP` — Alchemy/GINESignNet style (reference:
   Alchemy/sign_net/model_utils/elements.py:39-69): lin -> BN -> act with the
   bias-iff-no-norm rule; final layer normed+activated only when
   `with_final_activation`.
3. `MaskedMLP` — ElementsMLP with mask-aware BN and hard zeroing of padded
   slots (reference: Alchemy/sign_net/model_utils/masked_layers.py:34-64).
4. `MLPReadout` — halving-width readout head (reference:
   GraphPrediction/layers/mlp_readout_layer.py:9-24).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .init import ACTIVATIONS, Linear
from .norm import MaskedBatchNorm, MaskedLayerNorm


class MLP(nn.Module):
    hidden: int
    out: int
    num_layers: int
    use_bn: bool = False
    use_ln: bool = False
    dropout: float = 0.0
    activation: str = "relu"
    residual: bool = False
    bn_track_running_stats: bool = True

    @nn.compact
    def __call__(self, x, training: bool = True, mask=None):
        act = ACTIVATIONS[self.activation]
        if self.num_layers == 1:
            return Linear(self.out, name="lin_0")(x)
        x_prev = x
        for i in range(self.num_layers - 1):
            x = Linear(self.hidden, name=f"lin_{i}")(x)
            x = act(x)
            if self.use_bn:
                x = MaskedBatchNorm(
                    self.hidden, track_running_stats=self.bn_track_running_stats,
                    name=f"bn_{i}")(x, mask=mask, training=training)
            if self.use_ln:
                x = MaskedLayerNorm(self.hidden, name=f"ln_{i}")(x, mask=mask)
            if self.residual and x_prev.shape == x.shape:
                x = x + x_prev
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
            x_prev = x
        x = Linear(self.out, name=f"lin_{self.num_layers - 1}")(x)
        if self.residual and x_prev.shape == x.shape:
            x = x + x_prev
        return x


class ElementsMLP(nn.Module):
    out: int
    num_layers: int = 2
    with_final_activation: bool = True
    with_norm: bool = True
    bias: bool = True
    hidden: Optional[int] = None

    @nn.compact
    def __call__(self, x, training: bool = True, mask=None):
        nin = x.shape[-1]
        n_hid = nin if self.hidden is None else self.hidden
        for i in range(self.num_layers):
            feats = n_hid if i < self.num_layers - 1 else self.out
            use_bias = ((i == self.num_layers - 1 and not self.with_final_activation
                         and self.bias) or (not self.with_norm))
            x = Linear(feats, use_bias=use_bias, name=f"lin_{i}")(x)
            if i < self.num_layers - 1 or self.with_final_activation:
                if self.with_norm:
                    x = MaskedBatchNorm(feats, name=f"bn_{i}")(
                        x, mask=mask, training=training)
                x = nn.relu(x)
        return x


class MaskedMLP(nn.Module):
    out: int
    num_layers: int = 2
    with_final_activation: bool = True
    with_norm: bool = True
    bias: bool = True
    hidden: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 training: bool = True):
        nin = x.shape[-1]
        n_hid = nin if self.hidden is None else self.hidden
        for i in range(self.num_layers):
            feats = n_hid if i < self.num_layers - 1 else self.out
            use_bias = ((i == self.num_layers - 1 and not self.with_final_activation
                         and self.bias) or (not self.with_norm))
            x = Linear(feats, use_bias=use_bias, name=f"lin_{i}")(x)
            if mask is not None:
                x = x * mask[..., None]
            if i < self.num_layers - 1 or self.with_final_activation:
                if self.with_norm:
                    x = MaskedBatchNorm(feats, name=f"bn_{i}")(
                        x, mask=mask, training=training)
                x = nn.relu(x)
        return x


class MLPReadout(nn.Module):
    out: int
    num_hidden_layers: int = 2

    @nn.compact
    def __call__(self, x, training: bool = True):
        del training
        dim = x.shape[-1]
        for l in range(self.num_hidden_layers):
            x = Linear(dim // 2 ** (l + 1), name=f"fc_{l}")(x)
            x = nn.relu(x)
        return Linear(self.out, name=f"fc_{self.num_hidden_layers}")(x)


class MLPReadout2(nn.Module):
    """MLPReadout with dropout before every hidden linear (reference:
    GraphPrediction/layers/mlp_readout_layer.py:28-45)."""
    out: int
    num_hidden_layers: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = True):
        dim = x.shape[-1]
        for l in range(self.num_hidden_layers):
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
            x = Linear(dim // 2 ** (l + 1), name=f"fc_{l}")(x)
            x = nn.relu(x)
        return Linear(self.out, name=f"fc_{self.num_hidden_layers}")(x)
