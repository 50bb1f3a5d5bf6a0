"""Equivariant DeepSets encoder.

Per layer: x -> act(Lin1(x) + Lin2(mean_set(x))) with optional BN
(track_running_stats=False), final layer without activation
(reference: LearningFilters/models.py:58-113).  The set axis is -2.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .init import ACTIVATIONS, Linear
from .norm import MaskedBatchNorm, MaskedLayerNorm


class EqDeepSetsEncoder(nn.Module):
    hidden: int = 32
    out: int = 1
    num_layers: int = 3
    use_bn: bool = False
    use_ln: bool = False
    dropout: float = 0.0
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, training: bool = True):
        act = ACTIVATIONS[self.activation]
        n = self.num_layers
        widths = [self.hidden] * (n - 1) + [self.out] if n > 1 else [self.out]
        for i, w in enumerate(widths[:-1]):
            x1 = Linear(w, name=f"lin1_{i}")(x)
            x2 = Linear(w, name=f"lin2_{i}")(x.mean(axis=-2, keepdims=True))
            x = act(x1 + x2)
            if self.use_bn:
                x = MaskedBatchNorm(w, track_running_stats=False,
                                    name=f"bn_{i}")(x, training=training)
            if self.use_ln:
                x = MaskedLayerNorm(w, name=f"ln_{i}")(x)
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
        x1 = Linear(widths[-1], name=f"lin1_{len(widths) - 1}")(x)
        x2 = Linear(widths[-1], name=f"lin2_{len(widths) - 1}")(
            x.mean(axis=-2, keepdims=True))
        return x1 + x2
