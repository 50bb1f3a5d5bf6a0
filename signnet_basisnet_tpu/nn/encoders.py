"""Input feature encoders.

`DiscreteEncoder`: sum of per-column embedding lookups for integer feature
matrices (reference: Alchemy/sign_net/model_utils/elements.py:21-37; the
GINESignNetPyG variant uses max_num_values=500).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .init import Embedding


class DiscreteEncoder(nn.Module):
    hidden: int
    max_num_features: int = 10
    max_num_values: int = 6

    @nn.compact
    def __call__(self, x, training: bool = True):
        del training
        if x.ndim != 2:
            # single-feature codes of any rank (1-D flat edges, or the dense
            # [G, M, M] bond-code matrix): one elementwise embedding lookup
            return Embedding(self.max_num_values, self.hidden,
                             name="emb_0")(x)
        out = 0.0
        for i in range(min(x.shape[1], self.max_num_features)):
            out = out + Embedding(self.max_num_values, self.hidden,
                                  name=f"emb_{i}")(x[:, i])
        return out
