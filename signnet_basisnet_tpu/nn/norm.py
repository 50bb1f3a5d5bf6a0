"""Masked batch/layer norm with reference (PyTorch) semantics.

The reference's masked-padding design hinges on BN statistics being computed
over *valid rows only* — ``x[mask] = bn(x[mask])`` (reference:
Alchemy/sign_net/model_utils/masked_layers.py:7-32).  That exact semantics is
reproduced here with fixed shapes: statistics are weighted by the mask, and
masked-out positions are zeroed on output (the reference's
``assert x[~mask].max() == 0`` invariant).

Torch details matched: eps 1e-5 (BN) / 1e-6 (the reference's MaskedLN),
momentum 0.1 with running stats updated using the *unbiased* variance while
normalization uses the *biased* one; `track_running_stats=False` means batch
statistics are used at eval time too (LearningFilters MLP/DeepSets,
reference: LearningFilters/models.py:30).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    track_running_stats: bool = True

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 training: bool = True):
        d = self.features
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))

        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((d,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((d,), jnp.float32))

        x2 = x.reshape(-1, d)
        if mask is not None:
            m = mask.reshape(-1, 1).astype(x2.dtype)
        else:
            m = None

        # model-parallel shard: statistics must span ALL shards of the node
        # (or edge) axis, not just the local one — psum the moment sums over
        # the mp axis so every device normalizes with the global batch stats
        # (exactly what the single-device step computes)
        from ..parallel.mp_halo import get_mp_axis
        mp_axis = get_mp_axis()

        use_batch_stats = training or not self.track_running_stats
        if use_batch_stats:
            if mp_axis is not None:
                import jax
                if m is None:
                    cnt = jnp.asarray(float(x2.shape[0]), x2.dtype)
                    s1 = x2.sum(axis=0)
                    s2 = (x2 ** 2).sum(axis=0)
                else:
                    cnt = m.sum()
                    s1 = (x2 * m).sum(axis=0)
                    s2 = ((x2 ** 2) * m).sum(axis=0)
                cnt, s1, s2 = jax.lax.psum((cnt, s1, s2), mp_axis)
                cnt = jnp.maximum(cnt, 1.0)
                mean = s1 / cnt
                var = jnp.maximum(s2 / cnt - mean ** 2, 0.0)
            elif m is None:
                cnt = jnp.asarray(x2.shape[0], x2.dtype)
                mean = x2.mean(axis=0)
                var = ((x2 - mean) ** 2).mean(axis=0)
            else:
                cnt = jnp.maximum(m.sum(), 1.0)
                mean = (x2 * m).sum(axis=0) / cnt
                var = (((x2 - mean) ** 2) * m).sum(axis=0) / cnt
            if (self.track_running_stats and training
                    and not self.is_initializing()
                    and self.is_mutable_collection("batch_stats")):
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                mom = self.momentum
                ra_mean.value = (1 - mom) * ra_mean.value + mom * mean
                ra_var.value = (1 - mom) * ra_var.value + mom * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y2 = (x2 - mean) / jnp.sqrt(var + self.eps) * scale + bias
        if m is not None:
            y2 = y2 * m
        return y2.reshape(x.shape)


class MaskedLayerNorm(nn.Module):
    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 training: bool = True):
        del training
        d = self.features
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        mean = x.mean(axis=-1, keepdims=True)
        var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.eps) * scale + bias
        if mask is not None:
            y = y * mask[..., None].astype(y.dtype)
        return y
