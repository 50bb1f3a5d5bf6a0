"""Invariant Graph Network (IGN) equivariant linear layers.

The 2->2 (15-dim), 2->1 (5-dim), 1->2 (5-dim) and 1->1 (2-dim) permutation-
equivariant linear bases of Maron et al., applied channelwise via a learned
coefficient tensor — pure dense reductions/broadcasts + one einsum, ideal XLA
material (reference: LearningFilters/ign.py:43-417, itself adapted from
InvariantGraphNetworks-PyTorch).  Inputs are [B, D, m, m] / [B, D, m].

The 'inf' normalization (divide summed ops by m or m^2) matches the
reference default.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .init import Linear
from .norm import MaskedBatchNorm


def _diag_part(x):  # [B, D, m, m] -> [B, D, m]
    return jnp.diagonal(x, axis1=-2, axis2=-1)


def _diag_embed(x):  # [B, D, m] -> [B, D, m, m]
    m = x.shape[-1]
    return x[..., :, None] * jnp.eye(m, dtype=x.dtype)


def contractions_2_to_2(x, normalize: bool = True) -> jnp.ndarray:
    """[B, D, m, m] -> [B, D, 15, m, m] stacked basis ops."""
    m = x.shape[-1]
    diag = _diag_part(x)                         # B D m
    sum_diag = diag.sum(-1, keepdims=True)       # B D 1
    sum_rows = x.sum(-1)                         # B D m  (sum over last axis)
    sum_cols = x.sum(-2)                         # B D m
    sum_all = x.sum((-2, -1))                    # B D

    tile = lambda v: jnp.broadcast_to(v[..., None, :], x.shape)       # rows of v
    tile_t = lambda v: jnp.broadcast_to(v[..., :, None], x.shape)     # cols of v
    const = lambda s: jnp.broadcast_to(s[..., None, None], x.shape)

    ops = [
        _diag_embed(diag),                                   # 1 diag -> diag
        _diag_embed(jnp.broadcast_to(sum_diag, diag.shape)), # 2 tr -> diag
        _diag_embed(sum_rows),                               # 3 row sums -> diag
        _diag_embed(sum_cols),                               # 4 col sums -> diag
        _diag_embed(jnp.broadcast_to(sum_all[..., None], diag.shape)),  # 5
        tile_t(sum_cols),                                    # 6 col sum i -> row i
        tile_t(sum_rows),                                    # 7 row sum i -> row i
        tile(sum_cols),                                      # 8 col sum i -> col i
        tile(sum_rows),                                      # 9 row sum i -> col i
        x,                                                   # 10 identity
        jnp.swapaxes(x, -1, -2),                             # 11 transpose
        tile_t(diag),                                        # 12 diag i -> row i
        tile(diag),                                          # 13 diag i -> col i
        const(sum_diag[..., 0]),                             # 14 tr everywhere
        const(sum_all),                                      # 15 total everywhere
    ]
    if normalize:
        fm = float(m)
        scale = [1, 1 / fm, 1 / fm, 1 / fm, 1 / fm ** 2, 1 / fm, 1 / fm, 1 / fm,
                 1 / fm, 1, 1, 1, 1, 1 / fm, 1 / fm ** 2]
        ops = [o * s for o, s in zip(ops, scale)]
    return jnp.stack(ops, axis=2)


def contractions_2_to_1(x, normalize: bool = True) -> jnp.ndarray:
    """[B, D, m, m] -> [B, D, 5, m]."""
    m = x.shape[-1]
    diag = _diag_part(x)
    sum_diag = diag.sum(-1, keepdims=True)
    sum_rows = x.sum(-1)
    sum_cols = x.sum(-2)
    sum_all = x.sum((-2, -1))
    ops = [
        diag,
        jnp.broadcast_to(sum_diag, diag.shape),
        sum_rows,
        sum_cols,
        jnp.broadcast_to(sum_all[..., None], diag.shape),
    ]
    if normalize:
        fm = float(m)
        scale = [1, 1 / fm, 1 / fm, 1 / fm, 1 / fm ** 2]
        ops = [o * s for o, s in zip(ops, scale)]
    return jnp.stack(ops, axis=2)


def contractions_1_to_2(x, normalize: bool = True) -> jnp.ndarray:
    """[B, D, m] -> [B, D, 5, m, m]."""
    m = x.shape[-1]
    sum_all = x.sum(-1, keepdims=True)          # B D 1
    full = x.shape[:-1] + (m, m)
    ops = [
        _diag_embed(x),
        _diag_embed(jnp.broadcast_to(sum_all, x.shape)),
        jnp.broadcast_to(x[..., None, :], full),   # element i in row slots
        jnp.broadcast_to(x[..., :, None], full),   # element i in col slots
        jnp.broadcast_to(sum_all[..., None], full),
    ]
    if normalize:
        fm = float(m)
        scale = [1, 1 / fm, 1, 1, 1 / fm]
        ops = [o * s for o, s in zip(ops, scale)]
    return jnp.stack(ops, axis=2)


def contractions_1_to_1(x, normalize: bool = True) -> jnp.ndarray:
    """[B, D, m] -> [B, D, 2, m]."""
    m = x.shape[-1]
    sum_all = x.sum(-1, keepdims=True)
    ops = [x, jnp.broadcast_to(sum_all, x.shape)]
    if normalize:
        ops[1] = ops[1] / float(m)
    return jnp.stack(ops, axis=2)


def _coeff_init(key, shape, dtype=jnp.float32):
    # randn * sqrt(2) / (D + S), per the reference init
    import jax
    d, s, _ = shape
    return jax.random.normal(key, shape, dtype) * (np.sqrt(2.0) / (d + s))


class EquivariantLayer(nn.Module):
    """One equivariant linear map selected by (in_rank, out_rank)."""
    out_depth: int
    in_rank: int = 2
    out_rank: int = 1

    @nn.compact
    def __call__(self, x):
        key = (self.in_rank, self.out_rank)
        basis_fn, basis_dim = {
            (2, 2): (contractions_2_to_2, 15),
            (2, 1): (contractions_2_to_1, 5),
            (1, 2): (contractions_1_to_2, 5),
            (1, 1): (contractions_1_to_1, 2),
        }[key]
        d = x.shape[1]
        coeffs = self.param("coeffs", _coeff_init, (d, self.out_depth, basis_dim))
        ops = basis_fn(x)  # B D b m [m]
        if self.out_rank == 2:
            out = jnp.einsum("dsb,ndbij->nsij", coeffs, ops)
            bias = self.param("bias", nn.initializers.zeros, (1, self.out_depth, 1, 1))
            if key == (2, 2):
                diag_bias = self.param("diag_bias", nn.initializers.zeros,
                                       (1, self.out_depth, 1, 1))
                m = out.shape[-1]
                out = out + jnp.eye(m, dtype=out.dtype) * diag_bias
            out = out + bias
        else:
            out = jnp.einsum("dsb,ndbi->nsi", coeffs, ops)
            out = out + self.param("bias", nn.initializers.zeros,
                                   (1, self.out_depth, 1))
        return out


class BasicEquivariantLayer(nn.Module):
    """The 4-op 'basic' 2->2 equivariant layer (identity, row-mean, col-mean,
    total-mean broadcasts; reference: LearningFilters/ign.py:217-271)."""
    out_depth: int

    @nn.compact
    def __call__(self, x):
        m = x.shape[-1]
        fm = float(m)
        sum_cols = x.sum(-2) / fm
        sum_rows = x.sum(-1) / fm
        sum_all = sum_rows.sum(-1) / fm
        ops = jnp.stack([
            x,
            jnp.broadcast_to(sum_cols[..., None, :], x.shape),
            jnp.broadcast_to(sum_rows[..., :, None], x.shape),
            jnp.broadcast_to(sum_all[..., None, None], x.shape),
        ], axis=2)
        d = x.shape[1]
        coeffs = self.param("coeffs", _coeff_init, (d, self.out_depth, 4))
        out = jnp.einsum("dsb,ndbij->nsij", coeffs, ops)
        return out + self.param("bias", nn.initializers.zeros,
                                (1, self.out_depth, 1, 1))


class IGN2to1(nn.Module):
    """IGN stack: 2->1 then two 1->1 equivariant layers + pointwise MLP head.

    [B, 1, m, m] projectors -> [B, out, m] equivariant node outputs
    (reference: LearningFilters/ign.py:9-39).
    """
    hidden: int
    out: int
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, training: bool = True):
        ranks = [(2, 1), (1, 1), (1, 1)]
        for i, (ri, ro) in enumerate(ranks):
            x = EquivariantLayer(self.hidden, in_rank=ri, out_rank=ro,
                                 name=f"equi_{i}")(x)
            x = nn.relu(x)
            if self.use_bn:
                # torch BatchNorm1d on [B, C, m]: stats per channel over B*m
                x = jnp.swapaxes(x, 1, 2)  # B m C
                x = MaskedBatchNorm(self.hidden, name=f"bn_{i}")(
                    x, training=training)
                x = jnp.swapaxes(x, 1, 2)
        x = jnp.swapaxes(x, 1, 2)  # B m hidden
        x = nn.relu(Linear(self.hidden, name="fc1")(x))
        if self.use_bn:
            # reference creates bns[3] for fc1 but never applies it in forward
            pass
        x = Linear(self.out, name="fc2")(x)
        return jnp.swapaxes(x, 1, 2)  # B out m
