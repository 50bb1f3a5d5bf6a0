"""Positional-encoding handling: the paper's sign-handling baselines.

`handle_lap` dispatch over lap_method in {sign_flip, abs_val, canonical,
sign_inv, none} (reference:
GraphPrediction/train/train_ZINC_graph_regression.py:13-51).  `sign_inv`
is applied by the model itself (it owns the SignNet parameters); the pure
tensor methods live here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graph import segment as seg


def sign_flip(rng, pos_enc):
    """Random +-1 per eigenvector column, shared across the batch
    (reference lines 14-17)."""
    flips = jnp.where(jax.random.uniform(rng, (pos_enc.shape[1],)) >= 0.5,
                      1.0, -1.0)
    return pos_enc * flips[None, :]


def abs_val(pos_enc):
    return jnp.abs(pos_enc)


def canonical(gb, pos_enc, exact: bool = False):
    """Deterministic per-graph sign fix: flip column j of graph g iff it has
    fewer nonnegative entries than negative ones, OR smaller nonnegative mass
    than negative mass (reference lines 26-43).

    The reference computes ``sign_flip = -(less_nonneg + less_norm)`` then
    maps only exact zeros to +1, so when BOTH criteria fire the multiplier is
    **-2**, not -1 (`train_ZINC_graph_regression.py:39-41`) — it rescales the
    eigenvector instead of just flipping it, which breaks sign-consistency
    even in unambiguous cases.  ``exact=True`` replicates that published
    behavior bit-for-bit; the default keeps a pure +-1 sign choice (the
    documented deviation, see PARITY.md)."""
    nm = gb.node_mask[:, None]

    def _pool(v):
        part = seg.pool_nodes(v, gb.graph_id, gb.num_graphs)
        if "mp_send_idx" in gb.extras:
            # mp shard: graphs may straddle shards; combine partial counts
            from ..parallel.mp_halo import get_mp_axis
            part = jax.lax.psum(part, get_mp_axis())
        return part

    pos_count = _pool((pos_enc >= 0).astype(jnp.float32) * nm)
    neg_count = _pool((pos_enc < 0).astype(jnp.float32) * nm)
    nonneg_mass = _pool(jnp.where(pos_enc >= 0, pos_enc, 0.0) * nm)
    neg_mass = _pool(jnp.where(pos_enc < 0, -pos_enc, 0.0) * nm)
    flip = ((pos_count < neg_count).astype(jnp.float32)
            + (nonneg_mass < neg_mass).astype(jnp.float32))
    if exact:
        signs = jnp.where(flip > 0, -flip, 1.0)     # [G, K]  1 / -1 / -2
    else:
        signs = jnp.where(flip > 0, -1.0, 1.0)      # [G, K]
    return pos_enc * signs[gb.graph_id]


def apply_lap_method(method: str, gb, pos_enc, rng=None):
    if method in ("none", "sign_inv"):
        return pos_enc
    if method == "sign_flip":
        if rng is None:
            raise ValueError("sign_flip needs an rng key")
        return sign_flip(rng, pos_enc)
    if method == "abs_val":
        return abs_val(pos_enc)
    if method == "canonical":
        return canonical(gb, pos_enc)
    if method == "canonical_ref":
        return canonical(gb, pos_enc, exact=True)
    raise ValueError(f"invalid laplacian method {method!r}")
