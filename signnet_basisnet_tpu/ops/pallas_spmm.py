"""Pallas TPU kernel: fused gather-multiply-segment-sum (SpMM).

Computes out[n] = sum_{e : receivers[e] = n} w_e * x[senders[e]] in one
kernel.  Strategy (see /opt/skills/guides/pallas_guide.md):

- grid over destination-node tiles (BN rows of the output);
- node features x stay resident in VMEM (padded molecular batches are ~1 MB);
- edge indices live in VMEM and are dynamic-sliced per BE-chunk; per-tile
  contiguous edge ranges [start_i, end_i) come in via scalar prefetch (SMEM)
  — valid because the GraphBatch contract sorts edges by destination;
- gather and scatter both become on-the-fly one-hot MXU matmuls built with
  broadcasted_iota comparisons; the one-hot tiles live only in VMEM, never
  in HBM.

A pure-XLA reference (`spmm_reference`) ships alongside for allclose tests.
Edge arrays must be padded to a multiple of BE (see `pad_edges_to`).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def spmm_reference(x, senders, receivers, weights, num_nodes):
    msg = x[senders] * weights[:, None]
    return jax.ops.segment_sum(msg, receivers, num_segments=num_nodes,
                               indices_are_sorted=True)


def pad_edges_to(senders, receivers, weights, be: int
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad edge arrays to a multiple of `be` with zero-weight self-edges."""
    e = len(senders)
    target = -(-e // be) * be
    if target == e:
        return senders, receivers, weights
    pad = target - e
    senders = np.concatenate([senders, np.zeros(pad, senders.dtype)])
    receivers = np.concatenate(
        [receivers, np.full(pad, receivers[-1] if e else 0, receivers.dtype)])
    weights = np.concatenate([weights, np.zeros(pad, weights.dtype)])
    return senders, receivers, weights


def tile_edge_ranges(receivers: np.ndarray, num_nodes: int, bn: int):
    """Host-side: for each destination tile, the [start, end) range of the
    (destination-sorted) edge array touching it."""
    n_tiles = -(-num_nodes // bn)
    bounds = np.searchsorted(receivers, np.arange(0, n_tiles + 1) * bn)
    return (bounds[:-1].astype(np.int32), bounds[1:].astype(np.int32))


def _spmm_kernel(starts_ref, ends_ref, senders_ref, receivers_ref, w_ref,
                 x_ref, out_ref, *, be: int, bn: int, num_edges: int):
    i = pl.program_id(0)
    n_lo = i * bn
    start = starts_ref[i]
    end = ends_ref[i]

    out_ref[:] = jnp.zeros_like(out_ref)

    # chunk-align the start so dynamic slices hit static offsets mod be
    c0 = start // be
    num_chunks = pl.cdiv(end, be) - c0

    def body(c, _):
        e_lo = (c0 + c) * be
        offs = jax.lax.broadcasted_iota(jnp.int32, (be, 1), 0)[:, 0] + e_lo
        valid = (offs >= start) & (offs < end)
        src = senders_ref[pl.ds(e_lo, be)]
        dst = receivers_ref[pl.ds(e_lo, be)]
        w = w_ref[pl.ds(e_lo, be)] * valid.astype(x_ref.dtype)

        # gather: onehot(src) [be, N] @ x [N, D] on the MXU
        n_ids = jax.lax.broadcasted_iota(jnp.int32, (be, x_ref.shape[0]), 1)
        g_oh = (n_ids == src[:, None]).astype(x_ref.dtype)
        msg = jnp.dot(g_oh, x_ref[:], preferred_element_type=jnp.float32)
        msg = msg * w[:, None]

        # scatter into this node tile: onehot(dst - n_lo)^T [bn, be] @ msg
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (be, bn), 1)
        s_oh = (row_ids == (dst - n_lo)[:, None]).astype(msg.dtype)
        out_ref[:] += jnp.dot(s_oh.T, msg,
                              preferred_element_type=jnp.float32
                              ).astype(out_ref.dtype)
        return ()

    jax.lax.fori_loop(0, num_chunks, body, ())


@functools.partial(jax.jit, static_argnames=("num_nodes", "bn", "be"))
def spmm_pallas(x, senders, receivers, weights, starts, ends,
                num_nodes: int, bn: int = 256, be: int = 256):
    """Fused SpMM; `starts`/`ends` from `tile_edge_ranges`; edge arrays must
    be padded to a multiple of `be` (`pad_edges_to`)."""
    n_tiles = -(-num_nodes // bn)
    d = x.shape[1]
    num_edges = senders.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # senders
            pl.BlockSpec(memory_space=pltpu.VMEM),   # receivers
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x
        ],
        out_specs=pl.BlockSpec((bn, d), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_spmm_kernel, be=be, bn=bn,
                               num_edges=num_edges)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * bn, d), x.dtype),
        grid_spec=grid_spec,
    )(starts, ends, senders, receivers, weights, x)[:num_nodes]
