"""Pallas TPU kernel: fused gather-multiply-segment-sum (SpMM).

Computes out[n] = sum_{e : receivers[e] = n} w_e * x[senders[e]] in one
kernel.  Strategy (see /opt/skills/guides/pallas_guide.md):

- grid over destination-node tiles (BN rows of the output);
- node features x stay resident in VMEM (padded molecular batches are ~1 MB);
- edge indices arrive via scalar prefetch (SMEM) so the kernel can build
  one-hot blocks with broadcasted_iota comparisons — gather and scatter both
  become MXU matmuls; the one-hot tiles live only in VMEM, never in HBM;
- edges are pre-sorted by destination (the GraphBatch contract), so each
  destination tile only needs the contiguous edge range [start_i, end_i) —
  found on the host once per batch shape and passed as tile offsets; the
  kernel loops over that range in BE-sized chunks with @pl.when masking.

A pure-XLA reference (`spmm_reference`) ships alongside for allclose tests.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def spmm_reference(x, senders, receivers, weights, num_nodes):
    msg = x[senders] * weights[:, None]
    return jax.ops.segment_sum(msg, receivers, num_segments=num_nodes,
                               indices_are_sorted=True)


def _spmm_kernel(senders_ref, receivers_ref, starts_ref, ends_ref,
                 x_ref, w_ref, out_ref, *, be: int, bn: int):
    """One grid step computes output rows [i*bn, (i+1)*bn)."""
    i = pl.program_id(0)
    n_lo = i * bn
    start = starts_ref[i]
    end = ends_ref[i]

    out_ref[:] = jnp.zeros_like(out_ref)

    num_chunks = pl.cdiv(end - start, be)

    def body(c, _):
        e_lo = start + c * be
        # edge ids for this chunk (SMEM scalars -> vector via iota)
        offs = jax.lax.broadcasted_iota(jnp.int32, (be, 1), 0)[:, 0] + e_lo
        valid = offs < end
        offs_c = jnp.where(valid, offs, 0)
        src = jnp.take(senders_ref[:], offs_c)          # [be]
        dst = jnp.take(receivers_ref[:], offs_c)
        w = jnp.take(w_ref[:], offs_c) * valid.astype(x_ref.dtype)

        # gather: onehot(src) [be, N] @ x [N, D]  on the MXU
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


def tile_edge_ranges(receivers: np.ndarray, num_nodes: int, bn: int):
    """Host-side: for each destination tile, the [start, end) range of the
    (destination-sorted) edge array touching it."""
    n_tiles = -(-num_nodes // bn)
    # first edge index whose receiver >= tile start / > tile end
    bounds = np.searchsorted(receivers, np.arange(0, n_tiles + 1) * bn)
    return (bounds[:-1].astype(np.int32), bounds[1:].astype(np.int32))


@functools.partial(jax.jit, static_argnames=("num_nodes", "bn", "be"))
def spmm_pallas(x, senders, receivers, weights, starts, ends,
                num_nodes: int, bn: int = 256, be: int = 256):
    """Fused SpMM; `starts`/`ends` from `tile_edge_ranges` (same batch shape
    -> same ranges arrays shape; values may change per batch)."""
    n_tiles = -(-num_nodes // bn)
    d = x.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weights
        ],
        out_specs=pl.BlockSpec((bn, d), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_spmm_kernel, be=be, bn=bn)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * bn, d), x.dtype),
        grid_spec=grid_spec,
    )(senders, receivers, starts, ends, x, weights)[:num_nodes]
