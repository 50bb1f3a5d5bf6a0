"""Pallas TPU kernels: fused gather-multiply-segment-sum (SpMM).

Computes out[n] = sum_{e : receivers[e] = n} w_e * x[senders[e]] in one
kernel.  Strategy (see /opt/skills/guides/pallas_guide.md):

- grid over destination-node tiles (BN rows of the output);
- edge indices live in VMEM and are dynamic-sliced per 1024-edge chunk
  (the 32-bit VMEM load-alignment granularity); per-tile contiguous edge
  ranges [start_i, end_i) come in via scalar prefetch (SMEM) — valid because
  the GraphBatch contract sorts edges by destination;
- gather and scatter become on-the-fly one-hot MXU matmuls built with
  broadcasted_iota comparisons (`spmm_pallas`), or — with the tile-local
  batch layout (`batch_np(tile=bn)`) — a dense per-tile adjacency build +
  one [bn, bn] @ [bn, D] matmul (`spmm_tiled`, differentiable).

A pure-XLA reference (`spmm_reference`) ships alongside for allclose tests.
Edge arrays must be padded to a multiple of 1024 (see `pad_edges_to`).

Measured on TPU v5e (2026-08, bench_ops.py; noisy shared chip, numbers are
indicative): XLA's destination-sorted scatter-add and the XLA one-hot-matmul
formulation (ops/segment_matmul.py) trade the lead depending on (N, E), and
one of the two wins at every shape tested (ZINC-batch 3k..49k nodes); these
Pallas kernels are numerically exact (1e-6) but pipeline-bound below XLA
throughput, so `graph.segment` defaults to the XLA backend and the kernels
stay available as explicit backends for shapes where scatter degrades.
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


# 1-D 32-bit VMEM loads must start at a multiple of 8 sublanes x 128 lanes
_LOAD = 1024


def _spmm_kernel(starts_ref, ends_ref, senders_ref, receivers_ref, w_ref,
                 x_ref, out_ref, *, be: int, bn: int, num_edges: int):
    i = pl.program_id(0)
    n_lo = i * bn
    start = starts_ref[i]
    end = ends_ref[i]

    out_ref[:] = jnp.zeros_like(out_ref)

    # align chunk loads to _LOAD so Mosaic can prove the dynamic-slice offset
    # is tile-aligned; the one-hot matmuls run on static `be`-sized subslices
    c0 = start // _LOAD
    num_chunks = pl.cdiv(end, _LOAD) - c0
    subs = _LOAD // be

    def body(c, _):
        e_lo = pl.multiple_of((c0 + c) * _LOAD, _LOAD)
        src_all = senders_ref[pl.ds(e_lo, _LOAD)]
        dst_all = receivers_ref[pl.ds(e_lo, _LOAD)]
        w_all = w_ref[pl.ds(e_lo, _LOAD)]
        offs_all = (jax.lax.broadcasted_iota(jnp.int32, (_LOAD, 1), 0)[:, 0]
                    + e_lo)
        for j in range(subs):           # static unroll over be-subchunks
            sl = slice(j * be, (j + 1) * be)
            src, dst = src_all[sl], dst_all[sl]
            valid = (offs_all[sl] >= start) & (offs_all[sl] < end)
            # f32 weights: Mosaic can't minor-dim-reshape bf16 vectors, and
            # the gather dot already accumulates in f32
            w = w_all[sl].astype(jnp.float32) * valid.astype(jnp.float32)

            # gather: onehot(src) [be, N] @ x [N, D] on the MXU.
            # HIGHEST precision: the default TPU f32 emulation is single-pass
            # bf16 under --xla_allow_excess_precision (observed 2e-2 errors)
            n_ids = jax.lax.broadcasted_iota(jnp.int32, (be, x_ref.shape[0]),
                                             1)
            g_oh = (n_ids == src[:, None]).astype(x_ref.dtype)
            msg = jnp.dot(g_oh, x_ref[:], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
            msg = msg * w[:, None]

            # scatter into this node tile: onehot(dst - n_lo)^T [bn, be] @ msg
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (be, bn), 1)
            s_oh = (row_ids == (dst - n_lo)[:, None]).astype(msg.dtype)
            out_ref[:] += jnp.dot(s_oh.T, msg,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST
                                  ).astype(out_ref.dtype)
        return ()

    jax.lax.fori_loop(0, num_chunks, body, ())


@functools.partial(jax.jit, static_argnames=("num_nodes", "bn", "be"))
def spmm_pallas(x, senders, receivers, weights, starts, ends,
                num_nodes: int, bn: int = 256, be: int = 256):
    """Fused SpMM; `starts`/`ends` from `tile_edge_ranges`; edge arrays must
    be padded to a multiple of `_LOAD` (1024) via `pad_edges_to`."""
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


# ---------------------------------------------------------------------------
# Tile-local SpMM: out[n] = sum_{e: dst_e = n} w_e * x[src_e], requiring the
# batch layout where every graph lives inside one `bn`-sized node tile
# (graph.batch.batch_np(tile=bn)).  Both endpoints of every edge then fall in
# the same tile, so the kernel builds a dense [bn, bn] per-tile adjacency
# from one-hot MXU products (cost E*bn MACs) and applies it with a single
# [bn, bn] @ [bn, D] matmul (N*bn*D MACs) — orders of magnitude less MXU work
# than one-hot aggregation over the full node axis, with zero scatter ops.
# This is the TPU-native replacement for DGL/PyG's CUDA SpMM (SURVEY.md §7).
# ---------------------------------------------------------------------------


def _tile_adj(starts_ref, ends_ref, senders_ref, receivers_ref, w_ref,
              acc_ref, *, be: int, bn: int, transpose: bool):
    """Accumulate this tile's dense adjacency A[d, s] = sum w_e into acc_ref."""
    i = pl.program_id(0)
    n_lo = i * bn
    start = starts_ref[i]
    end = ends_ref[i]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    c0 = start // _LOAD
    num_chunks = pl.cdiv(end, _LOAD) - c0
    subs = _LOAD // be

    def body(c, _):
        e_lo = pl.multiple_of((c0 + c) * _LOAD, _LOAD)
        src_all = senders_ref[pl.ds(e_lo, _LOAD)]
        dst_all = receivers_ref[pl.ds(e_lo, _LOAD)]
        w_all = w_ref[pl.ds(e_lo, _LOAD)]
        offs_all = (jax.lax.broadcasted_iota(jnp.int32, (_LOAD, 1), 0)[:, 0]
                    + e_lo)
        for j in range(subs):
            sl = slice(j * be, (j + 1) * be)
            src = src_all[sl] - n_lo
            dst = dst_all[sl] - n_lo
            valid = (offs_all[sl] >= start) & (offs_all[sl] < end)
            # adjacency build always in f32: the acc scratch is f32 anyway,
            # the build is E*bn MACs (negligible vs the N*bn*D apply), and
            # Mosaic cannot insert a minor dim (w[:, None]) on bf16 vectors
            w = (w_all[sl].astype(jnp.float32)
                 * valid.astype(jnp.float32))
            col = jax.lax.broadcasted_iota(jnp.int32, (be, bn), 1)
            g_oh = (col == src[:, None]).astype(jnp.float32)
            s_oh = (col == dst[:, None]).astype(jnp.float32) * w[:, None]
            a, b = (g_oh, s_oh) if transpose else (s_oh, g_oh)
            acc_ref[:] += jnp.dot(a.T, b,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
        return ()

    jax.lax.fori_loop(0, num_chunks, body, ())


def _spmm_tile_kernel(starts_ref, ends_ref, senders_ref, receivers_ref,
                      w_ref, x_ref, out_ref, acc_ref, *, be: int, bn: int,
                      transpose: bool):
    _tile_adj(starts_ref, ends_ref, senders_ref, receivers_ref, w_ref,
              acc_ref, be=be, bn=bn, transpose=transpose)
    # the apply matmul runs in the feature dtype (bf16 inputs stay on the
    # bf16 MXU path; adjacency entries are edge weights/masks, bf16-exact
    # for the mask case); f32 accumulation via preferred_element_type.
    # HIGHEST (3-pass f32 emulation) is only meaningful — and only
    # accepted by Mosaic — for f32 operands; bf16 uses the native pass.
    prec = (jax.lax.Precision.HIGHEST if x_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    out_ref[:] = jnp.dot(acc_ref[:].astype(x_ref.dtype), x_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=prec).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_nodes", "bn", "be", "transpose"))
def _spmm_tiled_raw(x, senders, receivers, weights, starts, ends,
                    num_nodes: int, bn: int, be: int, transpose: bool):
    n_tiles = num_nodes // bn
    d = x.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # senders
            pl.BlockSpec(memory_space=pltpu.VMEM),   # receivers
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weights
            pl.BlockSpec((bn, d), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # x tile
        ],
        out_specs=pl.BlockSpec((bn, d), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bn, bn), jnp.float32)],
    )
    kernel = functools.partial(_spmm_tile_kernel, be=be, bn=bn,
                               transpose=transpose)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_nodes, d), x.dtype),
        grid_spec=grid_spec,
    )(starts, ends, senders, receivers, weights, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def spmm_tiled(x, senders, receivers, weights, starts, ends,
               num_nodes: int, bn: int = 256, be: int = 256):
    """Tile-local fused SpMM (differentiable in x and weights).

    Contract: batch packed with `batch_np(tile=bn)` (both edge endpoints in
    the same bn-tile; edges sorted by destination; `starts`/`ends` =
    extras['tile_starts'/'tile_ends']); num_nodes % bn == 0; edge arrays
    padded to a multiple of 1024.  Edges violating tile-locality are
    silently dropped — the layout contract is the batcher's responsibility.
    """
    return _spmm_tiled_raw(x, senders, receivers, weights, starts, ends,
                           num_nodes, bn, be, False)


def _spmm_tiled_fwd(x, senders, receivers, weights, starts, ends,
                    num_nodes, bn, be):
    out = _spmm_tiled_raw(x, senders, receivers, weights, starts, ends,
                          num_nodes, bn, be, False)
    return out, (x, senders, receivers, weights, starts, ends)


def _spmm_tiled_bwd(num_nodes, bn, be, res, g):
    x, senders, receivers, weights, starts, ends = res
    # d x = A^T g  — same kernel with the adjacency transposed in-tile
    dx = _spmm_tiled_raw(g, senders, receivers, weights, starts, ends,
                         num_nodes, bn, be, True)
    # d w_e = g[dst_e] . x[src_e]  (SDDMM row dot; XLA gathers are cheap)
    dw = (g[receivers] * x[senders]).sum(-1).astype(weights.dtype)
    return dx, None, None, dw, None, None


spmm_tiled.defvjp(_spmm_tiled_fwd, _spmm_tiled_bwd)
