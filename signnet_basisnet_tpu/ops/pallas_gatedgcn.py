"""Fused GatedGCN edge-gate update (Pallas TPU kernel).

One kernel computes, per destination node n and edge e = (s -> n):

    e'_e  = Dh[s] + Eh[n] + Ce_e                    (edge feature update)
    sig_e = sigmoid(e'_e) * edge_mask_e
    agg_n = (sum_{e->n} sig_e . Bh[s]) / (sum_{e->n} sig_e + 1e-6)

i.e. the reference's two `update_all` SpMM calls plus the edge pretrans
(`GraphPrediction/layers/gatedgcn_layer.py:49-54`) in a single pass over
the edge list.  The caller adds `Ah` and applies norm/activation.

Same tile-local layout contract as ops/pallas_attention.py /
ops/pallas_spmm.spmm_tiled.  Forward = Pallas; backward = exact XLA VJP.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOAD = 1024
_HI = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def gatedgcn_gate_reference(Bh, Dh, Eh, Ce, senders, receivers, edge_mask,
                            num_nodes: int):
    """Pure-XLA reference: returns (agg [N, F], e_new [E, F])."""
    e_new = Dh[senders] + Eh[receivers] + Ce
    sigma = jax.nn.sigmoid(e_new) * edge_mask[:, None]
    num = jax.ops.segment_sum(sigma * Bh[senders], receivers,
                              num_segments=num_nodes,
                              indices_are_sorted=True)
    den = jax.ops.segment_sum(sigma, receivers, num_segments=num_nodes,
                              indices_are_sorted=True)
    return num / (den + 1e-6), e_new


def _gate_kernel(starts_ref, ends_ref, senders_ref, receivers_ref, em_ref,
                 ce_ref, bh_ref, dh_ref, eh_ref, agg_ref, enew_ref,
                 num_ref, den_ref, *, be: int, bn: int):
    i = pl.program_id(0)
    n_lo = i * bn
    start = starts_ref[i]
    end = ends_ref[i]

    num_ref[:] = jnp.zeros_like(num_ref)
    den_ref[:] = jnp.zeros_like(den_ref)

    # zero the full edge-output buffer once (grid is sequential on TPU);
    # rows not owned by any tile's range (edge padding beyond the last
    # tile range) must not stay uninitialized — NaNs would poison grads
    @pl.when(i == 0)
    def _():
        enew_ref[:] = jnp.zeros_like(enew_ref)

    c0 = start // _LOAD
    num_chunks = pl.cdiv(end, _LOAD) - c0
    subs = _LOAD // be

    def body(c, _):
        e_lo = pl.multiple_of((c0 + c) * _LOAD, _LOAD)
        src_all = senders_ref[pl.ds(e_lo, _LOAD)]
        dst_all = receivers_ref[pl.ds(e_lo, _LOAD)]
        em_all = em_ref[pl.ds(e_lo, _LOAD)]
        offs_all = (jax.lax.broadcasted_iota(jnp.int32, (_LOAD, 1), 0)[:, 0]
                    + e_lo)
        for j in range(subs):
            sl = slice(j * be, (j + 1) * be)
            src = src_all[sl] - n_lo
            dst = dst_all[sl] - n_lo
            valid = (offs_all[sl] >= start) & (offs_all[sl] < end)
            we = em_all[sl] * valid.astype(jnp.float32)

            col = jax.lax.broadcasted_iota(jnp.int32, (be, bn), 1)
            src_oh = (col == src[:, None]).astype(jnp.float32)
            dst_oh = (col == dst[:, None]).astype(jnp.float32)

            Dg = jnp.dot(src_oh, dh_ref[:],
                         preferred_element_type=jnp.float32, precision=_HI)
            Eg = jnp.dot(dst_oh, eh_ref[:],
                         preferred_element_type=jnp.float32, precision=_HI)
            e_new = Dg + Eg + ce_ref[pl.ds(e_lo, _LOAD), :][sl]
            # write the edge-feature update for this chunk (valid rows only
            # matter; invalid rows belong to another tile's range and are
            # overwritten by that tile's pass)
            enew_ref[pl.ds(e_lo + j * be, be), :] = jnp.where(
                valid[:, None], e_new,
                enew_ref[pl.ds(e_lo + j * be, be), :])

            sig = jax.nn.sigmoid(e_new) * we[:, None]
            Bg = jnp.dot(src_oh, bh_ref[:],
                         preferred_element_type=jnp.float32, precision=_HI)
            num_ref[:] += jnp.dot(dst_oh.T, sig * Bg,
                                  preferred_element_type=jnp.float32,
                                  precision=_HI)
            den_ref[:] += jnp.dot(dst_oh.T, sig,
                                  preferred_element_type=jnp.float32,
                                  precision=_HI)
        return ()

    jax.lax.fori_loop(0, num_chunks, body, ())
    agg_ref[:] = (num_ref[:] / (den_ref[:] + 1e-6)).astype(agg_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_nodes", "bn", "be"))
def _gate_pallas_raw(Bh, Dh, Eh, Ce, senders, receivers, edge_mask,
                     starts, ends, num_nodes: int, bn: int, be: int):
    n_tiles = num_nodes // bn
    Fp = Bh.shape[1]
    E = senders.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # senders
            pl.BlockSpec(memory_space=pltpu.VMEM),   # receivers
            pl.BlockSpec(memory_space=pltpu.VMEM),   # edge_mask
            pl.BlockSpec(memory_space=pltpu.VMEM),   # Ce
            pl.BlockSpec((bn, Fp), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # Bh tile
            pl.BlockSpec((bn, Fp), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # Dh tile
            pl.BlockSpec((bn, Fp), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # Eh tile
        ],
        out_specs=(
            pl.BlockSpec((bn, Fp), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # agg
            pl.BlockSpec(memory_space=pltpu.VMEM),   # e_new (full)
        ),
        scratch_shapes=[pltpu.VMEM((bn, Fp), jnp.float32),
                        pltpu.VMEM((bn, Fp), jnp.float32)],
    )
    kernel = functools.partial(_gate_kernel, be=be, bn=bn)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((num_nodes, Fp), Bh.dtype),
                   jax.ShapeDtypeStruct((E, Fp), Bh.dtype)),
        grid_spec=grid_spec,
    )(starts, ends, senders, receivers, edge_mask, Ce, Bh, Dh, Eh)


def _pad_feat(x, Fp):
    f = x.shape[-1]
    return x if f == Fp else jnp.pad(x, ((0, 0), (0, Fp - f)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def gatedgcn_gate_tiled(Bh, Dh, Eh, Ce, senders, receivers, edge_mask,
                        starts, ends, num_nodes: int, bn: int = 256,
                        be: int = 256):
    """Fused gate + aggregation; Bh/Dh/Eh [N, F], Ce [E, F]; edge arrays
    tile-local + dst-sorted + 1024-padded.  Returns (agg [N, F],
    e_new [E, F])."""
    return _gate_fwd_impl(Bh, Dh, Eh, Ce, senders, receivers, edge_mask,
                          starts, ends, num_nodes, bn, be)


def _gate_fwd_impl(Bh, Dh, Eh, Ce, senders, receivers, edge_mask, starts,
                   ends, num_nodes, bn, be):
    N, F = Bh.shape
    Fp = _round_up(max(F, 128), 128)
    agg, e_new = _gate_pallas_raw(
        _pad_feat(Bh, Fp), _pad_feat(Dh, Fp), _pad_feat(Eh, Fp),
        _pad_feat(Ce, Fp), senders, receivers,
        edge_mask.astype(jnp.float32), starts, ends,
        num_nodes=num_nodes, bn=bn, be=be)
    return agg[:, :F], e_new[:, :F]


def _gate_fwd(Bh, Dh, Eh, Ce, senders, receivers, edge_mask, starts, ends,
              num_nodes, bn, be):
    out = _gate_fwd_impl(Bh, Dh, Eh, Ce, senders, receivers, edge_mask,
                         starts, ends, num_nodes, bn, be)
    return out, (Bh, Dh, Eh, Ce, senders, receivers, edge_mask)


def _gate_bwd(num_nodes, bn, be, res, g):
    """Exact XLA VJP of gatedgcn_gate_reference."""
    Bh, Dh, Eh, Ce, senders, receivers, edge_mask = res
    g_agg, g_e = g
    em = edge_mask[:, None]
    Bs = Bh[senders]
    e_new = Dh[senders] + Eh[receivers] + Ce
    sig0 = jax.nn.sigmoid(e_new)
    sig = sig0 * em
    num = jax.ops.segment_sum(sig * Bs, receivers, num_segments=num_nodes,
                              indices_are_sorted=True)
    den = jax.ops.segment_sum(sig, receivers, num_segments=num_nodes,
                              indices_are_sorted=True)
    inv = 1.0 / (den + 1e-6)
    ghat = g_agg * inv                                # [N, F]
    c = (num * inv) * ghat                            # agg * ghat, [N, F]

    dBh = jax.ops.segment_sum(sig * ghat[receivers], senders,
                              num_segments=num_nodes,
                              indices_are_sorted=False)
    dsig = em * (Bs * ghat[receivers] - c[receivers])
    de = dsig * sig0 * (1.0 - sig0) + g_e
    dDh = jax.ops.segment_sum(de, senders, num_segments=num_nodes,
                              indices_are_sorted=False)
    dEh = jax.ops.segment_sum(de, receivers, num_segments=num_nodes,
                              indices_are_sorted=True)
    return dBh, dDh, dEh, de, None, None, None, None, None


gatedgcn_gate_tiled.defvjp(_gate_fwd, _gate_bwd)
