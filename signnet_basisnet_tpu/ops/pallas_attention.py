"""Fused sparse graph-transformer attention (Pallas TPU kernel).

One kernel computes, per destination node n:

    score_e = sum_d K[src_e]*Q[dst_e]*E1_e / sqrt(D)   (per head; SDDMM)
    s_e     = exp(clip(score_e, -5, 5)) * edge_mask_e  (clamped-exp softmax
                                                        numerator)
    out_n   = (sum_{e->n} s_e * V[src_e]) / (sum_{e->n} s_e + 1e-6)

i.e. the whole of the reference's DGL attention pipeline
(`src_dot_dst` + `scaling` + `imp_exp_attn` + `exp` + the two
`send_and_recv` SpMMs — reference: GraphPrediction/layers/transformer.py:
14-52, 78-92) fused into a single pass over the edge list.  The XLA
lowering of the same math materializes the gathered K/Q/V rows and the
edge scores in HBM between fusions; the fused kernel keeps everything in
VMEM and turns every gather/scatter into an MXU one-hot matmul.

Layout contract (same as ops/pallas_spmm.spmm_tiled): batches packed with
``batch_np(tile=bn)`` so both endpoints of every edge live in one bn-sized
node tile; edges sorted by destination; per-tile contiguous edge ranges via
``tile_starts``/``tile_ends``; edge arrays padded to a multiple of 1024.

Forward AND backward are Pallas: the custom VJP saves the per-destination
normalizer from the forward and recomputes edge scores tile-locally in the
backward kernel (flash-attention-style rematerialization), so dQ/dK/dV/dE1
are produced in one fused pass too — the r2 version's plain-XLA backward
gave up the forward's win at train-step level (1.22x fwd -> 1.03x
fwd+bwd); gradient parity vs the XLA reference is tested in
tests/test_pallas_attention.py.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOAD = 1024      # 1-D 32-bit VMEM load alignment granularity
_HP = 128         # padded head-count lane dim for the per-head score block


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def edge_softmax_attention_reference(Q, K, V, E1, senders, receivers,
                                     edge_mask, num_nodes: int):
    """Pure-XLA reference: Q/K/V [N, H, D], E1 [E, H, D] or None."""
    D = Q.shape[-1]
    score = K[senders] * Q[receivers] / math.sqrt(D)
    if E1 is not None:
        score = score * E1
    s = jnp.exp(jnp.clip(score.sum(-1, keepdims=True), -5.0, 5.0))
    s = s * edge_mask[:, None, None]
    wV = jax.ops.segment_sum(s * V[senders], receivers,
                             num_segments=num_nodes, indices_are_sorted=True)
    z = jax.ops.segment_sum(s, receivers, num_segments=num_nodes,
                            indices_are_sorted=True)
    return wV / (z + 1e-6)


def _attn_kernel(starts_ref, ends_ref, senders_ref, receivers_ref, em_ref,
                 e1_ref, q_ref, k_ref, v_ref, out_ref, den_out_ref,
                 acc_ref, den_ref,
                 *, be: int, bn: int, H: int, D: int, Fp: int):
    i = pl.program_id(0)
    n_lo = i * bn
    start = starts_ref[i]
    end = ends_ref[i]

    acc_ref[:] = jnp.zeros_like(acc_ref)
    den_ref[:] = jnp.zeros_like(den_ref)

    # Per-head membership indicators (static):
    #   M [Fp, _HP]: M[f, h] = 1 if feature f belongs to head h (f < H*D)
    f_ids = jax.lax.broadcasted_iota(jnp.int32, (Fp, _HP), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (Fp, _HP), 1)
    M = ((h_ids == f_ids // D) & (f_ids < H * D)).astype(jnp.float32)
    # valid-head column mask [_HP]
    hcol = jax.lax.broadcasted_iota(jnp.int32, (1, _HP), 1)[0]
    head_ok = (hcol < H).astype(jnp.float32)

    c0 = start // _LOAD
    num_chunks = pl.cdiv(end, _LOAD) - c0
    subs = _LOAD // be

    def body(c, _):
        e_lo = pl.multiple_of((c0 + c) * _LOAD, _LOAD)
        src_all = senders_ref[pl.ds(e_lo, _LOAD)]
        dst_all = receivers_ref[pl.ds(e_lo, _LOAD)]
        em_all = em_ref[pl.ds(e_lo, _LOAD)]
        e1_all = e1_ref[pl.ds(e_lo, _LOAD), :]
        offs_all = (jax.lax.broadcasted_iota(jnp.int32, (_LOAD, 1), 0)[:, 0]
                    + e_lo)
        for j in range(subs):               # static unroll over be-subchunks
            sl = slice(j * be, (j + 1) * be)
            src = src_all[sl] - n_lo
            dst = dst_all[sl] - n_lo
            valid = (offs_all[sl] >= start) & (offs_all[sl] < end)
            we = em_all[sl] * valid.astype(jnp.float32)

            col = jax.lax.broadcasted_iota(jnp.int32, (be, bn), 1)
            src_oh = (col == src[:, None]).astype(jnp.float32)
            dst_oh = (col == dst[:, None]).astype(jnp.float32)

            # SDDMM: gather K/Q rows on the MXU, modulate by E1, reduce per
            # head with the indicator matmul (1/sqrt(D) pre-folded into Q)
            Kg = jnp.dot(src_oh, k_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            Qg = jnp.dot(dst_oh, q_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            prod = Kg * Qg * e1_all[sl]
            sc = jnp.dot(prod, M, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            # clamped-exp softmax numerator (reference transformer.py:35-52),
            # masked to real edges and real heads
            s = jnp.exp(jnp.clip(sc, -5.0, 5.0))
            s = s * we[:, None] * head_ok[None, :]

            # value aggregation: expand s back to feature lanes, weight the
            # gathered V rows, scatter both numerator and denominator
            Vg = jnp.dot(src_oh, v_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            wv = jnp.dot(s, M.T, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST) * Vg
            acc_ref[:] += jnp.dot(dst_oh.T, wv,
                                  preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            den_ref[:] += jnp.dot(dst_oh.T, s,
                                  preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        return ()

    jax.lax.fori_loop(0, num_chunks, body, ())
    den_exp = jnp.dot(den_ref[:], M.T, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = (acc_ref[:] / (den_exp + 1e-6)).astype(out_ref.dtype)
    den_out_ref[:] = den_ref[:].astype(den_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_nodes", "H", "D", "bn",
                                             "be"))
def _attn_pallas_raw(Qf, Kf, Vf, E1f, senders, receivers, edge_mask,
                     starts, ends, num_nodes: int, H: int, D: int,
                     bn: int, be: int):
    n_tiles = num_nodes // bn
    Fp = Qf.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # senders
            pl.BlockSpec(memory_space=pltpu.VMEM),   # receivers
            pl.BlockSpec(memory_space=pltpu.VMEM),   # edge_mask
            pl.BlockSpec(memory_space=pltpu.VMEM),   # E1 (padded features)
            pl.BlockSpec((bn, Fp), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # Q tile
            pl.BlockSpec((bn, Fp), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # K tile
            pl.BlockSpec((bn, Fp), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # V tile
        ],
        out_specs=[pl.BlockSpec((bn, Fp), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bn, _HP), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((bn, Fp), jnp.float32),
                        pltpu.VMEM((bn, _HP), jnp.float32)],
    )
    kernel = functools.partial(_attn_kernel, be=be, bn=bn, H=H, D=D, Fp=Fp)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((num_nodes, Fp), Qf.dtype),
                   jax.ShapeDtypeStruct((num_nodes, _HP), jnp.float32)),
        grid_spec=grid_spec,
    )(starts, ends, senders, receivers, edge_mask, E1f, Qf, Kf, Vf)


def _pad_feat(x, Fp):
    f = x.shape[-1]
    if f == Fp:
        return x
    return jnp.pad(x, ((0, 0), (0, Fp - f)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def edge_softmax_attention_tiled(Q, K, V, E1, senders, receivers, edge_mask,
                                 starts, ends, num_nodes: int, bn: int = 256,
                                 be: int = 256):
    """Fused attention; Q/K/V [N, H, D], E1 [E, H, D] (pass ones for the
    unmodulated variant), edge arrays tile-local + dst-sorted + padded to a
    multiple of 1024 (the batch_np(tile=bn) contract); ``starts``/``ends`` =
    the batch's tile_starts/tile_ends extras.  Returns [N, H, D].
    """
    return _attn_fwd_impl(Q, K, V, E1, senders, receivers, edge_mask,
                          starts, ends, num_nodes, bn, be)


def _prepare(Q, K, V, E1, senders):
    N, H, D = Q.shape
    Fp = _round_up(max(H * D, 128), 128)
    inv = 1.0 / math.sqrt(D)
    Qf = _pad_feat((Q * inv).reshape(N, H * D), Fp)
    Kf = _pad_feat(K.reshape(N, H * D), Fp)
    Vf = _pad_feat(V.reshape(N, H * D), Fp)
    # pad E1 rows to the (1024-aligned) edge-array length, features to Fp;
    # padded feature lanes must be 1 (multiplicative modulation), but the
    # head-indicator matmul ignores lanes >= H*D, so zeros are fine too.
    E = senders.shape[0]
    E1f = _pad_feat(E1.reshape(E1.shape[0], H * D), Fp)
    if E1f.shape[0] != E:
        E1f = jnp.pad(E1f, ((0, E - E1f.shape[0]), (0, 0)))
    return Qf, Kf, Vf, E1f, Fp, inv


def _attn_fwd_impl(Q, K, V, E1, senders, receivers, edge_mask, starts, ends,
                   num_nodes, bn, be):
    N, H, D = Q.shape
    Qf, Kf, Vf, E1f, Fp, inv = _prepare(Q, K, V, E1, senders)
    out, _den = _attn_pallas_raw(Qf, Kf, Vf, E1f, senders, receivers,
                                 edge_mask.astype(jnp.float32), starts, ends,
                                 num_nodes=num_nodes, H=H, D=D, bn=bn, be=be)
    return out[:, :H * D].reshape(N, H, D)


def _attn_fwd(Q, K, V, E1, senders, receivers, edge_mask, starts, ends,
              num_nodes, bn, be):
    N, H, D = Q.shape
    Qf, Kf, Vf, E1f, Fp, inv = _prepare(Q, K, V, E1, senders)
    emf = edge_mask.astype(jnp.float32)
    outf, den = _attn_pallas_raw(Qf, Kf, Vf, E1f, senders, receivers,
                                 emf, starts, ends,
                                 num_nodes=num_nodes, H=H, D=D, bn=bn, be=be)
    out = outf[:, :H * D].reshape(N, H, D)
    return out, (Qf, Kf, Vf, E1f, senders, receivers, emf, starts, ends,
                 outf, den, Q.shape, E1.shape)


def _attn_bwd_kernel(starts_ref, ends_ref, senders_ref, receivers_ref,
                     em_ref, e1_ref, q_ref, k_ref, v_ref, ghat_ref, c_ref,
                     dq_ref, dk_ref, dv_ref, de1_ref,
                     *, be: int, bn: int, H: int, D: int, Fp: int):
    """Fused backward: same tile-local pass as the forward; recomputes the
    clamped-exp scores and scatters dQ/dK/dV with one-hot MXU matmuls.
    ``q_ref`` holds the 1/sqrt(D)-scaled Q (as in the forward); the returned
    dQ is therefore wrt the SCALED Q and gets re-scaled outside.  dE1 is an
    edge-space output shared by all grid steps: zeroed at step 0, then
    accumulated (chunks at tile boundaries are visited by both tiles, each
    contributing only its own valid-masked rows)."""
    i = pl.program_id(0)
    n_lo = i * bn
    start = starts_ref[i]
    end = ends_ref[i]

    dq_ref[:] = jnp.zeros_like(dq_ref)
    dk_ref[:] = jnp.zeros_like(dk_ref)
    dv_ref[:] = jnp.zeros_like(dv_ref)

    @pl.when(i == 0)
    def _zero_de1():
        de1_ref[:] = jnp.zeros_like(de1_ref)

    f_ids = jax.lax.broadcasted_iota(jnp.int32, (Fp, _HP), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (Fp, _HP), 1)
    M = ((h_ids == f_ids // D) & (f_ids < H * D)).astype(jnp.float32)
    hcol = jax.lax.broadcasted_iota(jnp.int32, (1, _HP), 1)[0]
    head_ok = (hcol < H).astype(jnp.float32)

    c0 = start // _LOAD
    num_chunks = pl.cdiv(end, _LOAD) - c0
    subs = _LOAD // be
    HI = jax.lax.Precision.HIGHEST

    def body(c, _):
        e_lo = pl.multiple_of((c0 + c) * _LOAD, _LOAD)
        src_all = senders_ref[pl.ds(e_lo, _LOAD)]
        dst_all = receivers_ref[pl.ds(e_lo, _LOAD)]
        em_all = em_ref[pl.ds(e_lo, _LOAD)]
        e1_all = e1_ref[pl.ds(e_lo, _LOAD), :]
        offs_all = (jax.lax.broadcasted_iota(jnp.int32, (_LOAD, 1), 0)[:, 0]
                    + e_lo)
        for j in range(subs):
            sl = slice(j * be, (j + 1) * be)
            src = src_all[sl] - n_lo
            dst = dst_all[sl] - n_lo
            valid = (offs_all[sl] >= start) & (offs_all[sl] < end)
            we = em_all[sl] * valid.astype(jnp.float32)
            e1 = e1_all[sl]

            col = jax.lax.broadcasted_iota(jnp.int32, (be, bn), 1)
            src_oh = (col == src[:, None]).astype(jnp.float32)
            dst_oh = (col == dst[:, None]).astype(jnp.float32)

            Kg = jnp.dot(src_oh, k_ref[:],
                         preferred_element_type=jnp.float32, precision=HI)
            Qg = jnp.dot(dst_oh, q_ref[:],
                         preferred_element_type=jnp.float32, precision=HI)
            Vg = jnp.dot(src_oh, v_ref[:],
                         preferred_element_type=jnp.float32, precision=HI)
            Gg = jnp.dot(dst_oh, ghat_ref[:],
                         preferred_element_type=jnp.float32, precision=HI)
            Cg = jnp.dot(dst_oh, c_ref[:],
                         preferred_element_type=jnp.float32, precision=HI)

            prod = Kg * Qg * e1
            sc = jnp.dot(prod, M, preferred_element_type=jnp.float32,
                         precision=HI)
            s = jnp.exp(jnp.clip(sc, -5.0, 5.0))
            s = s * we[:, None] * head_ok[None, :]
            clip_ok = ((sc > -5.0) & (sc < 5.0)).astype(jnp.float32)

            # ds_e = (V_src . ghat_dst)_head - c_dst ; dscore = ds * s * 1{|sc|<5}
            vg_dot = jnp.dot(Vg * Gg, M, preferred_element_type=jnp.float32,
                             precision=HI)
            dscore = (vg_dot - Cg) * s * clip_ok            # [be, _HP]

            sf = jnp.dot(s, M.T, preferred_element_type=jnp.float32,
                         precision=HI)                       # [be, Fp]
            dsf = jnp.dot(dscore, M.T, preferred_element_type=jnp.float32,
                          precision=HI)

            dVc = sf * Gg
            dKc = Qg * e1 * dsf
            dQc = Kg * e1 * dsf
            dE1c = Kg * Qg * dsf

            dv_ref[:] += jnp.dot(src_oh.T, dVc,
                                 preferred_element_type=jnp.float32,
                                 precision=HI)
            dk_ref[:] += jnp.dot(src_oh.T, dKc,
                                 preferred_element_type=jnp.float32,
                                 precision=HI)
            dq_ref[:] += jnp.dot(dst_oh.T, dQc,
                                 preferred_element_type=jnp.float32,
                                 precision=HI)
            de1_ref[pl.ds(e_lo + j * be, be), :] += dE1c
        return ()

    jax.lax.fori_loop(0, num_chunks, body, ())


@functools.partial(jax.jit, static_argnames=("num_nodes", "H", "D", "bn",
                                             "be"))
def _attn_bwd_pallas_raw(Qf, Kf, Vf, E1f, ghatf, cf, senders, receivers,
                         edge_mask, starts, ends, num_nodes: int, H: int,
                         D: int, bn: int, be: int):
    n_tiles = num_nodes // bn
    Fp = Qf.shape[1]
    E = senders.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # senders
            pl.BlockSpec(memory_space=pltpu.VMEM),   # receivers
            pl.BlockSpec(memory_space=pltpu.VMEM),   # edge_mask
            pl.BlockSpec(memory_space=pltpu.VMEM),   # E1 (padded features)
            pl.BlockSpec((bn, Fp), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # Q tile (scaled)
            pl.BlockSpec((bn, Fp), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # K tile
            pl.BlockSpec((bn, Fp), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # V tile
            pl.BlockSpec((bn, Fp), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # ghat tile
            pl.BlockSpec((bn, _HP), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),   # c tile
        ],
        out_specs=[pl.BlockSpec((bn, Fp), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM),      # dQ
                   pl.BlockSpec((bn, Fp), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM),      # dK
                   pl.BlockSpec((bn, Fp), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM),      # dV
                   pl.BlockSpec(memory_space=pltpu.VMEM)],     # dE1 (full)
    )
    kernel = functools.partial(_attn_bwd_kernel, be=be, bn=bn, H=H, D=D,
                               Fp=Fp)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((num_nodes, Fp), jnp.float32),
                   jax.ShapeDtypeStruct((num_nodes, Fp), jnp.float32),
                   jax.ShapeDtypeStruct((num_nodes, Fp), jnp.float32),
                   jax.ShapeDtypeStruct((E, Fp), jnp.float32)),
        grid_spec=grid_spec,
    )(starts, ends, senders, receivers, edge_mask, E1f, Qf, Kf, Vf,
      ghatf, cf)


def _attn_bwd(num_nodes, bn, be, res, g):
    """Fused Pallas backward (same tile-local layout as the forward)."""
    (Qf, Kf, Vf, E1f, senders, receivers, emf, starts, ends,
     outf, den, q_shape, e1_shape) = res
    N, H, D = q_shape
    Fp = Qf.shape[1]
    inv = 1.0 / math.sqrt(D)

    gf = _pad_feat(g.reshape(N, H * D).astype(jnp.float32), Fp)
    # per-lane denominator: repeat the per-head sums across the D lanes
    den_lanes = _pad_feat(jnp.repeat(den[:, :H], D, axis=1), Fp)
    ghatf = gf / (den_lanes + 1e-6)
    # c_n,h = sum_d out * ghat (computed on the real H*D lanes)
    c_h = (outf[:, :H * D] * ghatf[:, :H * D]).reshape(N, H, D).sum(-1)
    cf = jnp.pad(c_h, ((0, 0), (0, _HP - H)))

    dQf, dKf, dVf, dE1f = _attn_bwd_pallas_raw(
        Qf, Kf, Vf, E1f, ghatf, cf, senders, receivers, emf, starts, ends,
        num_nodes=num_nodes, H=H, D=D, bn=bn, be=be)
    dQ = (dQf[:, :H * D] * inv).reshape(N, H, D)
    dK = dKf[:, :H * D].reshape(N, H, D)
    dV = dVf[:, :H * D].reshape(N, H, D)
    dE1 = dE1f[:e1_shape[0], :H * D].reshape(e1_shape)
    return dQ, dK, dV, dE1, None, None, None, None, None


edge_softmax_attention_tiled.defvjp(_attn_fwd, _attn_bwd)
