"""Fused GatedGCN gate kernel: forward + gradient parity vs the XLA
reference (interpret mode on CPU; TPU numbers from bench_ops.py)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from signnet_basisnet_tpu import ops


def _problem(rng, bn=256, n_tiles=2, e=900, F=70):
    n = bn * n_tiles
    t = rng.integers(0, n_tiles, size=e)
    src = (t * bn + rng.integers(0, bn, size=e)).astype(np.int32)
    dst = (t * bn + rng.integers(0, bn, size=e)).astype(np.int32)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    em = (rng.random(e) < 0.9).astype(np.float32)
    src, dst, em = ops.pad_edges_to(src, dst, em, 1024)
    starts, ends = ops.tile_edge_ranges(dst[:e], n, bn)
    Bh = rng.normal(size=(n, F)).astype(np.float32)
    Dh = rng.normal(size=(n, F)).astype(np.float32)
    Eh = rng.normal(size=(n, F)).astype(np.float32)
    Ce = rng.normal(size=(len(src), F)).astype(np.float32)
    return (jnp.asarray(Bh), jnp.asarray(Dh), jnp.asarray(Eh),
            jnp.asarray(Ce), jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(em), jnp.asarray(starts), jnp.asarray(ends),
            n, bn, e)


def test_gate_forward_matches_reference():
    rng = np.random.default_rng(0)
    Bh, Dh, Eh, Ce, s, r, em, starts, ends, n, bn, e = _problem(rng)
    with pltpu.force_tpu_interpret_mode():
        agg, e_new = ops.gatedgcn_gate_tiled(Bh, Dh, Eh, Ce, s, r, em,
                                             starts, ends, n, bn)
    ragg, re_new = ops.gatedgcn_gate_reference(Bh, Dh, Eh, Ce, s, r, em, n)
    np.testing.assert_allclose(np.asarray(agg), np.asarray(ragg),
                               rtol=1e-4, atol=1e-4)
    # e_new rows: compare on real edges (padding rows may differ)
    np.testing.assert_allclose(np.asarray(e_new)[:e], np.asarray(re_new)[:e],
                               rtol=1e-4, atol=1e-4)


def test_gate_grads_match_reference():
    rng = np.random.default_rng(1)
    Bh, Dh, Eh, Ce, s, r, em, starts, ends, n, bn, e = _problem(
        rng, n_tiles=1, e=500, F=16)

    def loss_tiled(Bh, Dh, Eh, Ce):
        agg, e_new = ops.gatedgcn_gate_tiled(Bh, Dh, Eh, Ce, s, r, em,
                                             starts, ends, n, bn)
        return (agg ** 2).sum() + ((e_new ** 2) * em[:, None]).sum()

    def loss_ref(Bh, Dh, Eh, Ce):
        agg, e_new = ops.gatedgcn_gate_reference(Bh, Dh, Eh, Ce, s, r, em, n)
        return (agg ** 2).sum() + ((e_new ** 2) * em[:, None]).sum()

    with pltpu.force_tpu_interpret_mode():
        gs = jax.grad(loss_tiled, argnums=(0, 1, 2, 3))(Bh, Dh, Eh, Ce)
    rs = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(Bh, Dh, Eh, Ce)
    for a, b, name in zip(gs, rs, ["Bh", "Dh", "Eh", "Ce"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"grad {name}")


def test_gatedgcn_net_pallas_backend_matches_xla():
    """Full ZINC GatedGCNNet forward on a tiled batch: fused-gate backend
    vs XLA backend, shared params."""
    from signnet_basisnet_tpu import models as M
    from signnet_basisnet_tpu.data.batcher import choose_budgets, pack_batches
    from signnet_basisnet_tpu.graph import from_arrays
    from signnet_basisnet_tpu.graph import segment as seg

    rng = np.random.default_rng(2)
    gs = []
    for _ in range(6):
        n = int(rng.integers(5, 12))
        A = np.triu((rng.random((n, n)) < 0.5).astype(int), 1)
        A = A + A.T
        s, r = np.nonzero(A)
        gs.append(dict(senders=s, receivers=r,
                       node_feat=rng.integers(0, 6, (n, 1)),
                       edge_feat=rng.integers(0, 4, len(s)),
                       y=np.array(rng.normal(size=1), np.float32)))
    nb, eb, gcnt = choose_budgets(gs, len(gs), tile=16)
    gb = from_arrays(pack_batches(gs, nb, eb, gcnt, tile=16)[0])

    model = M.gnn_model("GatedGCN", hidden_dim=16, out_dim=16, n_layers=2,
                        pe_init="none", lap_method="none", edge_feat=True)
    key = jax.random.PRNGKey(0)
    v = model.init({"params": key}, gb, None, training=False)
    ref = model.apply(v, gb, None, training=False)
    seg.set_agg_backend("pallas_tile")
    try:
        with pltpu.force_tpu_interpret_mode():
            out = model.apply(v, gb, None, training=False)
    finally:
        seg.set_agg_backend("xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)
