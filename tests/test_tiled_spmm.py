"""Tile-local batching layout + fused Pallas SpMM kernel.

The kernel itself runs in interpret mode on CPU (real-TPU numbers come from
bench_ops.py); the layout tests are backend-independent.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from signnet_basisnet_tpu import models as M
from signnet_basisnet_tpu import ops
from signnet_basisnet_tpu.data.batcher import choose_budgets, pack_batches
from signnet_basisnet_tpu.graph import batch_np, from_arrays, tile_first_fit
from signnet_basisnet_tpu.graph import segment as seg


def graphs_set(rng, count=10, lo=4, hi=12):
    gs = []
    for _ in range(count):
        n = int(rng.integers(lo, hi))
        A = np.triu((rng.random((n, n)) < 0.5).astype(int), 1)
        A = A + A.T
        s, r = np.nonzero(A)
        gs.append(dict(senders=s, receivers=r,
                       node_feat=rng.integers(0, 6, (n, 2)),
                       edge_feat=rng.integers(0, 4, len(s)),
                       y=np.array(rng.normal(size=1), np.float32)))
    return gs


def test_tile_first_fit_contract():
    rng = np.random.default_rng(0)
    gs = graphs_set(rng)
    offs = tile_first_fit(gs, tile=16, num_nodes=128)
    for g, off in zip(gs, offs):
        n = g["node_feat"].shape[0]
        assert off // 16 == (off + n - 1) // 16   # no straddling
    # non-overlap
    spans = sorted((int(o), int(o) + g["node_feat"].shape[0])
                   for g, o in zip(gs, offs))
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 <= b0


def test_tiled_batch_equivalent_results():
    """A GIN forward must give identical per-graph outputs for contiguous
    and tiled packings of the same graphs."""
    rng = np.random.default_rng(1)
    gs = graphs_set(rng)
    flat = from_arrays(batch_np(gs, 128, 1024, len(gs) + 1))
    tiled = from_arrays(batch_np(gs, 128, 1024, len(gs) + 1, tile=16))
    assert "tile_starts" in tiled.extras and "node_offset" in tiled.extras
    # tile-locality of every real edge
    s, r = np.asarray(tiled.senders), np.asarray(tiled.receivers)
    em = np.asarray(tiled.edge_mask) > 0
    assert (s[em] // 16 == r[em] // 16).all()

    model = M.gnn_model("GIN", hidden_dim=8, out_dim=8, n_layers=2,
                        pe_init="none", lap_method="none")
    key = jax.random.PRNGKey(0)
    v = model.init({"params": key}, flat, None, training=False)
    out_flat = model.apply(v, flat, None, training=False)
    out_tiled = model.apply(v, tiled, None, training=False)
    np.testing.assert_allclose(np.asarray(out_flat)[:len(gs)],
                               np.asarray(out_tiled)[:len(gs)], atol=1e-4)


def test_pack_batches_tiled():
    rng = np.random.default_rng(2)
    gs = graphs_set(rng, count=40)
    nb, eb, gcnt = choose_budgets(gs, 16, tile=16)
    assert nb % 16 == 0 and eb % 1024 == 0
    batches = pack_batches(gs, nb, eb, gcnt, tile=16)
    total = sum(int(b["graph_mask"].sum()) for b in batches)
    assert total == 40
    for b in batches:
        s, r, em = b["senders"], b["receivers"], b["edge_mask"] > 0
        assert (s[em] // 16 == r[em] // 16).all()


def _tiled_problem(rng, bn=256, n_tiles=2, e=1500, d=128):
    n = bn * n_tiles
    # tile-local random edges, sorted by receiver
    t = rng.integers(0, n_tiles, size=e)
    src = (t * bn + rng.integers(0, bn, size=e)).astype(np.int32)
    dst = (t * bn + rng.integers(0, bn, size=e)).astype(np.int32)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    w = rng.random(e).astype(np.float32)
    src, dst, w = ops.pad_edges_to(src, dst, w, 1024)
    x = rng.normal(size=(n, d)).astype(np.float32)
    starts, ends = ops.tile_edge_ranges(dst[:e], n, bn)
    return (jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst),
            jnp.asarray(w), jnp.asarray(starts), jnp.asarray(ends), n, bn, e)


def test_spmm_tiled_interpret_matches_reference():
    rng = np.random.default_rng(3)
    x, s, r, w, starts, ends, n, bn, e = _tiled_problem(rng)
    with pltpu.force_tpu_interpret_mode():
        out = ops.spmm_tiled(x, s, r, w, starts, ends, n, bn)
    ref = ops.spmm_reference(x, s, r, w, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_spmm_tiled_grads_match_reference():
    rng = np.random.default_rng(4)
    x, s, r, w, starts, ends, n, bn, e = _tiled_problem(
        rng, bn=256, n_tiles=1, e=700, d=8)

    def loss_tiled(x, w):
        return (ops.spmm_tiled(x, s, r, w, starts, ends, n, bn) ** 2).sum()

    def loss_ref(x, w):
        return (ops.spmm_reference(x, s, r, w, n) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        gx, gw = jax.grad(loss_tiled, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-3, atol=1e-3)


def test_neighbor_sum_pallas_tile_backend_interpret():
    rng = np.random.default_rng(5)
    gs = graphs_set(rng)
    nb, eb, gcnt = choose_budgets(gs, len(gs), tile=16)
    # kernel wants bn tiles; use tile=16 with _LOAD-padded edges
    arrays = pack_batches(gs, nb, eb, gcnt, tile=16)[0]
    gb = from_arrays(arrays)
    x = jnp.asarray(rng.normal(size=(gb.num_nodes, 8)).astype(np.float32))
    x = x * gb.node_mask[:, None]
    from signnet_basisnet_tpu.models.conv import neighbor_sum
    ref = neighbor_sum(x, gb)
    seg.set_agg_backend("pallas_tile")
    try:
        with pltpu.force_tpu_interpret_mode():
            out = neighbor_sum(x, gb)
    finally:
        seg.set_agg_backend("xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_signnet_gin_train_step_pallas_tile_matches_xla():
    """VERDICT r4 directive #3 wiring check: the flagship GIN+SignNet train
    step must produce the same loss/metrics and parameter update under the
    pallas_tile aggregation backend as under plain XLA scatter, on a
    tile-local batch (the bench.py 'tile' mode path, in interpret mode)."""
    from signnet_basisnet_tpu.data import add_lap_pe
    from signnet_basisnet_tpu.training import (adam, build_steps,
                                               create_state,
                                               make_zinc_predict)

    rng = np.random.default_rng(7)
    gs = graphs_set(rng, count=12)
    for g in gs:
        g["node_feat"] = g["node_feat"][:, 0]
    add_lap_pe(gs, 4)
    nb, eb, gcnt = choose_budgets(gs, len(gs), tile=16)
    gb = from_arrays(pack_batches(gs, nb, eb, gcnt, k=4, tile=16)[0])

    model = M.gnn_model("GIN", hidden_dim=8, out_dim=8, n_layers=2,
                        pos_enc_dim=4, lap_method="sign_inv",
                        sign_inv_layers=2, phi_out_dim=2,
                        batch_norm=True, dropout=0.0)
    tx = adam()
    state = create_state(model, gb, tx, model_kwargs={"pos_enc": gb.eigvecs})
    predict = make_zinc_predict(model, lap_method="sign_inv")
    train_step, _ = build_steps(predict, tx, donate=False)

    lr = jnp.float32(1e-3)
    key = jax.random.PRNGKey(0)
    _, m_x = train_step(state, gb, lr, key)

    def loss_of(params, rngs_key):
        rngs = {"dropout": rngs_key,
                "sign_flip": jax.random.fold_in(rngs_key, 1)}
        pred, _ = predict({"params": params,
                           "batch_stats": state.batch_stats},
                          gb, True, rngs, ["batch_stats"])
        from signnet_basisnet_tpu.training.train import l1_graph_loss
        return l1_graph_loss(pred, gb)

    # the backend is read at TRACE time: a cached jit executable would
    # silently keep using XLA — trace fresh functions for the tile path
    gx = jax.jit(jax.grad(loss_of))(state.params, key)
    seg.set_agg_backend("pallas_tile")
    try:
        train_step_p, _ = build_steps(predict, tx, donate=False)
        with pltpu.force_tpu_interpret_mode():
            _, m_p = train_step_p(state, gb, lr, key)
            gp = jax.jit(jax.grad(loss_of))(state.params, key)
    finally:
        seg.set_agg_backend("xla")
    np.testing.assert_allclose(float(m_x["loss"]), float(m_p["loss"]),
                               rtol=1e-4)
    # raw gradients agree (post-Adam updates are ill-conditioned to compare:
    # m/sqrt(v) at step 1 amplifies fp noise on near-zero grads)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_spmm_tile_dense_matches_reference():
    """tile_dense (r5): block adjacency built once + batched matmul must
    reproduce the reference segment-sum, values and x-gradients."""
    rng = np.random.default_rng(8)
    x, s, r, w, starts, ends, n, bn, e = _tiled_problem(rng)
    out = ops.spmm_tile_dense(x, s, r, w, n, bn)
    ref = ops.spmm_reference(x, s, r, w, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def loss_td(x):
        return (ops.spmm_tile_dense(x, s, r, w, n, bn) ** 2).sum()

    def loss_ref(x):
        return (ops.spmm_reference(x, s, r, w, n) ** 2).sum()

    gx = jax.grad(loss_td)(x)
    rx = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-3, atol=1e-3)


def test_signnet_gin_train_step_tile_dense_matches_xla():
    """The flagship GIN+SignNet train step under the tile_dense backend
    must match plain XLA scatter aggregation (loss + parameter grads) —
    pure-XLA backend, runs natively on CPU."""
    from signnet_basisnet_tpu.data import add_lap_pe
    from signnet_basisnet_tpu.training import (adam, build_steps,
                                               create_state,
                                               make_zinc_predict)

    rng = np.random.default_rng(9)
    gs = graphs_set(rng, count=12)
    for g in gs:
        g["node_feat"] = g["node_feat"][:, 0]
    add_lap_pe(gs, 4)
    nb, eb, gcnt = choose_budgets(gs, len(gs), tile=16)
    gb = from_arrays(pack_batches(gs, nb, eb, gcnt, k=4, tile=16)[0])

    model = M.gnn_model("GIN", hidden_dim=8, out_dim=8, n_layers=2,
                        pos_enc_dim=4, lap_method="sign_inv",
                        sign_inv_layers=2, phi_out_dim=2,
                        batch_norm=True, dropout=0.0)
    tx = adam()
    state = create_state(model, gb, tx, model_kwargs={"pos_enc": gb.eigvecs})
    predict = make_zinc_predict(model, lap_method="sign_inv")
    train_step, _ = build_steps(predict, tx, donate=False)

    lr = jnp.float32(1e-3)
    key = jax.random.PRNGKey(0)
    _, m_x = train_step(state, gb, lr, key)

    def loss_of(params, rngs_key):
        rngs = {"dropout": rngs_key,
                "sign_flip": jax.random.fold_in(rngs_key, 1)}
        pred, _ = predict({"params": params,
                           "batch_stats": state.batch_stats},
                          gb, True, rngs, ["batch_stats"])
        from signnet_basisnet_tpu.training.train import l1_graph_loss
        return l1_graph_loss(pred, gb)

    gx = jax.jit(jax.grad(loss_of))(state.params, key)
    seg.set_agg_backend("tile_dense")
    try:
        train_step_d, _ = build_steps(predict, tx, donate=False)
        _, m_d = train_step_d(state, gb, lr, key)
        gd = jax.jit(jax.grad(loss_of))(state.params, key)
    finally:
        seg.set_agg_backend("xla")
    np.testing.assert_allclose(float(m_x["loss"]), float(m_d["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_tile_block_adj_drops_nonlocal_edges():
    """Edges violating tile-locality are dropped (same contract as the
    Pallas kernel: the layout is the batcher's responsibility)."""
    import jax.numpy as jnp
    bn, n = 8, 16
    senders = np.array([0, 1, 9, 2], np.int32)     # edge 2: src tile 1
    receivers = np.array([1, 2, 3, 10], np.int32)  # edge 3: dst tile 1, src tile 0
    w = np.ones(4, np.float32)
    adj = np.asarray(ops.tile_block_adj(
        jnp.asarray(senders), jnp.asarray(receivers), jnp.asarray(w), n, bn))
    assert adj.shape == (2, bn, bn)
    assert adj[0, 1, 0] == 1 and adj[0, 2, 1] == 1   # local edges kept
    assert adj.sum() == 2                             # cross-tile edges dropped
