"""Newer components: Set2Set, NetGINE, TransformerDeepSigns, LSPE/lapeig,
full-graph transform + full-graph transformer, dense node round-trip."""
import numpy as np
import jax
import jax.numpy as jnp

from signnet_basisnet_tpu.data.transforms import make_full_graph
from signnet_basisnet_tpu.graph import (batch_np, from_arrays,
                                        from_dense_nodes, to_dense_nodes)
from signnet_basisnet_tpu import models as M
from signnet_basisnet_tpu.nn import Set2Set


def tiny(rng, n=6):
    A = np.triu((rng.random((n, n)) < 0.5).astype(int), 1)
    A = A + A.T
    s, r = np.nonzero(A)
    return dict(senders=s, receivers=r,
                node_feat=rng.integers(0, 6, (n, 2)),
                edge_feat=rng.integers(0, 4, len(s)),
                y=np.array(rng.normal(size=12), np.float32))


def make(rng, **kw):
    gs = [tiny(rng, 5), tiny(rng, 7)]
    return from_arrays(batch_np(gs, 16, 64, 4, **kw))


def test_dense_node_roundtrip():
    rng = np.random.default_rng(0)
    gb = make(rng)
    x = jnp.asarray(rng.normal(size=(gb.num_nodes, 3)).astype(np.float32))
    x = x * gb.node_mask[:, None]
    dense, mask = to_dense_nodes(gb, x, n_max=8)
    back = from_dense_nodes(gb, dense)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)
    assert float(mask.sum()) == float(gb.node_mask.sum())


def test_set2set_masked():
    rng = np.random.default_rng(1)
    gb = make(rng)
    x = jnp.asarray(rng.normal(size=(gb.num_nodes, 4)).astype(np.float32))
    x = x * gb.node_mask[:, None]
    mod = Set2Set(4, processing_steps=2)
    variables = mod.init(jax.random.PRNGKey(0), x, gb.graph_id,
                         gb.num_graphs, gb.node_mask)
    out = mod.apply(variables, x, gb.graph_id, gb.num_graphs, gb.node_mask)
    assert out.shape == (gb.num_graphs, 8)
    # padding-node values must not affect output
    garbage = x + 50.0 * (1 - gb.node_mask[:, None])
    out2 = mod.apply(variables, garbage, gb.graph_id, gb.num_graphs,
                     gb.node_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-4)


def test_netgine_forward():
    rng = np.random.default_rng(2)
    gb = make(rng)
    model = M.NetGINE(hidden=8, num_layers=2, out=12)
    variables = model.init({"params": jax.random.PRNGKey(0)}, gb,
                           training=False)
    out = model.apply(variables, gb, training=False)
    assert out.shape == (gb.num_graphs, 12)
    assert np.all(np.isfinite(np.asarray(out)))


def test_transformer_deepsigns_sign_invariance():
    rng = np.random.default_rng(3)
    gb = make(rng)
    pe = jnp.asarray(rng.normal(size=(gb.num_nodes, 4)).astype(np.float32))
    pe = pe * gb.node_mask[:, None]
    model = M.TransformerDeepSigns(hidden=8, num_layers=2, k=4, n_max=8)
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, gb, pe, training=False)
    a = model.apply(variables, gb, pe, training=False,
                    mutable=["batch_stats"])[0]
    flips = jnp.asarray(np.where(rng.random(4) < 0.5, -1.0, 1.0))
    b = model.apply(variables, gb, pe * flips[None, :], training=False,
                    mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    assert a.shape == (gb.num_nodes, 4)


def test_lapeig_loss_and_lspe():
    rng = np.random.default_rng(4)
    gb = make(rng)
    p = jnp.asarray(rng.normal(size=(gb.num_nodes, 3)).astype(np.float32))
    p = p * gb.node_mask[:, None]
    tr, ortho = M.lapeig_loss(gb, p)
    assert np.isfinite(float(tr)) and float(ortho) >= 0
    pn = M.normalize_p(gb, p)
    # per-graph column norms ~1 for real graphs
    from signnet_basisnet_tpu.graph import segment as seg
    norms = seg.pool_nodes(np.asarray(pn) ** 2, gb.graph_id, gb.num_graphs,
                           node_mask=gb.node_mask, reduce="sum")
    real = np.asarray(gb.graph_mask) > 0
    np.testing.assert_allclose(np.asarray(norms)[real], 1.0, atol=1e-4)


def test_full_graph_transform_and_transformer():
    rng = np.random.default_rng(5)
    gs = [make_full_graph(tiny(rng, 5)), make_full_graph(tiny(rng, 6))]
    for g in gs:
        g["y"] = np.array([0.5], np.float32)
        g["node_feat"] = g["node_feat"][:, 0]  # ZINC nets embed scalar codes
    gb = from_arrays(batch_np(gs, 16, 64, 4))
    assert "edge_real" in gb.extras
    n_real_edges = sum(g["edge_real"].sum() for g in gs)
    assert float((gb.extras["edge_real"] * gb.edge_mask).sum()) == n_real_edges
    # complete graphs: 5*4 + 6*5 = 50 directed edges
    assert float(gb.edge_mask.sum()) == 50

    model = M.TransformerNet(hidden_dim=8, out_dim=8, n_layers=2, num_heads=2,
                             pe_init="none", lap_method="none",
                             full_graph=True, edge_feat=True)
    variables = model.init({"params": jax.random.PRNGKey(0)}, gb, None,
                           training=False)
    out = model.apply(variables, gb, None, training=False,
                      mutable=["batch_stats"])[0]
    assert np.all(np.isfinite(np.asarray(out)))
