"""Fused edge-softmax attention kernel: forward + gradient parity vs the
pure-XLA reference (interpret mode on CPU; TPU numbers from bench_ops.py)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from signnet_basisnet_tpu import ops


def _problem(rng, bn=256, n_tiles=2, e=900, H=8, D=10):
    n = bn * n_tiles
    t = rng.integers(0, n_tiles, size=e)
    src = (t * bn + rng.integers(0, bn, size=e)).astype(np.int32)
    dst = (t * bn + rng.integers(0, bn, size=e)).astype(np.int32)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    em = (rng.random(e) < 0.9).astype(np.float32)
    src, dst, em = ops.pad_edges_to(src, dst, em, 1024)
    starts, ends = ops.tile_edge_ranges(dst[:e], n, bn)
    Q = rng.normal(size=(n, H, D)).astype(np.float32)
    K = rng.normal(size=(n, H, D)).astype(np.float32)
    V = rng.normal(size=(n, H, D)).astype(np.float32)
    E1 = rng.normal(size=(len(src), H, D)).astype(np.float32)
    return (jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V), jnp.asarray(E1),
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(em),
            jnp.asarray(starts), jnp.asarray(ends), n, bn)


def test_attention_forward_matches_reference():
    rng = np.random.default_rng(0)
    Q, K, V, E1, s, r, em, starts, ends, n, bn = _problem(rng)
    with pltpu.force_tpu_interpret_mode():
        out = ops.edge_softmax_attention_tiled(Q, K, V, E1, s, r, em,
                                               starts, ends, n, bn)
    ref = ops.edge_softmax_attention_reference(Q, K, V, E1, s, r, em, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_attention_forward_no_edge_modulation():
    rng = np.random.default_rng(1)
    Q, K, V, E1, s, r, em, starts, ends, n, bn = _problem(
        rng, n_tiles=1, e=400, H=4, D=16)
    ones = jnp.ones_like(E1)
    with pltpu.force_tpu_interpret_mode():
        out = ops.edge_softmax_attention_tiled(Q, K, V, ones, s, r, em,
                                               starts, ends, n, bn)
    ref = ops.edge_softmax_attention_reference(Q, K, V, None, s, r, em, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_attention_grads_match_reference():
    rng = np.random.default_rng(2)
    Q, K, V, E1, s, r, em, starts, ends, n, bn = _problem(
        rng, n_tiles=1, e=500, H=2, D=8)

    def loss_tiled(Q, K, V, E1):
        out = ops.edge_softmax_attention_tiled(Q, K, V, E1, s, r, em,
                                               starts, ends, n, bn)
        return (out ** 2).sum()

    def loss_ref(Q, K, V, E1):
        out = ops.edge_softmax_attention_reference(Q, K, V, E1, s, r, em, n)
        return (out ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        gs = jax.grad(loss_tiled, argnums=(0, 1, 2, 3))(Q, K, V, E1)
    rs = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(Q, K, V, E1)
    for a, b, name in zip(gs, rs, "QKVE"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"grad {name}")


def test_transformer_net_pallas_backend_matches_xla():
    """Full ZINC TransformerNet forward on a tiled batch: fused-attention
    backend vs XLA backend, shared params."""
    from signnet_basisnet_tpu import models as M
    from signnet_basisnet_tpu.data.batcher import choose_budgets, pack_batches
    from signnet_basisnet_tpu.graph import from_arrays
    from signnet_basisnet_tpu.graph import segment as seg

    rng = np.random.default_rng(3)
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

    model = M.gnn_model("Transformer", hidden_dim=16, out_dim=16, n_layers=2,
                        num_heads=4, pe_init="none", lap_method="none",
                        edge_feat=True)
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
