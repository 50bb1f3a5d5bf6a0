"""Round-1 gap components: GatedGCN-LSPE, PNANoTowers + GRU, GAT/transformer
phi, GraphiT k_RW weighting, DOS hooks, MLPReadout2, k-fold harness."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from signnet_basisnet_tpu.data.transforms import make_full_graph
from signnet_basisnet_tpu.graph import batch_np, from_arrays
from signnet_basisnet_tpu import models as M
from signnet_basisnet_tpu.models.conv import GatedGCNLSPELayer
from signnet_basisnet_tpu.nn.mlp import MLPReadout2
from signnet_basisnet_tpu.training.train import k_fold_split


def tiny(rng, n=6):
    A = np.triu((rng.random((n, n)) < 0.5).astype(int), 1)
    A = A + A.T
    s, r = np.nonzero(A)
    return dict(senders=s, receivers=r,
                node_feat=rng.integers(0, 6, (n, 2)),
                edge_feat=rng.integers(0, 4, len(s)),
                y=np.array(rng.normal(size=1), np.float32))


def make(rng, k=None):
    gs = []
    for n in (5, 7):
        g = tiny(rng, n)
        if k is not None:
            g["eigvecs"] = rng.normal(size=(n, k)).astype(np.float32)
            g["eigvals"] = np.sort(rng.random(k)).astype(np.float32)
        gs.append(g)
    return from_arrays(batch_np(gs, 16, 64, 4, k=k))


def test_gatedgcn_lspe_layer_padding_invariance():
    rng = np.random.default_rng(0)
    gb = make(rng)
    h = jnp.asarray(rng.normal(size=(gb.num_nodes, 8)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(gb.num_nodes, 8)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(gb.num_edges, 8)).astype(np.float32))
    h = h * gb.node_mask[:, None]
    p = p * gb.node_mask[:, None]
    e = e * gb.edge_mask[:, None]
    layer = GatedGCNLSPELayer(8)
    v = layer.init({"params": jax.random.PRNGKey(0)}, gb, h, p, e,
                   training=False)
    (h1, p1, e1) = layer.apply(v, gb, h, p, e, training=False)
    assert h1.shape == h.shape and p1.shape == p.shape and e1.shape == e.shape
    # garbage on padded slots must not change valid outputs
    hg = h + 100.0 * (1 - gb.node_mask[:, None])
    pg = p + 100.0 * (1 - gb.node_mask[:, None])
    eg = e + 100.0 * (1 - gb.edge_mask[:, None])
    (h2, p2, e2) = layer.apply(v, gb, hg, pg, eg, training=False)
    nm = np.asarray(gb.node_mask) > 0
    np.testing.assert_allclose(np.asarray(h1)[nm], np.asarray(h2)[nm],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(p1)[nm], np.asarray(p2)[nm],
                               atol=1e-4)


def test_gatedgcn_net_lspe_end_to_end():
    rng = np.random.default_rng(1)
    gb = make(rng)
    pe = jnp.asarray(rng.normal(size=(gb.num_nodes, 4)).astype(np.float32))
    m = M.gnn_model("GatedGCN", hidden_dim=12, out_dim=12, n_layers=2,
                    pe_init="rand_walk", pos_enc_dim=4, use_lspe=True)
    key = jax.random.PRNGKey(0)
    v = m.init({"params": key, "dropout": key}, gb, pe, training=False)
    out, p = m.apply(v, gb, pe, training=False, return_p=True)
    assert out.shape == (gb.num_graphs,)
    assert p.shape == (gb.num_nodes, 4)
    # normalize_p: per-graph column norms of valid rows ~ 1 or 0
    import signnet_basisnet_tpu.graph.segment as seg
    norms = seg.pool_nodes(p ** 2, gb.graph_id, gb.num_graphs,
                           node_mask=gb.node_mask, reduce="sum")
    valid = np.asarray(gb.graph_mask) > 0
    np.testing.assert_allclose(np.asarray(norms)[valid].sum(-1),
                               4.0, atol=1e-3)


def test_pna_no_towers_gru():
    rng = np.random.default_rng(2)
    gb = make(rng)
    m = M.gnn_model("PNA", hidden_dim=12, out_dim=12, n_layers=3, towers=2,
                    gru=True, no_towers=True, pe_init="none")
    key = jax.random.PRNGKey(0)
    v = m.init({"params": key, "dropout": key}, gb, None, training=False)
    out = m.apply(v, gb, None, training=False)
    assert out.shape == (gb.num_graphs,)
    # single shared GRU across layers
    assert "gru" in v["params"]


@pytest.mark.parametrize("net", ["gat", "transformer"])
def test_phi_variants_sign_invariant(net):
    rng = np.random.default_rng(3)
    gb = make(rng, k=4)
    pe = gb.eigvecs
    m = M.gnn_model("GIN", hidden_dim=12, out_dim=12, n_layers=2,
                    pe_init="lap_pe", lap_method="sign_inv", sign_inv_net=net,
                    sign_inv_layers=2, pos_enc_dim=4, phi_out_dim=2,
                    max_nodes=8)
    key = jax.random.PRNGKey(0)
    v = m.init({"params": key, "dropout": key}, gb, pe, training=False)
    out1 = m.apply(v, gb, pe, training=False)
    signs = jnp.asarray(rng.choice([-1.0, 1.0], size=(1, 4)).astype(np.float32))
    out2 = m.apply(v, gb, pe * signs, training=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_graphit_k_rw():
    rng = np.random.default_rng(4)
    g = tiny(rng, 6)
    full = make_full_graph(g, adaptive_weighting=(1, 0.5))
    assert "k_rw" in full
    # p_steps=1: k_RW = I - gamma L; off-diagonal (i,j) = gamma*A_ij/sqrt(di dj)
    n = 6
    A = np.zeros((n, n))
    A[g["senders"], g["receivers"]] = 1.0
    deg = np.clip(A.sum(0), 1, None)
    expect = 0.5 * A / np.sqrt(np.outer(deg, deg))
    got = np.zeros((n, n))
    got[full["senders"], full["receivers"]] = full["k_rw"]
    np.testing.assert_allclose(got, expect, atol=1e-6)
    # string p_steps accepted and flows through batching
    full2 = make_full_graph(g, adaptive_weighting=("half_num_nodes", 0.2))
    gb = from_arrays(batch_np([full2, full2], 16, 80, 4))
    assert "k_rw" in gb.extras and gb.extras["k_rw"].shape == (80,)


def test_dos_hooks():
    rng = np.random.default_rng(5)
    gs = []
    for n in (5, 7):
        g = tiny(rng, n)
        gs.append(g)
    arrays = batch_np(gs, 16, 64, 4)
    gb = from_arrays(arrays)
    dos_bins = 4
    pdos = jnp.asarray(rng.random((gb.num_nodes, dos_bins)).astype(np.float32))
    dos = jnp.asarray(rng.random((gb.num_graphs, dos_bins)).astype(np.float32))
    gb = gb.replace(extras=dict(gb.extras, pdos=pdos, dos=dos))
    m = M.GNN(nhid=12, nout=3, nlayer=2, dos_bins=dos_bins)
    key = jax.random.PRNGKey(0)
    v = m.init({"params": key, "dropout": key}, gb, training=False)
    out = m.apply(v, gb, training=False)
    assert out.shape == (gb.num_graphs, 3)
    assert "dos_encoder" in v["params"]


def test_mlp_readout2():
    x = jnp.ones((3, 16))
    mod = MLPReadout2(1, dropout=0.5)
    v = mod.init(jax.random.PRNGKey(0), x, training=False)
    out = mod.apply(v, x, training=False)
    assert out.shape == (3, 1)
    # training mode needs dropout rng and runs
    out2 = mod.apply(v, x, training=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    assert out2.shape == (3, 1)


def test_k_fold_split_partition():
    folds = k_fold_split(23, k=5, seed=0)
    assert len(folds) == 5
    all_test = np.concatenate([te for _, te in folds])
    assert sorted(all_test.tolist()) == list(range(23))
    for tr, te in folds:
        assert set(tr) & set(te) == set()
        assert len(tr) + len(te) == 23


def test_lapeig_loss_and_signflip_eval():
    """Full train/eval step with LSPE + lapeig auxiliary loss: finite grads
    (normalize_p sqrt-at-zero guard) and eval without a sign_flip rng."""
    from signnet_basisnet_tpu.training import (adam, build_steps, create_state,
                                               make_lapeig_loss_fn,
                                               make_zinc_predict)
    rng = np.random.default_rng(7)
    gb = make(rng, k=4)
    m = M.gnn_model("GatedGCN", hidden_dim=12, out_dim=12, n_layers=2,
                    pe_init="rand_walk", pos_enc_dim=4, use_lspe=True)
    tx = adam(0.0)
    state = create_state(m, gb, tx, model_kwargs={"pos_enc": gb.eigvecs})
    predict = make_zinc_predict(m, lap_method="none", return_p=True)
    loss_fn = make_lapeig_loss_fn(1e-4, 1.0, 4)
    train_step, eval_step = build_steps(predict, tx, loss_fn=loss_fn,
                                        donate=False)
    state2, metrics = train_step(state, gb, 1e-3, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["mae"]))
    out = eval_step(state2, gb)
    assert np.isfinite(float(out["mae_sum"]))
    # sign_flip predict at eval time (no rng) must not raise
    predict_sf = make_zinc_predict(m, lap_method="sign_flip", return_p=True)
    _, ev = build_steps(predict_sf, tx, loss_fn=loss_fn, donate=False)
    assert np.isfinite(float(ev(state2, gb)["mae_sum"]))


def test_device_memory_stats_shape():
    from signnet_basisnet_tpu.utils.profiling import device_memory_stats
    stats = device_memory_stats()
    # CPU backend returns {} or a dict of MB floats; must never raise
    assert isinstance(stats, dict)
    for v in stats.values():
        assert isinstance(v, float)


def test_classification_metrics_match_sklearn():
    from sklearn.metrics import confusion_matrix, f1_score
    from signnet_basisnet_tpu.training import metrics as M2
    rng = np.random.default_rng(11)
    n, c = 200, 4
    logits = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    labels = rng.integers(0, c, n)
    mask = jnp.ones(n, jnp.float32)
    pred = np.asarray(jnp.argmax(logits, -1))

    # SBM class-balanced accuracy, reference formula
    CM = confusion_matrix(labels, pred).astype(np.float32)
    pr = []
    for r in range(c):
        cluster = np.where(labels == r)[0]
        pr.append(CM[r, r] / len(cluster) if len(cluster) else 0.0)
    want_sbm = 100.0 * np.sum(pr) / c
    got_sbm = float(M2.accuracy_sbm(logits, jnp.asarray(labels), mask, c))
    np.testing.assert_allclose(got_sbm, want_sbm, rtol=1e-5)

    want_f1 = f1_score(labels, pred, average="weighted")
    got_f1 = float(M2.weighted_f1(logits, jnp.asarray(labels), mask, c))
    np.testing.assert_allclose(got_f1, want_f1, rtol=1e-4)


@pytest.mark.parametrize("name,hid", [("GIN", 12), ("GatedGCN", 12),
                                      ("Transformer", 16), ("PNA", 16)])
def test_remat_identical_loss(name, hid):
    """remat=True is a pure memory/recompute trade: losses must be
    bit-comparable with the non-remat stack."""
    from signnet_basisnet_tpu.training import (adam, build_steps, create_state,
                                               make_zinc_predict)
    rng = np.random.default_rng(9)
    gb = make(rng)
    losses = []
    for remat in (False, True):
        kw = dict(hidden_dim=hid, out_dim=hid, n_layers=2, pe_init="none",
                  lap_method="none", remat=remat)
        if name == "PNA":
            kw.update(towers=2)
        m = M.gnn_model(name, **kw)
        tx = adam()
        st = create_state(m, gb, tx, model_kwargs={"pos_enc": None})
        ts, _ = build_steps(make_zinc_predict(m), tx, donate=False)
        st, met = ts(st, gb, jnp.float32(1e-3), jax.random.PRNGKey(0))
        losses.append(float(met["loss"]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)


def test_masked_gine_conv_padding_and_mask():
    """MaskedGINEConv: padded (node, k) slots stay zero; garbage on padded
    nodes/edges cannot leak into valid outputs (the reference's
    `assert x[~mask].max() == 0` contract, masked_layers.py:87-102)."""
    from signnet_basisnet_tpu.models import MaskedGINEConv
    rng = np.random.default_rng(3)
    gb = make(rng)
    N, K, D = gb.num_nodes, 3, 8
    x = jnp.asarray(rng.normal(size=(N, K, D)).astype(np.float32))
    mask = jnp.asarray(
        np.outer(np.asarray(gb.node_mask), np.ones(K)).astype(np.float32))
    x = x * mask[..., None]
    e = jnp.asarray(rng.normal(size=(gb.num_edges, D)).astype(np.float32))
    e = e * gb.edge_mask[:, None]
    conv = MaskedGINEConv(D)
    v = conv.init(jax.random.PRNGKey(0), gb, x, e, mask=mask, training=False)
    y1 = conv.apply(v, gb, x, e, mask=mask, training=False)
    assert y1.shape == (N, K, D)
    assert float(jnp.abs(y1 * (1 - mask[..., None])).max()) == 0.0
    xg = x + 50.0 * (1 - mask[..., None])
    eg = e + 50.0 * (1 - gb.edge_mask[:, None])
    y2 = conv.apply(v, gb, xg, eg, mask=mask, training=False)
    nm = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(y1)[nm], np.asarray(y2)[nm],
                               atol=1e-4)


def test_signnet_gine_phi_sign_invariance():
    """SignNet with the GINE phi (GINESignNetPyG's MaskedGINEConv option) is
    still sign-invariant."""
    rng = np.random.default_rng(4)
    gb = make(rng, k=4)
    net = M.SignNet(n_hid=8, nl_phi=2, phi_gnn_type="MaskedGINEConv")
    v = net.init(jax.random.PRNGKey(0), gb, training=False)
    y1 = net.apply(v, gb, training=False)
    flips = np.where(rng.random(4) < 0.5, 1.0, -1.0).astype(np.float32)
    gb2 = gb.replace(eigvecs=gb.eigvecs * flips[None, :])
    y2 = net.apply(v, gb2, training=False)
    nm = np.asarray(gb.node_mask) > 0
    np.testing.assert_allclose(np.asarray(y1)[nm], np.asarray(y2)[nm],
                               atol=1e-4)
