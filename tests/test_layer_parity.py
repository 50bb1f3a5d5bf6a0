"""Per-layer numeric parity vs the reference equations (BASELINE.md:
"Per-layer numeric parity vs reference — allclose").

Each test extracts the flax layer's parameters and recomputes the reference
implementation's math in numpy (the reference's torch ops are elementwise /
index_add / softmax — numpy reproduces them bit-comparably in f64), then
checks allclose on valid slots.
"""
import numpy as np
import jax
import jax.numpy as jnp

from signnet_basisnet_tpu.graph import batch_np, from_arrays
from signnet_basisnet_tpu.models.conv import (GatedGCNLayer, GATConv, GINConv,
                                              GraphTransformerAttention,
                                              pna_aggregate, pna_scale)
from signnet_basisnet_tpu.nn.mlp import MLP


def small_batch(rng, n=9, extra=None):
    A = np.triu((rng.random((n, n)) < 0.6).astype(int), 1)
    A = A + A.T
    s, r = np.nonzero(A)
    g = dict(senders=s, receivers=r,
             node_feat=rng.integers(0, 5, (n, 1)),
             edge_feat=rng.integers(0, 4, len(s)),
             y=np.zeros(1, np.float32))
    if extra:
        g.update(extra)
    return from_arrays(batch_np([g], n + 3, len(s) + 5, 2))


def valid_nodes(gb):
    return np.asarray(gb.node_mask) > 0


def test_gatedgcn_layer_matches_reference_equations():
    """e' = Dh_u + Eh_v + Ce; h' = Ah + sum sigma(e')*Bh_u / (sum sigma+1e-6)
    (reference: GraphPrediction/layers/gatedgcn_layer.py:36-77)."""
    rng = np.random.default_rng(0)
    gb = small_batch(rng)
    d = 6
    h = rng.normal(size=(gb.num_nodes, d)).astype(np.float32)
    e = rng.normal(size=(gb.num_edges, d)).astype(np.float32)
    h *= np.asarray(gb.node_mask)[:, None]
    e *= np.asarray(gb.edge_mask)[:, None]

    layer = GatedGCNLayer(d, batch_norm=False, residual=False,
                          graph_norm=False)
    v = layer.init({"params": jax.random.PRNGKey(0)}, gb,
                   jnp.asarray(h), jnp.asarray(e), None, training=False)
    out_h, out_e = layer.apply(v, gb, jnp.asarray(h), jnp.asarray(e), None,
                               training=False)

    P = jax.tree.map(np.asarray, v["params"])
    lin = lambda name, x: x @ P[name]["kernel"] + P[name]["bias"]
    s, r = np.asarray(gb.senders), np.asarray(gb.receivers)
    em = np.asarray(gb.edge_mask)
    e_new = lin("D", h)[s] + lin("E", h)[r] + lin("C", e)
    sigma = 1.0 / (1.0 + np.exp(-e_new)) * em[:, None]
    num = np.zeros_like(h)
    den = np.zeros_like(h)
    np.add.at(num, r, sigma * lin("B", h)[s])
    np.add.at(den, r, sigma)
    h_ref = np.maximum(lin("A", h) + num / (den + 1e-6), 0.0)
    e_ref = np.maximum(e_new, 0.0)

    nm = valid_nodes(gb)
    np.testing.assert_allclose(np.asarray(out_h)[nm], h_ref[nm], atol=1e-4)
    emv = em > 0
    np.testing.assert_allclose(np.asarray(out_e)[emv], e_ref[emv], atol=1e-4)


def test_gin_conv_matches_reference_aggregation():
    """x' = MLP((1+eps)x + sum_j x_j), eps=0 fixed (reference:
    GraphPrediction/layers/gnns.py:81-114 via DGL GINConv 'sum')."""
    rng = np.random.default_rng(1)
    gb = small_batch(rng)
    d = 5
    x = rng.normal(size=(gb.num_nodes, d)).astype(np.float32)
    x *= np.asarray(gb.node_mask)[:, None]
    update = MLP(hidden=7, out=4, num_layers=2, use_bn=False, dropout=0.0)
    conv = GINConv(update, learn_eps=False)
    v = conv.init({"params": jax.random.PRNGKey(0)}, gb, jnp.asarray(x),
                  training=False)
    out = conv.apply(v, gb, jnp.asarray(x), training=False)

    P = jax.tree.map(np.asarray, v["params"]["update_net"])
    s, r = np.asarray(gb.senders), np.asarray(gb.receivers)
    em = np.asarray(gb.edge_mask)
    agg = np.zeros_like(x)
    np.add.at(agg, r, x[s] * em[:, None])
    z = x + agg
    z = np.maximum(z @ P["lin_0"]["kernel"] + P["lin_0"]["bias"], 0.0)
    ref = z @ P["lin_1"]["kernel"] + P["lin_1"]["bias"]
    nm = valid_nodes(gb)
    np.testing.assert_allclose(np.asarray(out)[nm], ref[nm], atol=1e-4)


def test_gat_conv_matches_manual_softmax():
    """GATv1 scoring with LeakyReLU(0.2) + per-destination softmax, no self
    loops (reference: GraphPrediction DGL GATConv usage, gat_net.py)."""
    rng = np.random.default_rng(2)
    gb = small_batch(rng)
    d, H, F = 6, 2, 3
    x = rng.normal(size=(gb.num_nodes, d)).astype(np.float32)
    x *= np.asarray(gb.node_mask)[:, None]
    conv = GATConv(F, num_heads=H, concat=True, add_self_loops=False)
    v = conv.init({"params": jax.random.PRNGKey(0)}, gb, jnp.asarray(x),
                  training=False)
    out = conv.apply(v, gb, jnp.asarray(x), training=False)

    P = jax.tree.map(np.asarray, v["params"])
    hproj = (x @ P["weight"]["kernel"]).reshape(-1, H, F)
    el = (hproj * P["attn_src"]).sum(-1)
    er = (hproj * P["attn_dst"]).sum(-1)
    s, r = np.asarray(gb.senders), np.asarray(gb.receivers)
    em = np.asarray(gb.edge_mask)
    scores = el[s] + er[r]
    scores = np.where(scores > 0, scores, 0.2 * scores)
    ref = np.zeros((gb.num_nodes, H, F), np.float32)
    for n in np.nonzero(valid_nodes(gb))[0]:
        eidx = np.nonzero((r == n) & (em > 0))[0]
        if len(eidx) == 0:
            continue
        sc = scores[eidx]                        # [deg, H]
        alpha = np.exp(sc - sc.max(0)) / np.exp(sc - sc.max(0)).sum(0)
        ref[n] = (alpha[:, :, None] * hproj[s[eidx]]).sum(0)
    ref = ref.reshape(-1, H * F) + P["bias"]
    nm = valid_nodes(gb) & (np.bincount(r, weights=em,
                                        minlength=gb.num_nodes) > 0)
    np.testing.assert_allclose(np.asarray(out)[nm], ref[nm], atol=1e-4)


def test_pna_aggregators_match_mailbox_semantics():
    """Segment-moment aggregators == DGL's padded-mailbox reductions
    (reference: GraphPrediction/layers/pna_utils.py:12-62, scalers :73-87)."""
    rng = np.random.default_rng(3)
    gb = small_batch(rng)
    d = 4
    msg = rng.normal(size=(gb.num_edges, d)).astype(np.float32)
    aggs = ("mean", "sum", "max", "min", "std", "var", "moment3")
    outs, deg = pna_aggregate(jnp.asarray(msg), gb, aggs)
    s, r = np.asarray(gb.senders), np.asarray(gb.receivers)
    em = np.asarray(gb.edge_mask)
    EPS = 1e-5
    for n in np.nonzero(valid_nodes(gb))[0]:
        eidx = np.nonzero((r == n) & (em > 0))[0]
        if len(eidx) == 0:
            continue
        mb = msg[eidx]                           # the mailbox
        want = {
            "mean": mb.mean(0), "sum": mb.sum(0), "max": mb.max(0),
            "min": mb.min(0), "var": np.maximum(mb.var(0), 0.0),
            "std": np.sqrt(mb.var(0) + EPS),
        }
        m3 = ((mb - mb.mean(0)) ** 3).mean(0)
        want["moment3"] = np.sign(m3) * np.abs(np.abs(m3) + EPS) ** (1 / 3)
        for name, got in zip(aggs, outs):
            got_n, want_n = np.asarray(got)[n], want[name]
            if name == "moment3":
                # the reference formula sign(m)*(|m|+EPS)^(1/3) amplifies fp
                # residue into +-EPS^(1/3) wherever the true moment is ~0
                # (analytically exact at degree-2 nodes) — the sign there is
                # indeterminate in the reference too; compare decided entries
                decided = np.abs(m3) > 1e-6
                got_n, want_n = got_n[decided], want_n[decided]
            np.testing.assert_allclose(got_n, want_n, atol=1e-4,
                                       err_msg=name)
        assert float(deg[n, 0]) == len(eidx)
    # scalers
    h = np.asarray(outs[0])
    scaled = pna_scale(jnp.asarray(h), deg, 1.5,
                       ("identity", "amplification", "attenuation"))
    logd = np.log(np.asarray(deg) + 1.0)
    np.testing.assert_allclose(np.asarray(scaled[1]), h * logd / 1.5,
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(scaled[2]), h * 1.5 / np.maximum(logd, 1e-6), atol=1e-5)


def test_transformer_attention_matches_clamped_exp():
    """score = exp(clamp(sum_d K_u Q_v / sqrt(d), -5, 5)); out = sum s*V /
    (sum s + 1e-6) (reference: GraphPrediction/layers/transformer.py:14-92)."""
    rng = np.random.default_rng(4)
    gb = small_batch(rng)
    d, H, F = 6, 2, 3
    h = rng.normal(size=(gb.num_nodes, d)).astype(np.float32)
    h *= np.asarray(gb.node_mask)[:, None]
    attn = GraphTransformerAttention(F, H, use_edge=False, use_bias=False)
    v = attn.init({"params": jax.random.PRNGKey(0)}, gb, jnp.asarray(h),
                  None, training=False)
    out = attn.apply(v, gb, jnp.asarray(h), None, training=False)

    P = jax.tree.map(np.asarray, v["params"])
    proj = lambda n: (h @ P[n]["kernel"]).reshape(-1, H, F)
    Q, K, V = proj("Q"), proj("K"), proj("V")
    s, r = np.asarray(gb.senders), np.asarray(gb.receivers)
    em = np.asarray(gb.edge_mask)
    sc = (K[s] * Q[r]).sum(-1) / np.sqrt(F)          # [E, H]
    w = np.exp(np.clip(sc, -5, 5))[:, :, None] * em[:, None, None]
    num = np.zeros((gb.num_nodes, H, 1), np.float32)
    acc = np.zeros((gb.num_nodes, H, F), np.float32)
    np.add.at(acc, r, w * V[s])
    np.add.at(num, r, w)
    ref = acc / (num + 1e-6)
    nm = valid_nodes(gb)
    np.testing.assert_allclose(np.asarray(out)[nm], ref[nm], atol=1e-4)
