"""nn building blocks: masked BN/LN vs torch, MLPs, DeepSets, IGN contractions."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import signnet_basisnet_tpu.nn as snn

torch = pytest.importorskip("torch")


def init_and_apply(module, *args, training=True, method=None, **kwargs):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = module.init(rngs, *args, training=training, **kwargs)
    out, _ = module.apply(variables, *args, training=training, rngs=rngs,
                          mutable=["batch_stats"], **kwargs)
    return out, variables


def test_masked_bn_matches_torch_on_valid_rows():
    """Masked BN == torch BatchNorm1d applied to the gathered valid rows —
    the reference's x[mask] = bn(x[mask]) semantics."""
    rng = np.random.default_rng(0)
    n, k, d = 6, 5, 4
    x = rng.normal(size=(n, k, d)).astype(np.float32)
    mask = (rng.random((n, k)) < 0.7).astype(np.float32)
    mask[0, 0] = 1.0  # at least one valid

    mod = snn.MaskedBatchNorm(d)
    out, _ = init_and_apply(mod, jnp.asarray(x), mask=jnp.asarray(mask))
    out = np.asarray(out)

    tb = torch.nn.BatchNorm1d(d)
    tb.train()
    tx = torch.tensor(x)
    valid = torch.tensor(mask) > 0
    ref = torch.zeros_like(tx)
    ref[valid] = tb(tx[valid])
    np.testing.assert_allclose(out, ref.detach().numpy(), atol=1e-5)
    assert np.all(out[mask == 0] == 0)


def test_masked_bn_running_stats_update():
    rng = np.random.default_rng(1)
    x = rng.normal(loc=3.0, size=(32, 4)).astype(np.float32)
    mod = snn.MaskedBatchNorm(4)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    _, updates = mod.apply(variables, jnp.asarray(x), training=True,
                           mutable=["batch_stats"])
    new_mean = np.asarray(updates["batch_stats"]["mean"])
    # momentum 0.1: running = 0.9*0 + 0.1*batch_mean
    np.testing.assert_allclose(new_mean, 0.1 * x.mean(0), atol=1e-5)

    # eval with running stats
    variables = {"params": variables["params"], "batch_stats": updates["batch_stats"]}
    out_eval = mod.apply(variables, jnp.asarray(x), training=False)
    tb = torch.nn.BatchNorm1d(4, momentum=0.1)
    tb.train(); tb(torch.tensor(x)); tb.eval()
    ref = tb(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(out_eval), ref, atol=1e-4)


def test_masked_ln_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(5, 3, 8)).astype(np.float32)
    mod = snn.MaskedLayerNorm(8)
    out, _ = init_and_apply(mod, jnp.asarray(x))
    tl = torch.nn.LayerNorm(8, eps=1e-6)
    ref = tl(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_mlp_shapes_2d_3d():
    mlp = snn.MLP(hidden=16, out=8, num_layers=3, use_bn=True)
    x2 = jnp.ones((10, 4))
    out2, _ = init_and_apply(mlp, x2)
    assert out2.shape == (10, 8)
    x3 = jnp.ones((10, 5, 4))
    out3, _ = init_and_apply(mlp, x3)
    assert out3.shape == (10, 5, 8)


def test_mlp_readout_halving_widths():
    m = snn.MLPReadout(out=1)
    x = jnp.ones((3, 64))
    out, variables = init_and_apply(m, x)
    assert out.shape == (3, 1)
    p = variables["params"]
    assert p["fc_0"]["kernel"].shape == (64, 32)
    assert p["fc_1"]["kernel"].shape == (32, 16)
    assert p["fc_2"]["kernel"].shape == (16, 1)


def test_discrete_encoder_sums_embeddings():
    enc = snn.DiscreteEncoder(hidden=8, max_num_values=6)
    x = jnp.array([[0, 1], [2, 3]], dtype=jnp.int32)
    out, variables = init_and_apply(enc, x)
    emb0 = variables["params"]["emb_0"]["embedding"]
    emb1 = variables["params"]["emb_1"]["embedding"]
    ref = np.asarray(emb0)[[0, 2]] + np.asarray(emb1)[[1, 3]]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_deepsets_permutation_equivariance():
    ds = snn.EqDeepSetsEncoder(hidden=16, out=4, num_layers=3)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 7, 5)).astype(np.float32))
    out, variables = init_and_apply(ds, x)
    perm = rng.permutation(7)
    out_p = ds.apply(variables, x[:, perm], training=False)
    np.testing.assert_allclose(np.asarray(out)[:, perm], np.asarray(out_p),
                               atol=1e-5)


def _torch_contractions_2_to_2(t, m):
    """Direct port of the reference op list for testing only."""
    diag_part = torch.diagonal(t, dim1=2, dim2=3)
    sum_diag = diag_part.sum(2, keepdim=True)
    sum_rows = t.sum(3)
    sum_cols = t.sum(2)
    sum_all = sum_rows.sum(2)
    de = torch.diag_embed
    rep = lambda v: v.unsqueeze(3).expand(-1, -1, -1, m)
    rep2 = lambda v: v.unsqueeze(2).expand(-1, -1, m, -1)
    ops = [
        de(diag_part), de(sum_diag.expand(-1, -1, m)) / m, de(sum_rows) / m,
        de(sum_cols) / m, de(sum_all.unsqueeze(2).expand(-1, -1, m)) / m ** 2,
        rep(sum_cols) / m, rep(sum_rows) / m, rep2(sum_cols) / m,
        rep2(sum_rows) / m, t, t.transpose(3, 2), rep(diag_part),
        rep2(diag_part),
        rep(sum_diag.expand(-1, -1, m)) / m,
        rep(sum_all.unsqueeze(2).expand(-1, -1, m)) / m ** 2,
    ]
    return torch.stack(ops, dim=2)


def test_ign_contractions_match_torch_port():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 3, 6, 6)).astype(np.float32)
    ours = np.asarray(snn.contractions_2_to_2(jnp.asarray(x)))
    ref = _torch_contractions_2_to_2(torch.tensor(x), 6).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    ours1 = np.asarray(snn.contractions_2_to_1(jnp.asarray(x)))
    diag = np.einsum("bdii->bdi", x)
    np.testing.assert_allclose(ours1[:, :, 0], diag, atol=1e-6)
    np.testing.assert_allclose(ours1[:, :, 2], x.sum(3) / 6, atol=1e-6)


def test_ign2to1_permutation_equivariance():
    ign = snn.IGN2to1(hidden=8, out=3)
    rng = np.random.default_rng(5)
    P = rng.normal(size=(2, 1, 5, 5)).astype(np.float32)
    out, variables = init_and_apply(ign, jnp.asarray(P))
    assert out.shape == (2, 3, 5)
    perm = rng.permutation(5)
    P_perm = P[:, :, perm][:, :, :, perm]
    out_p = ign.apply(variables, jnp.asarray(P_perm), training=False,
                      mutable=["batch_stats"])[0]
    out_eval = ign.apply(variables, jnp.asarray(P), training=False,
                         mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(out_eval)[:, :, perm],
                               np.asarray(out_p), atol=1e-4)


def test_set_transformer_masked_invariance():
    """Output on real slots must not depend on values in padded slots."""
    st = snn.SetTransformer(nhid=8, nlayer=2)
    rng = np.random.default_rng(6)
    n, k, d = 4, 6, 8
    x = rng.normal(size=(n, k, d)).astype(np.float32)
    mask = np.zeros((n, k), np.float32)
    mask[:, :3] = 1.0
    x_masked = x * mask[..., None]
    garbage = x_masked + 100.0 * (1 - mask[..., None]) * rng.normal(size=x.shape)

    rngs = {"params": jax.random.PRNGKey(0)}
    variables = st.init(rngs, jnp.asarray(x_masked), 0.0,
                        mask=jnp.asarray(mask), training=False)
    a = st.apply(variables, jnp.asarray(x_masked), 0.0, mask=jnp.asarray(mask),
                 training=False, mutable=["batch_stats"])[0]
    b = st.apply(variables, jnp.asarray(garbage.astype(np.float32)), 0.0,
                 mask=jnp.asarray(mask), training=False,
                 mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
