"""Spectral-filter baseline models (the LearningFilters family): forward
shapes for every registry entry, and dense-matrix parity of the Chebyshev /
Bernstein polynomial propagation."""
import numpy as np
import jax
import jax.numpy as jnp

from signnet_basisnet_tpu.graph import batch_np, from_arrays
from signnet_basisnet_tpu.models.spectral_filters import (
    FILTER_MODEL_REGISTRY, BernNet, ChebNet)


def grid_batch(rng, n=12):
    A = np.triu((rng.random((n, n)) < 0.5).astype(int), 1)
    A = A + A.T
    s, r = np.nonzero(A)
    g = dict(senders=s, receivers=r, node_feat=np.zeros((n, 1), np.float32),
             y=np.zeros(1, np.float32))
    gb = from_arrays(batch_np([g], n, len(s) + 4, 2))
    return gb, A


def test_all_filter_models_forward():
    rng = np.random.default_rng(0)
    gb, _ = grid_batch(rng)
    x = jnp.asarray(rng.normal(size=(gb.num_nodes, 3)).astype(np.float32))
    x = x * gb.node_mask[:, None]
    for name, cls in FILTER_MODEL_REGISTRY.items():
        model = cls(hidden=8, num_layers=2)
        v = model.init({"params": jax.random.PRNGKey(0)}, gb, x,
                       training=False)
        out = model.apply(v, gb, x, training=False)
        assert out.shape == (gb.num_nodes, 1), name
        assert np.isfinite(np.asarray(out)).all(), name


def _dense_norm_adj(A):
    deg = np.clip(A.sum(1), 1, None)
    dm = deg ** -0.5
    return dm[:, None] * A * dm[None, :]


def test_chebnet_matches_dense_polynomial():
    """One ChebNet layer == sum_k T_k(L_hat) x W_k with L_hat = -A_norm
    (lambda_max=2 rescaling, reference: LearningFilters/models.py:274-289)."""
    rng = np.random.default_rng(1)
    gb, A = grid_batch(rng)
    n = A.shape[0]
    x = rng.normal(size=(n, 3)).astype(np.float32)
    model = ChebNet(hidden=4, num_layers=1, K=3)
    v = model.init({"params": jax.random.PRNGKey(0)}, gb, jnp.asarray(x),
                   training=False)
    out = model.apply(v, gb, jnp.asarray(x), training=False)

    P = jax.tree.map(np.asarray, v["params"])
    Lhat = -_dense_norm_adj(A)
    T0, T1 = x, Lhat @ x
    T2 = 2 * Lhat @ T1 - T0
    h = (T0 @ P["w_0_0"]["kernel"] + T1 @ P["w_0_1"]["kernel"]
         + T2 @ P["w_0_2"]["kernel"])
    h = np.maximum(h + P["bias_0"], 0.0)
    ref = h @ P["fc2"]["kernel"] + P["fc2"]["bias"]
    np.testing.assert_allclose(np.asarray(out)[:n], ref, atol=1e-4)


def test_bernnet_matches_dense_bernstein():
    """One BernNet layer == sum_j comb(K,j)/2^K relu(coe_j) L^j (2I-L)^{K-j} x
    (reference: LearningFilters/models.py:291-377)."""
    from scipy.special import comb
    rng = np.random.default_rng(2)
    gb, A = grid_batch(rng)
    n = A.shape[0]
    x = rng.normal(size=(n, 2)).astype(np.float32)
    K = 4
    model = BernNet(hidden=3, num_layers=1, K=K)
    v = model.init({"params": jax.random.PRNGKey(0)}, gb, jnp.asarray(x),
                   training=False)
    out = model.apply(v, gb, jnp.asarray(x), training=False)

    P = jax.tree.map(np.asarray, v["params"])
    temp = np.maximum(P["coe"], 0.0)
    An = _dense_norm_adj(A)
    L = np.eye(n) - An
    TwoIL = np.eye(n) + An
    acc = np.zeros_like(x)
    for j in range(K + 1):
        M = np.linalg.matrix_power(L, j) @ np.linalg.matrix_power(TwoIL, K - j)
        acc = acc + (comb(K, j) / 2 ** K) * temp[j] * (M @ x)
    h = np.maximum(acc @ P["w_0"]["kernel"] + P["w_0"]["bias"], 0.0)
    ref = h @ P["fc2"]["kernel"] + P["fc2"]["bias"]
    np.testing.assert_allclose(np.asarray(out)[:n], ref, atol=1e-3)
