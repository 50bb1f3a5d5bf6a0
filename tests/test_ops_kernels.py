"""ops/: one-hot matmul segment ops and the Pallas SpMM kernel (interpret
mode on CPU) against the XLA reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from signnet_basisnet_tpu import ops


def make_problem(rng, n=64, e=200, d=16):
    senders = rng.integers(0, n, size=e).astype(np.int32)
    receivers = np.sort(rng.integers(0, n, size=e).astype(np.int32))
    w = (rng.random(e) < 0.8).astype(np.float32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x, senders, receivers, w


def test_segment_sum_onehot_matches_xla():
    rng = np.random.default_rng(0)
    x, s, r, w = make_problem(rng)
    ref = ops.spmm_reference(jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                             jnp.asarray(w), 64)
    out = ops.spmm_onehot(jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                          jnp.asarray(w), 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_gather_onehot():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(32, 8)).astype(np.float32)
    idx = rng.integers(0, 32, size=50).astype(np.int32)
    out = ops.gather_onehot(jnp.asarray(x), jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(out), x[idx], atol=1e-5)


def test_tile_edge_ranges():
    receivers = np.array([0, 0, 1, 5, 8, 8, 9, 15], np.int32)
    starts, ends = ops.tile_edge_ranges(receivers, num_nodes=16, bn=8)
    # tile 0 covers nodes 0-7 -> edges 0..3; tile 1 covers 8-15 -> edges 4..7
    np.testing.assert_array_equal(starts, [0, 4])
    np.testing.assert_array_equal(ends, [4, 8])


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pallas TPU kernel needs TPU (interpret mode is "
                           "exercised in test below)")
def test_spmm_pallas_tpu():
    rng = np.random.default_rng(2)
    x, s, r, w = make_problem(rng, n=512, e=2048, d=128)
    starts, ends = ops.tile_edge_ranges(r, 512, bn=256)
    out = ops.spmm_pallas(jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                          jnp.asarray(w), jnp.asarray(starts),
                          jnp.asarray(ends), num_nodes=512)
    ref = ops.spmm_reference(jnp.asarray(x), jnp.asarray(s), jnp.asarray(r),
                             jnp.asarray(w), 512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)
