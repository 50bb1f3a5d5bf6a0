"""Native C++ packer parity with the numpy packer."""
import numpy as np
import pytest

from signnet_basisnet_tpu.data.native import (GraphStore, native_available,
                                              pack_batch_native)
from signnet_basisnet_tpu.graph import batch_np

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib not built")


def graphs(rng, count=5):
    out = []
    for _ in range(count):
        n = int(rng.integers(4, 10))
        A = np.triu((rng.random((n, n)) < 0.5).astype(int), 1)
        A = A + A.T
        s, r = np.nonzero(A)
        k = n
        out.append(dict(
            senders=s.astype(np.int32), receivers=r.astype(np.int32),
            node_feat=rng.integers(0, 28, n).astype(np.int32),
            edge_feat=rng.integers(0, 4, len(s)).astype(np.int32),
            y=np.array([float(rng.normal())], np.float32),
            eigvecs=rng.normal(size=(n, k)).astype(np.float32),
            eigvals=rng.normal(size=(k,)).astype(np.float32),
        ))
    return out


def test_native_matches_numpy_packer():
    rng = np.random.default_rng(0)
    gs = graphs(rng)
    kmax = max(g["eigvecs"].shape[1] for g in gs)
    ref = batch_np(gs, 64, 256, 8, k=kmax)
    store = GraphStore(gs, k=kmax)
    out = pack_batch_native(store, np.arange(len(gs)), 64, 256, 8)
    for key in ("senders", "receivers", "edge_mask", "graph_id",
                "edge_graph_id", "node_mask", "n_node", "n_edge",
                "graph_mask", "node_feat", "edge_feat", "eigvecs",
                "eigvals", "eig_mask", "y"):
        np.testing.assert_array_equal(
            np.asarray(out[key]), np.asarray(ref[key]), err_msg=key)


def test_native_overflow_detection():
    rng = np.random.default_rng(1)
    gs = graphs(rng, count=3)
    store = GraphStore(gs)
    with pytest.raises(ValueError):
        pack_batch_native(store, np.arange(3), 8, 16, 8)
