"""Real-data loader tests against committed reference-format fixtures.

Covers the three on-disk formats the reference consumes (VERDICT r1 #2):
the bundled ZINC.pkl tuple (unpickled WITHOUT dgl via stub classes), the
per-split molecule-dict pickles with .index subset files, and the Alchemy
TUDataset text format with *_al_10.index splits.
"""
import os
import sys

import numpy as np
import pytest

from signnet_basisnet_tpu.data.alchemy import (load_alchemy,
                                               standardize_targets)
from signnet_basisnet_tpu.data.zinc import (add_lap_pe, load_zinc,
                                            load_zinc_pickle)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _check_graphs(graphs):
    for g in graphs:
        n = g["node_feat"].shape[0]
        assert g["senders"].shape == g["receivers"].shape
        assert g["senders"].dtype == np.int32
        assert len(g["senders"]) > 0
        assert g["senders"].max() < n and g["receivers"].max() < n
        # bond features must be kept, one code per directed edge
        assert g["edge_feat"].shape == g["senders"].shape
        assert (g["edge_feat"] >= 1).all() and (g["edge_feat"] <= 3).all()
        assert g["y"].shape == (1,) and np.isfinite(g["y"]).all()


def test_zinc_pkl_loads_without_dgl():
    assert "dgl" not in sys.modules, "test requires a dgl-free environment"
    with pytest.raises(ImportError):
        import dgl  # noqa: F401
    splits = load_zinc_pickle(os.path.join(FIXTURES, "zinc_pkl"))
    assert set(splits) == {"train", "val", "test"}
    for graphs in splits.values():
        assert len(graphs) == 3
        _check_graphs(graphs)
    # edge list symmetric (fixture bonds are undirected pairs)
    g = splits["train"][0]
    pairs = set(zip(g["senders"].tolist(), g["receivers"].tolist()))
    assert all((r, s) in pairs for s, r in pairs)


def test_zinc_per_split_with_index_subset():
    d = os.path.join(FIXTURES, "zinc_split")
    splits = load_zinc_pickle(d, subset=True)
    for split, graphs in splits.items():
        with open(os.path.join(d, f"{split}.index")) as f:
            n_idx = len(f.read().split(","))
        assert len(graphs) == n_idx  # subset selection applied
        _check_graphs(graphs)
    full = load_zinc_pickle(d, subset=False)
    assert all(len(v) == 6 for v in full.values())
    # subset graphs must be a sub-multiset of the full split, respecting order
    with open(os.path.join(d, "train.index")) as f:
        idx = [int(v) for v in f.read().split(",")]
    for gi, g in zip(idx, splits["train"]):
        np.testing.assert_array_equal(g["node_feat"],
                                      full["train"][gi]["node_feat"])


def test_load_zinc_prefers_real_data():
    splits, real = load_zinc(os.path.join(FIXTURES, "zinc_split"),
                             subset=True)
    assert real
    add_lap_pe(splits["train"], k=4)
    for g in splits["train"]:
        assert g["eigvecs"].shape == (g["node_feat"].shape[0], 4)
        assert np.isfinite(g["eigvecs"]).all()


def test_alchemy_tu_fixture():
    splits, real = load_alchemy(os.path.join(FIXTURES, "alchemy_tu"))
    assert real
    assert len(splits["train"]) == 4
    assert len(splits["val"]) == 2 and len(splits["test"]) == 2
    for graphs in splits.values():
        for g in graphs:
            n = g["node_feat"].shape[0]
            assert g["senders"].max() < n and g["senders"].min() >= 0
            assert g["edge_feat"].shape == g["senders"].shape
            assert g["y"].shape == (12,)
    stats = standardize_targets(splits)
    ys = np.stack([g["y"] for g in splits["train"]])
    np.testing.assert_allclose(ys.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(ys.std(0), 1.0, atol=1e-4)
    assert stats["mean"].shape == (12,)


def test_fixtures_regenerate_identically(tmp_path):
    """The generator is deterministic: a fresh run loads to the same data."""
    sys.path.insert(0, FIXTURES)
    try:
        import make_fixtures as mf
    finally:
        sys.path.pop(0)
    rng = np.random.default_rng(42)
    mf.make_zinc_split(str(tmp_path / "zinc_split"), rng)
    mf.make_zinc_pkl(str(tmp_path / "zinc_pkl"), rng)
    fresh = load_zinc_pickle(str(tmp_path / "zinc_pkl"))
    committed = load_zinc_pickle(os.path.join(FIXTURES, "zinc_pkl"))
    for split in fresh:
        for a, b in zip(fresh[split], committed[split]):
            np.testing.assert_array_equal(a["node_feat"], b["node_feat"])
            np.testing.assert_array_equal(a["edge_feat"], b["edge_feat"])
            np.testing.assert_allclose(a["y"], b["y"])
