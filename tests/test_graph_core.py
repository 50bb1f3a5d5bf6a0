"""Graph core: padded batching + segment ops parity with hand-computed values."""
import numpy as np
import jax.numpy as jnp
import pytest

from signnet_basisnet_tpu.graph import GraphBatch, batch_np, from_arrays
from signnet_basisnet_tpu.graph import segment as seg


def tiny_graphs():
    # graph 0: path 0-1-2 (undirected -> 4 directed edges)
    g0 = dict(
        senders=np.array([0, 1, 1, 2]),
        receivers=np.array([1, 0, 2, 1]),
        node_feat=np.array([[1.0], [2.0], [3.0]]),
        edge_feat=np.array([[1.0], [1.0], [2.0], [2.0]]),
        y=np.array([1.5]),
    )
    # graph 1: single edge pair 0<->1
    g1 = dict(
        senders=np.array([0, 1]),
        receivers=np.array([1, 0]),
        node_feat=np.array([[10.0], [20.0]]),
        edge_feat=np.array([[3.0], [3.0]]),
        y=np.array([-0.5]),
    )
    return [g0, g1]


def make_batch(num_nodes=8, num_edges=8, num_graphs=4):
    arrays = batch_np(tiny_graphs(), num_nodes, num_edges, num_graphs)
    return from_arrays(arrays)


def test_batch_shapes_and_masks():
    gb = make_batch()
    assert gb.num_nodes == 8 and gb.num_edges == 8 and gb.num_graphs == 4
    assert float(gb.node_mask.sum()) == 5
    assert float(gb.edge_mask.sum()) == 6
    assert float(gb.graph_mask.sum()) == 2
    # padding nodes belong to the padding graph (last slot)
    assert int(gb.graph_id[-1]) == 3
    # edges sorted by receiver
    recv = np.asarray(gb.receivers)
    assert np.all(np.diff(recv) >= 0)


def test_padding_invariance_of_aggregation():
    """Result must be independent of pad amount (SURVEY.md §4 requirement)."""
    outs = []
    for (n, e, g) in [(8, 8, 4), (16, 32, 5), (64, 128, 9)]:
        gb = make_batch(n, e, g)
        msg = seg.gather_src(gb.node_feat, gb.senders)
        agg = seg.aggregate_edges(msg, gb.receivers, gb.num_nodes,
                                  edge_mask=gb.edge_mask)
        outs.append(np.asarray(agg)[:5])
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-6)
    # hand check: node 1 of graph 0 receives nodes 0 and 2 -> 1+3 = 4
    np.testing.assert_allclose(outs[0][1], [4.0])
    # node 0 of graph 1 (global index 3) receives node 1 of graph 1 -> 20
    np.testing.assert_allclose(outs[0][3], [20.0])


def test_pool_nodes_sum_mean_max():
    gb = make_batch()
    s = seg.pool_nodes(gb.node_feat, gb.graph_id, gb.num_graphs,
                       node_mask=gb.node_mask, reduce="sum")
    np.testing.assert_allclose(np.asarray(s)[:2], [[6.0], [30.0]])
    m = seg.pool_nodes(gb.node_feat, gb.graph_id, gb.num_graphs,
                       node_mask=gb.node_mask, reduce="mean")
    np.testing.assert_allclose(np.asarray(m)[:2], [[2.0], [15.0]])
    mx = seg.pool_nodes(gb.node_feat, gb.graph_id, gb.num_graphs,
                        node_mask=gb.node_mask, reduce="max")
    np.testing.assert_allclose(np.asarray(mx)[:2], [[3.0], [20.0]])
    # padding graph pools to zero
    np.testing.assert_allclose(np.asarray(s)[2:], 0.0)
    np.testing.assert_allclose(np.asarray(mx)[2:], 0.0)


def test_segment_softmax_matches_dense():
    rng = np.random.default_rng(1)
    gb = make_batch()
    scores = jnp.asarray(rng.normal(size=(gb.num_edges, 1)).astype(np.float32))
    sm = seg.segment_softmax(scores, gb.receivers, gb.num_nodes,
                             mask=gb.edge_mask)
    sm = np.asarray(sm)
    recv = np.asarray(gb.receivers)
    emask = np.asarray(gb.edge_mask)
    for nid in range(gb.num_nodes):
        sel = (recv == nid) & (emask > 0)
        if sel.sum() == 0:
            continue
        x = np.asarray(scores)[sel, 0]
        ref = np.exp(x - x.max())
        ref /= ref.sum()
        np.testing.assert_allclose(sm[sel, 0], ref, rtol=1e-5)
    # masked-out entries are exactly zero
    assert np.all(sm[emask == 0] == 0)


def test_snorm_and_degrees():
    gb = make_batch()
    sn = np.asarray(gb.snorm())[:, 0]
    np.testing.assert_allclose(sn[:3], 1 / np.sqrt(3), rtol=1e-6)
    np.testing.assert_allclose(sn[3:5], 1 / np.sqrt(2), rtol=1e-6)
    np.testing.assert_allclose(sn[5:], 0.0)
    deg = np.asarray(gb.in_degrees())
    np.testing.assert_allclose(deg[:5], [1, 2, 1, 1, 1])


def test_segment_mean_empty_segments_no_nan():
    data = jnp.ones((4, 2))
    ids = jnp.array([0, 0, 2, 2])
    out = seg.segment_mean(data, ids, 5, indices_are_sorted=True)
    assert not np.any(np.isnan(np.asarray(out)))
