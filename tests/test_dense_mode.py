"""Dense block-diagonal fast path: parity with the flat COO path.

Same graphs, same parameters, two representations -> identical outputs
(including training mode, which exercises masked-BN statistics equality)."""
import numpy as np
import jax
import jax.numpy as jnp

from signnet_basisnet_tpu.graph import batch_np, from_arrays
from signnet_basisnet_tpu.graph.dense import (dense_batch_np,
                                              dense_from_arrays,
                                              dense_neighbor_sum)
from signnet_basisnet_tpu import models as M
from signnet_basisnet_tpu import spectral as sp


def graphs(rng, sizes=(5, 7, 6)):
    out = []
    for n in sizes:
        A = np.triu((rng.random((n, n)) < 0.5).astype(int), 1)
        A = A + A.T
        s, r = np.nonzero(A)
        vals, vecs = sp.lap_pe_np(s, r, n, k=4)
        out.append(dict(senders=s, receivers=r,
                        node_feat=rng.integers(0, 28, n),
                        edge_feat=rng.integers(0, 4, len(s)),
                        y=np.array([float(rng.normal())], np.float32),
                        eigvals=vals, eigvecs=vecs))
    return out


def both_batches(rng):
    gs = graphs(rng)
    flat = from_arrays(batch_np(gs, 32, 96, 5, k=4))
    dense = dense_from_arrays(dense_batch_np(gs, num_graphs=4, max_nodes=8,
                                             k=4))
    return flat, dense


def test_dense_neighbor_sum_matches_flat():
    rng = np.random.default_rng(0)
    flat, dense = both_batches(rng)
    x_flat = jnp.asarray(
        rng.normal(size=(flat.num_nodes, 6)).astype(np.float32))
    x_flat = x_flat * flat.node_mask[:, None]
    # scatter same features into dense layout
    x_dense = np.zeros((dense.num_graphs, dense.max_nodes, 6), np.float32)
    off = 0
    for g in range(dense.num_graphs):
        n = int(dense.n_node[g])
        x_dense[g, :n] = np.asarray(x_flat)[off:off + n]
        off += n
    agg_flat = jax.ops.segment_sum(
        x_flat[flat.senders] * flat.edge_mask[:, None], flat.receivers,
        num_segments=flat.num_nodes)
    agg_dense = dense_neighbor_sum(dense.adj, jnp.asarray(x_dense))
    off = 0
    for g in range(dense.num_graphs):
        n = int(dense.n_node[g])
        np.testing.assert_allclose(np.asarray(agg_dense)[g, :n],
                                   np.asarray(agg_flat)[off:off + n],
                                   atol=1e-5)
        off += n


def test_gin_net_dense_flat_parity():
    """Same params, both representations, training mode -> same scores."""
    rng = np.random.default_rng(1)
    flat, dense = both_batches(rng)
    model = M.GINNet(hidden_dim=16, out_dim=16, n_layers=3, pos_enc_dim=4,
                     lap_method="sign_inv", sign_inv_layers=2, phi_out_dim=2,
                     batch_norm=True, dropout=0.0)
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, flat, flat.eigvecs, training=False)

    out_flat = model.apply(variables, flat, flat.eigvecs, training=True,
                           mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(1)})[0]
    out_dense = model.apply(variables, dense, dense.eigvecs, training=True,
                            mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(1)})[0]
    # real graphs occupy slots 0..2 in both layouts
    np.testing.assert_allclose(np.asarray(out_flat)[:3],
                               np.asarray(out_dense)[:3], atol=2e-4)


def test_gine_dense_flat_parity():
    rng = np.random.default_rng(2)
    gs = graphs(rng)
    flat = from_arrays(batch_np(gs, 32, 96, 5, k=4))
    dense = dense_from_arrays(dense_batch_np(gs, 4, 8, k=4))
    from signnet_basisnet_tpu.nn.mlp import ElementsMLP
    from signnet_basisnet_tpu.nn.init import Embedding
    from flax import linen as nn_

    class Tiny(nn_.Module):
        @nn_.compact
        def __call__(self, gb, training=True):
            x = Embedding(28, 8, name="emb")(gb.node_feat.astype(jnp.int32))
            e = Embedding(4, 8, name="eemb")(gb.edge_feat.astype(jnp.int32))
            update = ElementsMLP(8, num_layers=2, with_final_activation=False,
                                 name="up")
            conv = M.GINEConv(update, learn_eps=True, name="conv")
            x = conv(gb, x, e, training=training)
            from signnet_basisnet_tpu.models.conv import pool_any
            return pool_any(gb, x, reduce="sum")

    model = Tiny()
    variables = model.init({"params": jax.random.PRNGKey(0)}, flat,
                           training=False)
    a = model.apply(variables, flat, training=True,
                    mutable=["batch_stats"])[0]
    b = model.apply(variables, dense, training=True,
                    mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(a)[:3], np.asarray(b)[:3],
                               atol=2e-4)
