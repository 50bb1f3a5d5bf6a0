"""Mixed-precision (bf16 compute, f32 master) training mode."""
import numpy as np
import jax
import jax.numpy as jnp

from signnet_basisnet_tpu import models as M
from signnet_basisnet_tpu import spectral as sp
from signnet_basisnet_tpu.graph import batch_np, from_arrays
from signnet_basisnet_tpu.training import (adam, build_steps, create_state,
                                           make_zinc_predict)


def make_batch(rng, count=6):
    gs = []
    for _ in range(count):
        n = int(rng.integers(6, 12))
        A = np.triu((rng.random((n, n)) < 0.5).astype(int), 1)
        A = A + A.T
        s, r = np.nonzero(A)
        vals, vecs = sp.lap_pe_np(s, r, n, k=4, skip_first=True)
        gs.append(dict(senders=s, receivers=r,
                       node_feat=rng.integers(0, 28, n),
                       edge_feat=rng.integers(0, 4, len(s)),
                       y=np.array([float(rng.normal())]),
                       eigvecs=vecs, eigvals=vals))
    return from_arrays(batch_np(gs, 96, 1024, count + 1, k=4))


def test_bf16_forward_close_and_loss_descends():
    rng = np.random.default_rng(0)
    gb = make_batch(rng)
    model = M.gnn_model("GIN", hidden_dim=16, out_dim=16, n_layers=2,
                        pos_enc_dim=4, lap_method="sign_inv",
                        sign_inv_layers=2, phi_out_dim=2)
    tx = adam()
    state = create_state(model, gb, tx,
                         model_kwargs={"pos_enc": gb.eigvecs})
    pred_f32 = make_zinc_predict(model, lap_method="sign_inv")
    pred_bf16 = make_zinc_predict(model, lap_method="sign_inv",
                                  compute_dtype=jnp.bfloat16)

    vars_ = {"params": state.params, "batch_stats": state.batch_stats}
    o32, _ = pred_f32(vars_, gb, False, None, ["batch_stats"])
    o16, _ = pred_bf16(vars_, gb, False, None, ["batch_stats"])
    assert o16.dtype == jnp.float32          # cast back for the loss
    np.testing.assert_allclose(np.asarray(o16), np.asarray(o32),
                               rtol=0.1, atol=0.1)

    train_step, _ = build_steps(pred_bf16, tx, donate=False)
    lr = jnp.float32(1e-3)
    losses = []
    for i in range(25):
        state, m = train_step(state, gb, lr, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # master params stay f32
    assert all(x.dtype == jnp.float32
               for x in jax.tree.leaves(state.params))
