"""End-to-end smoke tests: short training runs must reduce the loss."""
import numpy as np
import jax
import jax.numpy as jnp

from signnet_basisnet_tpu.data import (add_lap_pe, choose_budgets,
                                       pack_batches, synthetic_zinc)
from signnet_basisnet_tpu.graph import from_arrays
from signnet_basisnet_tpu.models import GINNet, SignNetGNN
from signnet_basisnet_tpu.training import (adam, build_steps, create_state,
                                           evaluate, make_module_predict,
                                           make_zinc_predict)


def _zinc_batches(n=96, batch=32, k=4, full_evd=False):
    splits = synthetic_zinc(num_train=n, num_val=32, num_test=32, seed=0)
    if full_evd:
        from signnet_basisnet_tpu.data import add_full_evd
        for g in splits.values():
            add_full_evd(g)
        kk = None
    else:
        for g in splits.values():
            add_lap_pe(g, k)
        kk = k
    nb, eb, gc = choose_budgets(splits["train"], batch)
    mk = lambda graphs: [from_arrays(a) for a in
                         pack_batches(graphs, nb, eb, gc, k=kk)]
    return mk(splits["train"]), mk(splits["val"])


def test_gin_signinv_training_reduces_loss():
    train_b, val_b = _zinc_batches()
    model = GINNet(hidden_dim=16, out_dim=16, n_layers=3, pos_enc_dim=4,
                   lap_method="sign_inv", sign_inv_layers=2, phi_out_dim=2,
                   dropout=0.0)
    tx = adam()
    state = create_state(model, train_b[0], tx,
                         model_kwargs={"pos_enc": train_b[0].eigvecs})
    predict = make_zinc_predict(model, "sign_inv")
    train_step, eval_step = build_steps(predict, tx, donate=False)

    rng = jax.random.PRNGKey(0)
    lr = jnp.float32(3e-3)
    epoch_losses = []
    for epoch in range(15):
        losses = []
        for gb in train_b:
            rng, sub = jax.random.split(rng)
            state, m = train_step(state, gb, lr, sub)
            losses.append(float(m["loss"]))
        epoch_losses.append(np.mean(losses))
    after = evaluate(eval_step, state, val_b)["mae"]
    assert np.isfinite(after)
    # training loss must come down substantially on the train set
    assert epoch_losses[-1] < 0.8 * epoch_losses[0], epoch_losses


def test_signnet_gnn_training_step_runs():
    train_b, val_b = _zinc_batches(full_evd=True)
    model = SignNetGNN(n_hid=16, n_out=1, nl_signnet=2, nl_gnn=2, nl_rho=1,
                       node_vocab=28, edge_vocab=4)
    tx = adam()
    state = create_state(model, train_b[0], tx)
    predict = make_module_predict(model)
    train_step, eval_step = build_steps(predict, tx, donate=False)
    rng = jax.random.PRNGKey(0)
    losses = []
    for epoch in range(3):
        for gb in train_b:
            rng, sub = jax.random.split(rng)
            state, m = train_step(state, gb, jnp.float32(1e-3), sub)
            losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.5  # not diverging


def test_filters_driver_e2e(tmp_path):
    """train_filters on the real 2Dgrid.mat: short MLP run, loss descends."""
    from signnet_basisnet_tpu.train_filters import build_parser, run
    ap = build_parser()
    args = ap.parse_args(["--net", "MLP", "--epochs", "40", "--img_num", "1",
                          "--scan_epochs", "20", "--use_eig",
                          "--lap_method", "none",
                          "--results_dir", str(tmp_path)])
    arr = run(args, log=lambda *a: None)
    assert arr.shape == (1, 2)
    assert np.isfinite(arr).all()
    # after 40 epochs the best masked-MSE sum must be well below the
    # predict-zero scale (band-filter label norms are O(1))
    assert arr[0, 0] < 10.0
