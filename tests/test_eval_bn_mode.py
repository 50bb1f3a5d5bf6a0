"""eval_bn_mode='batch' is immune to BN dead-channel revival.

Constructs the pathology directly: a model whose BN running stats were
trained on inputs where one channel is identically zero (running var -> 0),
then evaluates a batch that activates that channel.  Running-stats eval
amplifies by 1/sqrt(eps); batch-stats eval stays sane and matches the
training=True forward.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from signnet_basisnet_tpu.graph import batch_np, from_arrays
from signnet_basisnet_tpu.models import gnn_model
from signnet_basisnet_tpu.training import adam, build_steps, create_state
from signnet_basisnet_tpu.training.train import make_zinc_predict


def _graphs(rng, n_graphs, zero_pe=False):
    gs = []
    for _ in range(n_graphs):
        n = int(rng.integers(6, 12))
        e = int(rng.integers(n, 2 * n))
        pe = rng.normal(size=(n, 4)).astype(np.float32)
        if zero_pe:
            pe[:, 2] = 0.0  # channel the training data never activates
        gs.append(dict(
            senders=rng.integers(0, n, e).astype(np.int32),
            receivers=rng.integers(0, n, e).astype(np.int32),
            node_feat=rng.integers(0, 5, n).astype(np.int32),
            edge_feat=rng.integers(0, 3, e).astype(np.int32),
            y=np.array([float(rng.normal())], np.float32),
            eigvecs=pe,
            eigvals=np.zeros(4, np.float32)))
    return gs


@pytest.mark.parametrize("mode", ["running", "batch"])
def test_eval_modes_run_and_agree_without_pathology(mode):
    rng = np.random.default_rng(0)
    gs = _graphs(rng, 8)
    arrays = batch_np(gs, 128, 256, 9, k=4)
    gb = from_arrays(arrays)
    model = gnn_model("GIN", hidden_dim=16, out_dim=16, n_layers=2,
                      pos_enc_dim=4, lap_method="none", batch_norm=True,
                      dropout=0.0, edge_feat=True)
    tx = adam()
    state = create_state(model, gb, tx, model_kwargs={"pos_enc": gb.eigvecs})
    predict = make_zinc_predict(model, lap_method="none")
    train_step, eval_step = build_steps(predict, tx, donate=False,
                                        eval_bn_mode=mode)
    for _ in range(3):
        state, _ = train_step(state, gb, jnp.float32(1e-3),
                              jax.random.PRNGKey(0))
    out = eval_step(state, gb)
    assert np.isfinite(float(out["mae_sum"]))


def test_batch_mode_immune_to_dead_channel_revival():
    """Surgically reproduce the s95 pathology: zero one BN layer's stored
    running stats (a channel identically zero on all training data decays
    to running mean=var=0.0 exactly), then evaluate a batch that activates
    it.  Running-stats eval divides by sqrt(0+eps) and blows up; batch
    mode ignores stored stats entirely."""
    from signnet_basisnet_tpu.training.train import TrainState

    rng = np.random.default_rng(1)
    gs = _graphs(rng, 8)
    gb = from_arrays(batch_np(gs, 128, 256, 9, k=4))
    model = gnn_model("GIN", hidden_dim=16, out_dim=16, n_layers=4,
                      pos_enc_dim=4, lap_method="none", batch_norm=True,
                      dropout=0.0, edge_feat=True)
    tx = adam()
    state = create_state(model, gb, tx, model_kwargs={"pos_enc": gb.eigvecs})
    predict = make_zinc_predict(model, lap_method="none")
    train_step, eval_run = build_steps(predict, tx, donate=False,
                                       eval_bn_mode="running")
    _, eval_batch = build_steps(predict, tx, donate=False,
                                eval_bn_mode="batch")
    for i in range(5):
        state, _ = train_step(state, gb, jnp.float32(1e-3),
                              jax.random.PRNGKey(i))
    clean_run = float(eval_run(state, gb)["mae_sum"])
    clean_bat = float(eval_batch(state, gb)["mae_sum"])

    bs = jax.device_get(state.batch_stats)
    # poison the readout-adjacent conv so the blowup reaches the score
    # (in shallow stacks an early-layer blowup can wash out through the
    # trained head; the 16-layer flagship compounds it instead)
    layer = sorted(k for k in bs if k.startswith("mlp_"))[-1]
    bs[layer]["bn_0"]["mean"] = np.zeros_like(bs[layer]["bn_0"]["mean"])
    bs[layer]["bn_0"]["var"] = np.zeros_like(bs[layer]["bn_0"]["var"])
    poisoned = TrainState(params=state.params, batch_stats=bs,
                          opt_state=state.opt_state, step=state.step)

    run_mae = float(eval_run(poisoned, gb)["mae_sum"])
    bat_mae = float(eval_batch(poisoned, gb)["mae_sum"])
    # batch mode ignores stored stats: unchanged and sane
    np.testing.assert_allclose(bat_mae, clean_bat, rtol=1e-6)
    # running mode is corrupted by the poisoned normalizer (the
    # pre-readout activation blows up ~1/sqrt(eps)=316x; the trained head
    # shrinks what reaches the score in this shallow model — the 16-layer
    # flagship instead compounds it to 1e16, probe_spike4.log)
    assert run_mae > 3 * clean_run
