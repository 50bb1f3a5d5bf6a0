"""Checkpoint save/restore round-trip and config system."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from signnet_basisnet_tpu.training import (Checkpointer, Config, adam,
                                           load_config)


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3),
                   "b": jnp.zeros((3,))},
        "step": jnp.asarray(7),
    }
    ck = Checkpointer(str(tmp_path / "ck"), keep=2)
    ck.save(0, state)
    state2 = jax.tree.map(lambda x: x + 1, state)
    ck.save(1, state2)
    assert ck.latest_step() == 1
    restored = ck.restore(jax.tree.map(np.zeros_like, state2))
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.asarray(state2["params"]["w"]))
    assert int(np.asarray(restored["step"])) == 8


def test_checkpoint_prunes_old(tmp_path):
    ck = Checkpointer(str(tmp_path / "ck"), keep=2)
    state = {"x": jnp.zeros(2)}
    for i in range(5):
        ck.save(i, state)
    steps = ck.mgr.all_steps()
    assert list(steps) == [3, 4]


def test_config_load_and_overrides(tmp_path):
    p = tmp_path / "c.json"
    p.write_text('{"train": {"epochs": 7}, "model": {"model": "PNA"}}')
    cfg = load_config(str(p), ["train.init_lr", "0.01", "model.hidden_dim",
                               "33", "model.extra.aggregators", '["mean"]'])
    assert cfg.train.epochs == 7
    assert cfg.model.model == "PNA"
    assert cfg.train.init_lr == 0.01
    assert cfg.model.hidden_dim == 33
    assert cfg.model.extra["aggregators"] == ["mean"]


def test_config_rejects_unknown_keys(tmp_path):
    p = tmp_path / "c.json"
    p.write_text('{"train": {"nope": 1}}')
    with pytest.raises(KeyError):
        load_config(str(p))


def test_plateau_scheduler():
    from signnet_basisnet_tpu.training import ReduceLROnPlateau
    s = ReduceLROnPlateau(factor=0.5, patience=2, min_lr=1e-3, lr=1.0)
    s.step(1.0)
    for _ in range(3):
        s.step(2.0)
    assert s.lr == 0.5
    for _ in range(40):
        s.step(2.0)
    assert s.lr == 1e-3 and s.converged


def test_fit_resume_from_checkpoint(tmp_path):
    """fit(resume=True) restores params/opt/lr and fast-forwards epochs."""
    import jax
    import jax.numpy as jnp
    from signnet_basisnet_tpu.graph import batch_np, from_arrays
    from signnet_basisnet_tpu.models import gnn_model
    from signnet_basisnet_tpu.training import (Checkpointer, adam, build_steps,
                                               create_state, fit,
                                               make_zinc_predict)

    rng = np.random.default_rng(0)
    def tiny(n):
        A = np.triu((rng.random((n, n)) < 0.5).astype(int), 1)
        A = A + A.T
        s, r = np.nonzero(A)
        return dict(senders=s, receivers=r,
                    node_feat=rng.integers(0, 6, n),
                    edge_feat=rng.integers(0, 4, len(s)),
                    y=np.array([0.1], np.float32))
    gb = from_arrays(batch_np([tiny(5), tiny(6)], 16, 64, 3))

    model = gnn_model("GIN", hidden_dim=8, out_dim=8, n_layers=1,
                      pe_init="none", lap_method="none")
    tx = adam()
    predict = make_zinc_predict(model)
    train_step, eval_step = build_steps(predict, tx, donate=False)

    ck = Checkpointer(str(tmp_path / "ck"), keep=2)
    state = create_state(model, gb, tx, model_kwargs={"pos_enc": None})
    r1 = fit(state, train_step, eval_step, lambda ep: [gb], lambda: [gb],
             epochs=2, init_lr=1e-3, checkpointer=ck, log_every=100)
    assert ck.latest_step() == 1

    # fresh state + resume: must fast-forward past saved epochs and pick up
    # the checkpointed params (not the fresh init)
    state2 = create_state(model, gb, tx, model_kwargs={"pos_enc": None},
                          rng=jax.random.PRNGKey(99))
    r2 = fit(state2, train_step, eval_step, lambda ep: [gb], lambda: [gb],
             epochs=2, init_lr=1e-3, checkpointer=ck, resume=True,
             log_every=100)
    assert r2.epochs_run == 0          # both epochs already done
    lead1 = jax.tree.leaves(r1.state.params)[0]
    lead2 = jax.tree.leaves(r2.state.params)[0]
    np.testing.assert_allclose(np.asarray(lead1), np.asarray(lead2),
                               atol=1e-6)
