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
