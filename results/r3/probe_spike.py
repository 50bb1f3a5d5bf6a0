"""Diagnose the r2 val-MAE spikes (VERDICT r2 weak #3 / directive #2).

Hypothesis: the spikes (val_mae 7.4/27.4/94.3/30.4 while train_mae ~0.12,
recovering by the next probe) are BN running-stat pollution: an occasional
training batch produces outlier activations; with torch-parity momentum 0.1
one batch contributes 10% of the running mean/var, corrupting the eval-time
normalization; stats decay back within ~1 epoch (0.9^78 ~= 3e-4).

Probe: train the flagship GIN+SignNet config at lr 1e-3 (spikes live at
lr >= 2.5e-4) and, every epoch, evaluate val THREE ways:
  a) standard eval (running stats)            -> should spike
  b) batch-stats eval (training=True stats, updates discarded, dropout=0)
                                              -> should NOT spike
  c) standard eval after REFRESHING running stats with one pass over the
     train set (what torch users call "BN recalibration") -> should not spike
Also logs max running var / max |running mean| across layers, and the max
per-batch train loss inside the epoch (to catch the outlier batch).
"""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from signnet_basisnet_tpu.data import (add_lap_pe, choose_budgets, load_zinc,
                                       pack_batches)
from signnet_basisnet_tpu.graph import from_arrays
from signnet_basisnet_tpu.models import gnn_model
from signnet_basisnet_tpu.training import (adam, build_steps, create_state,
                                           load_config, make_zinc_predict)
from signnet_basisnet_tpu.training.train import TrainState, evaluate

cfg = load_config("configs/gin_zinc_signinv_gin.json", [])
splits, _ = load_zinc("data/zinc")
for g in splits.values():
    add_lap_pe(g, cfg.model.pos_enc_dim)
nb, eb, gc = choose_budgets(splits["train"], cfg.train.batch_size)
k = cfg.model.pos_enc_dim
mk = lambda graphs, sh, seed: [from_arrays(a) for a in pack_batches(
    graphs, nb, eb, gc, shuffle=sh, seed=seed, k=k)]
val_batches = mk(splits["val"], False, 0)

params = dict(hidden_dim=cfg.model.hidden_dim, out_dim=cfg.model.out_dim,
              n_layers=cfg.model.n_layers, readout=cfg.model.readout,
              in_feat_dropout=cfg.model.in_feat_dropout,
              dropout=cfg.model.dropout, batch_norm=cfg.model.batch_norm,
              residual=cfg.model.residual, edge_feat=cfg.model.edge_feat,
              pe_init=cfg.model.pe_init, lap_method=cfg.model.lap_method,
              pos_enc_dim=cfg.model.pos_enc_dim,
              sign_inv_net=cfg.model.sign_inv_net,
              sign_inv_layers=cfg.model.sign_inv_layers,
              phi_out_dim=cfg.model.phi_out_dim,
              pe_aggregate=cfg.model.pe_aggregate,
              max_nodes=cfg.model.max_nodes, remat=cfg.model.remat)
model = gnn_model(cfg.model.model, **params)
tx = adam(0.0)
rng = jax.random.PRNGKey(41)
state = create_state(model, val_batches[0], tx, rng=rng,
                     model_kwargs={"pos_enc": val_batches[0].eigvecs})
predict = make_zinc_predict(model, lap_method=cfg.model.lap_method)
train_step, eval_step = build_steps(predict, tx, donate=False)


@jax.jit
def eval_step_batchstats(state, gb):
    # training=True statistics, updates discarded (dropout is 0 in this cfg)
    pred, _ = predict({"params": state.params,
                       "batch_stats": state.batch_stats}, gb, True,
                      {"dropout": jax.random.PRNGKey(0)}, ["batch_stats"])
    score = pred[0] if isinstance(pred, tuple) else pred
    y = gb.y[:, 0] if (score.ndim == 1 and gb.y.ndim == 2) else gb.y
    from signnet_basisnet_tpu.training import metrics as M
    mae = M.masked_l1(score, y, gb.graph_mask)
    n = gb.graph_mask.sum()
    return {"loss_sum": mae * n, "mae_sum": mae * n, "n": n}


@jax.jit
def refresh_pass(state, gb):
    _, upd = predict({"params": state.params,
                      "batch_stats": state.batch_stats}, gb, True,
                     {"dropout": jax.random.PRNGKey(0)}, ["batch_stats"])
    return TrainState(params=state.params,
                      batch_stats=upd["batch_stats"],
                      opt_state=state.opt_state, step=state.step)


def stats_summary(bs):
    mx_var, mx_mean = 0.0, 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(bs)[0]:
        name = jax.tree_util.keystr(path)
        v = float(jnp.max(jnp.abs(leaf)))
        if name.endswith("'var']"):
            mx_var = max(mx_var, v)
        else:
            mx_mean = max(mx_mean, v)
    return mx_var, mx_mean


lr = cfg.train.init_lr
print("epoch  val_run   val_batch  val_refresh  max_ra_var  max_ra_mean "
      " max_batch_loss", flush=True)
EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 120
for epoch in range(EPOCHS):
    t0 = time.time()
    batches = mk(splits["train"], True, 41 + epoch)
    ms = []
    for gb in batches:
        rng, sub = jax.random.split(rng)
        state, m = train_step(state, gb, lr, sub)
        ms.append(m)
    ms = jax.device_get(ms)
    max_bl = max(float(m["loss"]) for m in ms)
    v_run = evaluate(eval_step, state, val_batches)["mae"]
    v_bat = evaluate(eval_step_batchstats, state, val_batches)["mae"]
    # refresh running stats on a COPY of the state via one train-set pass
    rstate = state
    for gb in batches:
        rstate = refresh_pass(rstate, gb)
    v_ref = evaluate(eval_step, rstate, val_batches)["mae"]
    mxv, mxm = stats_summary(jax.device_get(state.batch_stats))
    print(f"{epoch:5d}  {v_run:8.4f}  {v_bat:8.4f}  {v_ref:9.4f}  "
          f"{mxv:10.3e}  {mxm:10.3e}  {max_bl:8.4f}  ({time.time()-t0:.1f}s)",
          flush=True)
print("PROBE_DONE")
