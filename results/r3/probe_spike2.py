"""Localize the residual val-MAE spikes (r3: seed 95 spikes, seed 41 clean,
both WITH the phi-BN fix — so phi-missing-BN was only part of the story).

Usage: python results/r3/probe_spike2.py [epochs] [seed]

Per epoch, evaluates val three ways (running stats / batch stats /
refreshed running stats) exactly like probe_spike.py, and in addition, on
SPIKE epochs (val_run > 5x val_batch + 0.5), names the drifted layers: for
every BN running-stats leaf it computes the drift of the *stored* running
stats against a fresh recalibration pass over this epoch's train batches,

    drift(layer) = max_channels |mean_stored - mean_fresh| / sqrt(var_fresh + eps)
    vratio(layer) = max_channels  var_stored / var_fresh   (and min ratio)

and prints the top-5 layers by drift.  A layer whose stored mean is many
fresh-sigmas off (or whose stored var is orders of magnitude off) is the
one corrupting running-stats eval.
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

EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 80
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 95

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
state = create_state(model, val_batches[0], tx, rng=jax.random.PRNGKey(SEED),
                     model_kwargs={"pos_enc": val_batches[0].eigvecs})
predict = make_zinc_predict(model, lap_method=cfg.model.lap_method)
train_step, eval_step = build_steps(predict, tx, donate=False)
rng = jax.random.PRNGKey(SEED)


@jax.jit
def eval_step_batchstats(state, gb):
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


def drift_report(stored, fresh, top=5):
    rows = []
    sl = jax.tree_util.tree_flatten_with_path(stored)[0]
    fl = jax.tree_util.tree_flatten_with_path(fresh)[0]
    by_name = {jax.tree_util.keystr(p): np.asarray(x) for p, x in fl}
    means = {}
    for p, x in sl:
        name = jax.tree_util.keystr(p)
        means.setdefault(name.rsplit("['", 1)[0], {})[name] = np.asarray(x)
    for mod, leaves in means.items():
        m_s = next((v for n, v in leaves.items() if n.endswith("'mean']")),
                   None)
        v_s = next((v for n, v in leaves.items() if n.endswith("'var']")),
                   None)
        if m_s is None or v_s is None:
            continue
        m_f = by_name.get(mod + "['mean']")
        v_f = by_name.get(mod + "['var']")
        if m_f is None or v_f is None:
            continue
        sig = np.sqrt(np.abs(v_f) + 1e-5)
        drift = float(np.max(np.abs(m_s - m_f) / sig))
        vr = (v_s + 1e-12) / (v_f + 1e-12)
        rows.append((drift, float(np.max(vr)), float(np.min(vr)), mod))
    rows.sort(reverse=True)
    for d, vmax, vmin, mod in rows[:top]:
        print(f"    drift={d:10.3e}  var_ratio[max={vmax:.3e} "
              f"min={vmin:.3e}]  {mod}", flush=True)


lr = cfg.train.init_lr
print(f"seed={SEED} epochs={EPOCHS}", flush=True)
print("epoch  val_run   val_batch  val_refresh", flush=True)
for epoch in range(EPOCHS):
    t0 = time.time()
    batches = mk(splits["train"], True, SEED + epoch)
    for gb in batches:
        rng, sub = jax.random.split(rng)
        state, m = train_step(state, gb, lr, sub)
    v_run = evaluate(eval_step, state, val_batches)["mae"]
    v_bat = evaluate(eval_step_batchstats, state, val_batches)["mae"]
    rstate = state
    for gb in batches:
        rstate = refresh_pass(rstate, gb)
    v_ref = evaluate(eval_step, rstate, val_batches)["mae"]
    spike = v_run > 5 * v_bat + 0.5
    print(f"{epoch:5d}  {v_run:9.4f}  {v_bat:8.4f}  {v_ref:9.4f}"
          f"{'  <-- SPIKE' if spike else ''}  ({time.time()-t0:.1f}s)",
          flush=True)
    if spike:
        drift_report(jax.device_get(state.batch_stats),
                     jax.device_get(rstate.batch_stats))
print("PROBE2_DONE")
