"""Post-hoc dissection of the s95 persistent eval blowup (CPU, no chip).

Loads the final s95 checkpoint (params effectively frozen at lr 1e-6,
val_mae ~1e8-1e16 with running stats, train_mae 0.099), then:

1. val eval with stored running stats vs batch stats (reproduce on CPU).
2. val eval with running stats RECALIBRATED from one train pass.
3. Per-BN-layer forensics: for each layer, channelwise
   stored (mean, var) vs recalibrated (mean, var) vs the val batch's OWN
   batch statistics at that layer — prints the layers/channels where
   |mean_run - mean_batch| / sqrt(var_run + eps) is largest, i.e. exactly
   where running-stats normalization mangles the val activations.

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python
       results/r3/probe_spike3.py [ckpt_dir] [config]
"""
import sys
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from signnet_basisnet_tpu.data import (add_lap_pe, choose_budgets, load_zinc,
                                       pack_batches)
from signnet_basisnet_tpu.graph import from_arrays
from signnet_basisnet_tpu.models import gnn_model
from signnet_basisnet_tpu.training import (Checkpointer, adam, build_steps,
                                           create_state, load_config,
                                           make_zinc_predict)
from signnet_basisnet_tpu.training.train import TrainState, evaluate

CKPT = sys.argv[1] if len(sys.argv) > 1 else \
    "results/r3/zinc/ckpt_gin_zinc_signinv_gin_s95"
CFG = sys.argv[2] if len(sys.argv) > 2 else "configs/gin_zinc_signinv_gin.json"

cfg = load_config(CFG, [])
splits, _ = load_zinc("data/zinc")
for g in splits.values():
    add_lap_pe(g, cfg.model.pos_enc_dim)
nb, eb, gc = choose_budgets(splits["train"], cfg.train.batch_size)
k = cfg.model.pos_enc_dim
mk = lambda graphs, sh, seed: [from_arrays(a) for a in pack_batches(
    graphs, nb, eb, gc, shuffle=sh, seed=seed, k=k)]
val_batches = mk(splits["val"], False, 0)
train_batches = mk(splits["train"], False, 0)

params_kw = dict(hidden_dim=cfg.model.hidden_dim, out_dim=cfg.model.out_dim,
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
model = gnn_model(cfg.model.model, **params_kw)
tx = adam(0.0)
state = create_state(model, val_batches[0], tx, rng=jax.random.PRNGKey(95),
                     model_kwargs={"pos_enc": val_batches[0].eigvecs})
ckpt = Checkpointer(CKPT, 2)
step = ckpt.latest_step()
restored = ckpt.restore({"params": state.params,
                         "batch_stats": state.batch_stats,
                         "opt_state": state.opt_state, "lr": 1e-6}, step)
state = TrainState(params=restored["params"],
                   batch_stats=restored["batch_stats"],
                   opt_state=state.opt_state, step=jnp.int32(0))
print(f"restored checkpoint step {step} from {CKPT}", flush=True)

predict = make_zinc_predict(model, lap_method=cfg.model.lap_method)
_, eval_step = build_steps(predict, tx, donate=False)


@jax.jit
def eval_step_batchstats(st, gb):
    pred, _ = predict({"params": st.params, "batch_stats": st.batch_stats},
                      gb, True, {"dropout": jax.random.PRNGKey(0)},
                      ["batch_stats"])
    score = pred[0] if isinstance(pred, tuple) else pred
    y = gb.y[:, 0] if (score.ndim == 1 and gb.y.ndim == 2) else gb.y
    from signnet_basisnet_tpu.training import metrics as M
    mae = M.masked_l1(score, y, gb.graph_mask)
    n = gb.graph_mask.sum()
    return {"loss_sum": mae * n, "mae_sum": mae * n, "n": n}


@jax.jit
def stats_pass(st, gb):
    _, upd = predict({"params": st.params, "batch_stats": st.batch_stats},
                     gb, True, {"dropout": jax.random.PRNGKey(0)},
                     ["batch_stats"])
    return TrainState(params=st.params, batch_stats=upd["batch_stats"],
                      opt_state=st.opt_state, step=st.step)


v_run = evaluate(eval_step, state, val_batches)["mae"]
v_bat = evaluate(eval_step_batchstats, state, val_batches)["mae"]
print(f"val (stored running stats): {v_run:.4f}", flush=True)
print(f"val (batch stats):          {v_bat:.4f}", flush=True)

rstate = state
for gb in train_batches[:40]:
    rstate = stats_pass(rstate, gb)
v_ref = evaluate(eval_step, rstate, val_batches)["mae"]
print(f"val (recalibrated, 40 train batches): {v_ref:.4f}", flush=True)

# batch-stat collection on the first VAL batch: run one mutable pass from
# the stored stats and compare the resulting (0.9*stored + 0.1*valbatch)
# update back against stored -> isolates where the val batch's own
# statistics sit relative to the stored normalizers.
vstate = stats_pass(state, val_batches[0])


def forensic(stored, other, label, top=8):
    sl = jax.tree_util.tree_flatten_with_path(stored)[0]
    ol = {jax.tree_util.keystr(p): np.asarray(x)
          for p, x in jax.tree_util.tree_flatten_with_path(other)[0]}
    mods = {}
    for p, x in sl:
        name = jax.tree_util.keystr(p)
        mods.setdefault(name.rsplit("['", 1)[0], {})[
            name.rsplit("['", 1)[1].rstrip("']")] = np.asarray(x)
    rows = []
    for mod, lv in mods.items():
        if "mean" not in lv or "var" not in lv:
            continue
        m_s, v_s = lv["mean"], lv["var"]
        m_o = ol.get(mod + "['mean']")
        v_o = ol.get(mod + "['var']")
        if m_o is None:
            continue
        # other mean implied by the momentum update: m_o = .9 m_s + .1 m_b
        m_b = (m_o - 0.9 * m_s) / 0.1
        v_b = (v_o - 0.9 * v_s) / 0.1
        z = np.abs(m_b - m_s) / np.sqrt(np.abs(v_s) + 1e-5)
        j = int(np.argmax(z))
        rows.append((float(z[j]), mod, j, float(m_s[j]), float(v_s[j]),
                     float(m_b[j]), float(v_b[j])))
    rows.sort(reverse=True)
    print(f"--- {label}: top layers by |mean_batch-mean_stored|/sigma_stored")
    for z, mod, j, ms, vs, mb, vbch in rows[:top]:
        print(f"  z={z:12.4e} ch{j:4d} stored(m={ms:10.3e} v={vs:10.3e}) "
              f"batch(m={mb:10.3e} v={vbch:10.3e})  {mod}", flush=True)


forensic(jax.device_get(state.batch_stats),
         jax.device_get(vstate.batch_stats), "stored vs VAL batch stats")
forensic(jax.device_get(state.batch_stats),
         jax.device_get(stats_pass(state, train_batches[0]).batch_stats),
         "stored vs TRAIN batch stats")
print("PROBE3_DONE")
