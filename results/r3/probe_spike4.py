"""Bisect WHERE the eval-mode forward explodes (s95 final checkpoint).

Runs the restored model over the val set, finds the worst batch, then
re-runs that batch with flax capture_intermediates in BOTH modes
(training=False running stats / training=True batch stats) and prints the
max-|activation| of every module in forward order — the first module whose
eval-mode scale departs from its train-mode scale is the culprit.

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python
       results/r3/probe_spike4.py
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
from signnet_basisnet_tpu.training import (Checkpointer, adam, create_state,
                                           load_config)
from signnet_basisnet_tpu.training.train import TrainState

CKPT = sys.argv[1] if len(sys.argv) > 1 else \
    "results/r3/zinc/ckpt_gin_zinc_signinv_gin_s95"

cfg = load_config("configs/gin_zinc_signinv_gin.json", [])
splits, _ = load_zinc("data/zinc")
for g in splits.values():
    add_lap_pe(g, cfg.model.pos_enc_dim)
nb, eb, gc = choose_budgets(splits["train"], cfg.train.batch_size)
mk = lambda graphs: [from_arrays(a) for a in pack_batches(
    graphs, nb, eb, gc, k=cfg.model.pos_enc_dim)]
val_batches = mk(splits["val"])

model = gnn_model("GIN", hidden_dim=95, out_dim=95, n_layers=16,
                  readout="mean", in_feat_dropout=0.0, dropout=0.0,
                  batch_norm=True, residual=True, edge_feat=True,
                  pe_init="lap_pe", lap_method="sign_inv", pos_enc_dim=8,
                  sign_inv_net="gin", sign_inv_layers=8, phi_out_dim=4,
                  pe_aggregate="concat", max_nodes=cfg.model.max_nodes,
                  remat=cfg.model.remat)
st = create_state(model, val_batches[0], adam(0.0),
                  rng=jax.random.PRNGKey(95),
                  model_kwargs={"pos_enc": val_batches[0].eigvecs})
ckpt = Checkpointer(CKPT, 2)
step = ckpt.latest_step()
restored = ckpt.restore({"params": st.params, "batch_stats": st.batch_stats,
                         "opt_state": st.opt_state, "lr": 1e-6}, step)
params, bs = restored["params"], restored["batch_stats"]
print(f"restored step {step}", flush=True)

variables = {"params": params, "batch_stats": bs}


def fwd(gb, training):
    out = model.apply(variables, gb, gb.eigvecs, training=training,
                      rngs={"dropout": jax.random.PRNGKey(0)},
                      mutable=["batch_stats", "intermediates"],
                      capture_intermediates=True)
    return out


# find worst val batch at eval
worst, worst_mae = None, -1.0
for i, gb in enumerate(val_batches):
    (scores), upd = model.apply(variables, gb, gb.eigvecs, training=False,
                                mutable=["batch_stats"])
    score = scores[0] if isinstance(scores, tuple) else scores
    y = gb.y[:, 0] if (score.ndim == 1 and gb.y.ndim == 2) else gb.y
    mae = float(jnp.sum(jnp.abs(score - y) * gb.graph_mask)
                / jnp.sum(gb.graph_mask))
    print(f"val batch {i}: eval-mode MAE {mae:.4e}", flush=True)
    if mae > worst_mae:
        worst, worst_mae = gb, mae

print(f"\nworst batch MAE {worst_mae:.4e}; capturing intermediates...",
      flush=True)


def summarize(gb, training):
    _, upd = fwd(gb, training)
    inter = upd["intermediates"]
    rows = []
    for p, leaf in jax.tree_util.tree_flatten_with_path(inter)[0]:
        name = jax.tree_util.keystr(p)
        arr = np.asarray(leaf)
        rows.append((name.replace("['__call__'][0]", ""),
                     float(np.max(np.abs(arr)))))
    return dict(rows)


ev = summarize(worst, False)
tr = summarize(worst, True)
print(f"{'module':70s} {'max|eval|':>12s} {'max|train|':>12s} ratio")
for name in ev:
    e, t = ev[name], tr.get(name, float('nan'))
    flag = "  <<<" if e > 10 * max(t, 1.0) else ""
    print(f"{name:70s} {e:12.4e} {t:12.4e} {e / max(t, 1e-30):8.2e}{flag}",
          flush=True)
print("PROBE4_DONE")
