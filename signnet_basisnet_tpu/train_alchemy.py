"""CLI driver: Alchemy 12-target regression with SignNet PE (the Alchemy
workload).

    python -m signnet_basisnet_tpu.train_alchemy [--seeds 5] [key value ...]

Multi-seed loop, y standardization from train stats, L1 loss, per-target MAE
and logMAE, plateau LR with min-lr convergence stop (reference:
Alchemy/main_alchemy.py:29-164; model config hidden 108, nl_signnet 8,
nl_gnn 16, nl_rho 8 per lines 33-35).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from .data import (add_full_evd, choose_budgets, load_alchemy, pack_batches,
                   standardize_targets)
from .graph import from_arrays
from .models import SignNetGNN
from .training import (Checkpointer, adam, build_steps, count_params,
                       create_state, evaluate, fit, make_module_predict)


def _seed_json(args, seed):
    return (os.path.join(args.out_dir, f"alchemy_s{seed}.json")
            if args.out_dir else None)


def run(args, log=print):
    splits, real = load_alchemy(args.data_dir,
                                synth_sizes=(args.synth_train,
                                             args.synth_eval,
                                             args.synth_eval))
    log(f"dataset: Alchemy ({'real' if real else 'synthetic'})")
    stats = standardize_targets(splits)
    for graphs in splits.values():
        add_full_evd(graphs, normalization=None)

    nb, eb, gcnt = choose_budgets(splits["train"], args.batch_size)
    mk = lambda graphs, shuffle, seed: [
        from_arrays(a) for a in pack_batches(graphs, nb, eb, gcnt,
                                             shuffle=shuffle, seed=seed)]
    val_b = mk(splits["val"], False, 0)
    test_b = mk(splits["test"], False, 0)

    results = []
    for seed in range(args.seed0, args.seeds):
        # queue robustness (tunnel hangs killed the whole r3 multi-seed
        # process): completed seeds leave a results JSON, a retry skips them
        sj = _seed_json(args, seed)
        if sj and os.path.exists(sj):
            with open(sj) as f:
                d = json.load(f)
            log(f"seed {seed}: already done (MAE {d['test_mae']:.4f}), skip")
            results.append((d["test_mae"], d["logmae"]))
            continue
        model = SignNetGNN(n_hid=args.hidden, n_out=12,
                           nl_signnet=args.nl_signnet, nl_gnn=args.nl_gnn,
                           nl_rho=args.nl_rho, gnn_type="GINEConv",
                           phi_gnn_type=args.phi_gnn_type,
                           node_vocab=args.node_vocab,
                           edge_vocab=args.edge_vocab)
        tx = adam(weight_decay=args.weight_decay)
        state = create_state(model, val_b[0], tx,
                             rng=jax.random.PRNGKey(seed))
        if seed == 0:
            log(f"params: {count_params(state.params)}")
        predict = make_module_predict(model)
        train_step, eval_step = build_steps(predict, tx)
        ckpt = (Checkpointer(os.path.join(args.ckpt_dir, f"s{seed}"))
                if args.ckpt_dir else None)
        res = fit(state, train_step, eval_step,
                  train_batches_fn=lambda ep: mk(splits["train"], True,
                                                 seed * 10000 + ep),
                  val_batches_fn=lambda: val_b,
                  test_batches_fn=lambda: test_b,
                  epochs=args.epochs, init_lr=args.lr,
                  lr_reduce_factor=0.5, lr_schedule_patience=5,
                  min_lr=1e-6, max_time_hours=args.max_time_hours,
                  seed=seed, log_every=args.log_every, logger=log,
                  checkpointer=ckpt, resume=args.resume,
                  best_val_test=True)

        # per-target MAE + logMAE on test, final state (reference:
        # main_alchemy.py:114-126: logMAE = mean of per-target log MAEs)
        from .training import metrics as M

        @jax.jit
        def per_target(state_params, state_bs, gb):
            pred, _ = predict({"params": state_params,
                               "batch_stats": state_bs}, gb, False, None,
                              ["batch_stats"])
            n = gb.graph_mask.sum()
            return M.masked_l1_per_target(pred, gb.y, gb.graph_mask) * n, n

        sums, cnt = None, 0.0
        for gb in test_b:
            s, n = per_target(res.state.params, res.state.batch_stats, gb)
            sums = s if sums is None else sums + s
            cnt += float(n)
        mae_t = np.asarray(sums) / max(cnt, 1.0)
        logmae = float(np.log(np.maximum(mae_t, 1e-12)).mean())
        log(f"seed {seed}: test MAE {res.test_mae:.4f} "
            f"logMAE {logmae:.4f} (epochs {res.epochs_run})")
        log("  per-target MAE: "
            + " ".join(f"{v:.4f}" for v in mae_t))
        if sj:
            os.makedirs(args.out_dir, exist_ok=True)
            with open(sj, "w") as f:
                json.dump(dict(seed=seed, test_mae=float(res.test_mae),
                               logmae=logmae,
                               per_target_mae=[float(v) for v in mae_t],
                               val_mae=float(res.val_mae),
                               best_val_mae=float(res.best_val_mae),
                               epochs=res.epochs_run,
                               wall_time=res.wall_time), f, indent=2)
        results.append((res.test_mae, logmae))
    arr = np.array(results)
    log(f"FINAL over {len(results)} seeds: MAE {arr[:, 0].mean():.4f} "
        f"+- {arr[:, 0].std():.4f}; logMAE {arr[:, 1].mean():.4f}")
    return arr


def build_parser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="data/alchemy")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--weight_decay", type=float, default=1e-5)
    ap.add_argument("--hidden", type=int, default=108)
    ap.add_argument("--nl_signnet", type=int, default=8)
    ap.add_argument("--nl_gnn", type=int, default=16)
    ap.add_argument("--nl_rho", type=int, default=8)
    ap.add_argument("--phi_gnn_type", default="MaskedGINConv",
                    choices=["MaskedGINConv", "MaskedGINEConv"])
    ap.add_argument("--node_vocab", type=int, default=10)
    ap.add_argument("--edge_vocab", type=int, default=10)
    ap.add_argument("--synth_train", type=int, default=10000)
    ap.add_argument("--synth_eval", type=int, default=1000)
    ap.add_argument("--max_time_hours", type=float, default=12.0)
    ap.add_argument("--log_every", type=int, default=5)
    ap.add_argument("--seed0", type=int, default=0,
                    help="first seed (retries skip completed seeds)")
    ap.add_argument("--out_dir", default=None,
                    help="write per-seed results JSON here")
    ap.add_argument("--ckpt_dir", default=None,
                    help="per-seed checkpoint dirs under this root")
    ap.add_argument("--resume", action="store_true",
                    help="resume each seed from its latest checkpoint")
    return ap


if __name__ == "__main__":
    run(build_parser().parse_args())
