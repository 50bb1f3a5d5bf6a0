"""CLI driver: GINE + SignNet on ZINC with masked variable-k eigenvectors
(the GINESignNetPyG workload).

    python -m signnet_basisnet_tpu.train_zinc_gine [key value ...]

Differences from train_zinc (mirroring the reference fork's deltas, SURVEY.md
§2.3): SignNetGNN with GINEConv base, all-n eigendata (EVDTransform
semantics) with per-graph masking, eigenvalues ignored (pos = 0), nl_rho=1,
StepLR schedule, distinct-eigenvalue data stats printed at startup
(reference: GINESignNetPyG/train/zinc.py:13-86, core/sign_net.py:111-134).
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from .data import add_full_evd, choose_budgets, load_zinc, pack_batches
from .graph import from_arrays
from .models import SignNetGNN
from .spectral import round_eigvals
from .training import (Checkpointer, StepLR, adam, build_steps, count_params,
                       create_state, evaluate, make_module_predict)
from .training.train import TrainState


def distinct_eig_stats(graphs) -> float:
    """Fraction of graphs whose eigenvalues are all distinct (reference:
    GINESignNetPyG/train/zinc.py:22-27)."""
    distinct = 0
    for g in graphs:
        vals = round_eigvals(np.asarray(g["eigvals"]), 5)
        if len(np.unique(vals)) == len(vals):
            distinct += 1
    return distinct / max(len(graphs), 1)


def run(args, log=print):
    splits, real = load_zinc(args.data_dir, subset=True,
                             synth_sizes=(args.synth_train, args.synth_eval,
                                          args.synth_eval))
    log(f"dataset: ZINC ({'real' if real else 'synthetic'})")
    for name, graphs in splits.items():
        add_full_evd(graphs, normalization=None)
    log(f"distinct-eigval fraction (train): "
        f"{distinct_eig_stats(splits['train']):.3f}")

    nb, eb, gcnt = choose_budgets(splits["train"], args.batch_size)
    mk = lambda graphs, shuffle, seed: [
        from_arrays(a) for a in pack_batches(graphs, nb, eb, gcnt,
                                             shuffle=shuffle, seed=seed)]
    val_b = mk(splits["val"], False, 0)
    test_b = mk(splits["test"], False, 0)

    model = SignNetGNN(n_hid=args.hidden, n_out=1, nl_signnet=args.nl_signnet,
                       nl_gnn=args.nl_gnn, nl_rho=1, ignore_eigval=True,
                       gnn_type="GINEConv", phi_gnn_type=args.phi_gnn_type,
                       node_vocab=28, edge_vocab=4)
    tx = adam(weight_decay=args.weight_decay)
    state = create_state(model, val_b[0], tx,
                         rng=jax.random.PRNGKey(args.seed))
    log(f"params: {count_params(state.params)}")
    predict = make_module_predict(model)
    train_step, eval_step = build_steps(predict, tx)

    sched = StepLR(step_size=args.lr_step, gamma=0.5, lr=args.lr)
    rng = jax.random.PRNGKey(args.seed)
    import jax.numpy as jnp
    best_val, best_test = float("inf"), float("nan")
    start_epoch = 0
    ckpt = Checkpointer(args.ckpt_dir) if args.ckpt_dir else None
    if args.resume and ckpt is not None and ckpt.latest_step() is not None:
        last = ckpt.latest_step()
        target = {"params": state.params, "batch_stats": state.batch_stats,
                  "opt_state": state.opt_state,
                  "best_val": np.zeros((), np.float32),
                  "best_test": np.zeros((), np.float32)}
        restored = ckpt.restore(target, last)
        state = TrainState(params=restored["params"],
                           batch_stats=restored["batch_stats"],
                           opt_state=restored["opt_state"], step=state.step)
        best_val = float(restored["best_val"])
        best_test = float(restored["best_test"])
        start_epoch = last + 1
        # StepLR is a pure function of the epoch index; replay it
        for _ in range(start_epoch):
            sched.step()
        rng = jax.random.fold_in(rng, start_epoch)
        log(f"resumed from checkpoint epoch {last} "
            f"(lr {sched.lr:.2e} best_val {best_val:.4f})")
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        # accumulate the epoch loss on device: a float() per batch is a
        # host round-trip through the TPU tunnel (~5s/epoch at ZINC batch
        # counts — same fix as fit()/evaluate())
        loss_sum, n_batches = jnp.float32(0.0), 0
        for gb in mk(splits["train"], True, args.seed * 1000 + epoch):
            rng, sub = jax.random.split(rng)
            state, m = train_step(state, gb, jnp.float32(sched.lr), sub)
            loss_sum = loss_sum + m["loss"]
            n_batches += 1
        sched.step()
        val = evaluate(eval_step, state, val_b)
        if val["mae"] < best_val:
            best_val = val["mae"]
            best_test = evaluate(eval_step, state, test_b)["mae"]
        if epoch % args.log_every == 0:
            log(f"epoch {epoch} lr {sched.lr:.2e} "
                f"train {float(loss_sum) / max(n_batches, 1):.4f} "
                f"val {val['mae']:.4f} "
                f"best_test {best_test:.4f} ({time.time() - t0:.1f}s)")
        if ckpt is not None:
            ckpt.save(epoch, {"params": state.params,
                              "batch_stats": state.batch_stats,
                              "opt_state": state.opt_state,
                              "best_val": np.asarray(best_val, np.float32),
                              "best_test": np.asarray(best_test, np.float32)})
    log(f"FINAL: best_val {best_val:.4f} test-at-best-val {best_test:.4f}")
    if args.out_dir:
        import json
        os.makedirs(args.out_dir, exist_ok=True)
        with open(os.path.join(args.out_dir,
                               f"zinc_gine_s{args.seed}.json"), "w") as f:
            json.dump(dict(seed=args.seed, best_val=best_val,
                           test_at_best_val=best_test,
                           epochs=args.epochs), f, indent=2)
    return best_test


def build_parser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="data/zinc")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=310)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lr_step", type=int, default=300)
    ap.add_argument("--weight_decay", type=float, default=0.0)
    ap.add_argument("--hidden", type=int, default=110)
    ap.add_argument("--nl_signnet", type=int, default=8)
    ap.add_argument("--nl_gnn", type=int, default=6)
    ap.add_argument("--phi_gnn_type", default="MaskedGINConv",
                    choices=["MaskedGINConv", "MaskedGINEConv"])
    ap.add_argument("--synth_train", type=int, default=10000)
    ap.add_argument("--synth_eval", type=int, default=1000)
    ap.add_argument("--log_every", type=int, default=5)
    ap.add_argument("--ckpt_dir", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--out_dir", default=None)
    return ap


if __name__ == "__main__":
    run(build_parser().parse_args())
