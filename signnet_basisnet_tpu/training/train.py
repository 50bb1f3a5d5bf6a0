"""Training harness: jitted train/eval steps + epoch driver.

One harness serves all four reference workloads (SURVEY.md §1 L6): the model
forward is abstracted as ``predict(variables, gb, training, rngs)`` returning
per-graph scores; loss is masked L1 (ZINC/Alchemy) with pluggable
alternatives.  The LR is a runtime scalar input so the host-side plateau
scheduler never retriggers compilation; train/eval share one compiled step
per batch shape.
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import metrics as M
from .optim import ReduceLROnPlateau, StepLR, adam, scale_updates


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def count_params(params) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))


def create_state(model, example_gb, tx, rng=None, model_kwargs=None
                 ) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    # jit the whole init: one compiled program instead of per-op eager
    # dispatch (critical on remote/tunneled TPU backends)
    init_fn = jax.jit(partial(model.init, training=False))
    variables = init_fn({"params": rng}, example_gb, **(model_kwargs or {}))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def l1_graph_loss(pred, gb):
    y = gb.y
    if pred.ndim == 1 and y.ndim == 2:
        y = y[:, 0]
    return M.masked_l1(pred, y, gb.graph_mask)


def _cast_floats(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def make_zinc_predict(model, lap_method: str = "none", return_p: bool = False,
                      compute_dtype=None):
    """predict() for the DGL-style nets: applies the PE sign-handling then
    the net (reference: train/train_ZINC_graph_regression.py:54-88).
    `return_p=True` also returns the LSPE positional channel for the
    Laplacian-eigvec auxiliary loss (reference: gin_net.py:140-174).

    ``compute_dtype`` (e.g. jnp.bfloat16) runs the forward in reduced
    precision on the MXU while the master params / optimizer / loss stay
    f32 — the TPU mixed-precision training mode (opt-in; the parity-default
    is f32)."""
    from ..models.pe import apply_lap_method

    def predict(variables, gb, training, rngs, mutable):
        pos_enc = gb.eigvecs
        if pos_enc is not None and lap_method not in ("none",):
            rng = rngs.get("sign_flip") if rngs else None
            if lap_method == "sign_flip" and rng is None:
                # no rng supplied (e.g. DP eval path): identity signs; the
                # reference flips at eval too — pass an eval rng to replicate
                # (build_steps eval_step accepts one; PARITY.md "sign_flip")
                pass
            else:
                pos_enc = apply_lap_method(lap_method, gb, pos_enc, rng=rng)
        kwargs = {"return_p": True} if return_p else {}
        if compute_dtype is not None:
            variables = {**variables,
                         "params": _cast_floats(variables["params"],
                                                compute_dtype)}
            pos_enc = (pos_enc.astype(compute_dtype)
                       if pos_enc is not None else None)
            gb = _cast_floats(gb, compute_dtype)
        out = model.apply(variables, gb, pos_enc, training=training,
                          rngs=rngs, mutable=mutable, **kwargs)
        if compute_dtype is not None:
            pred, updates = out
            out = (_cast_floats(pred, jnp.float32),
                   _cast_floats(updates, jnp.float32))
        return out

    return predict


def make_lapeig_loss_fn(alpha: float, lam: float, k: int):
    """loss = L1 + alpha * (tr(p^T L p) + lambda ||P^T P - I||_F^2)
    / (k * batch_size * n) — the LSPE auxiliary loss (reference:
    gatedgcn_net.py:155-180, gin_net.py:140-174)."""
    from ..models.zinc_models import lapeig_loss

    def loss_fn(pred, gb):
        score, p = pred
        base = l1_graph_loss(score, gb)
        tr, ortho = lapeig_loss(gb, p)
        denom = k * gb.graph_mask.sum() * gb.node_mask.sum()
        return base + alpha * (tr + lam * ortho) / jnp.maximum(denom, 1.0)

    return loss_fn


def make_module_predict(model):
    """predict() for modules whose __call__ is (gb, training=...)."""
    def predict(variables, gb, training, rngs, mutable):
        return model.apply(variables, gb, training=training, rngs=rngs,
                           mutable=mutable)
    return predict


def build_steps(predict, tx, loss_fn=l1_graph_loss, donate: bool = True,
                eval_bn_mode: str = "running"):
    """Returns jitted (train_step, eval_step).

    eval_bn_mode:
      "running" (default) — eval normalizes with BN running statistics,
        the torch `model.eval()` semantics of every reference protocol.
      "batch" — eval normalizes with the eval batch's own statistics
        (torch `track_running_stats=False` semantics, which the
        reference's LearningFilters models use — models.py:18-56).  Robust
        to the BN dead-channel revival pathology (RESULTS.md r3): a
        channel that is identically zero on training data has running
        var = 0, and a rare eval graph activating it explodes
        running-stats eval by 1/sqrt(eps); batch stats cannot mismatch
        the batch.  Stat updates are discarded; dropout stays off.
    """
    if eval_bn_mode not in ("running", "batch"):
        raise ValueError(eval_bn_mode)

    def train_step(state: TrainState, gb, lr, rng):
        rngs = {"dropout": rng, "sign_flip": jax.random.fold_in(rng, 1)}

        def _loss(params):
            (pred, updates) = predict(
                {"params": params, "batch_stats": state.batch_stats},
                gb, True, rngs, ["batch_stats"])
            loss = loss_fn(pred, gb)
            return loss, (pred, updates.get("batch_stats", state.batch_stats))

        (loss, (pred, new_bs)), grads = jax.value_and_grad(
            _loss, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = scale_updates(updates, lr)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        score = pred[0] if isinstance(pred, tuple) else pred
        y = gb.y[:, 0] if (score.ndim == 1 and gb.y.ndim == 2) else gb.y
        mae = M.masked_l1(score, y, gb.graph_mask)
        new_state = TrainState(params=new_params, batch_stats=new_bs,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, {"loss": loss, "mae": mae}

    def eval_step(state: TrainState, gb, rng=None):
        # optional rng: the reference applies random eigvec sign flips during
        # evaluation as well (handle_lap is called from
        # evaluate_network_sparse, train_ZINC_graph_regression.py:110);
        # passing an rng here replicates that, omitting it gives the
        # deterministic identity-sign eval (both documented in PARITY.md)
        rngs = None if rng is None else {"sign_flip": rng}
        if eval_bn_mode == "batch":
            # batch-stats eval: training=True forward, stat updates
            # discarded.  NOTE: modules gate dropout on the same flag, so
            # this mode assumes dropout=0 configs (all reference ZINC
            # sign-inv configs are); an inert dropout rng is supplied.
            rngs = dict(rngs or {})
            rngs.setdefault("dropout", jax.random.PRNGKey(0))
            pred, _ = predict({"params": state.params,
                               "batch_stats": state.batch_stats},
                              gb, True, rngs, ["batch_stats"])
        else:
            pred, _ = predict({"params": state.params,
                               "batch_stats": state.batch_stats},
                              gb, False, rngs, ["batch_stats"])
        loss = loss_fn(pred, gb)
        score = pred[0] if isinstance(pred, tuple) else pred
        y = gb.y[:, 0] if (score.ndim == 1 and gb.y.ndim == 2) else gb.y
        mae = M.masked_l1(score, y, gb.graph_mask)
        n = gb.graph_mask.sum()
        return {"loss_sum": loss * n, "mae_sum": mae * n, "n": n}

    donate_args = (0,) if donate else ()
    return (jax.jit(train_step, donate_argnums=donate_args),
            jax.jit(eval_step))


@dataclass
class FitResult:
    state: TrainState
    history: list
    test_mae: float
    val_mae: float
    epochs_run: int
    wall_time: float
    # metrics at the best-val-loss epoch (always tracked): robust to
    # late-training eval corruption — a BN dead channel revived by an
    # off-distribution eval graph can blow up running-stats eval
    # (RESULTS.md r3 val-spike post-mortem), and such an epoch is by
    # construction never best-val.  best_val_mae is the plain val MAE at
    # that epoch (NOT the selection loss, which may carry auxiliary terms);
    # best_val_test_mae is the test MAE there (needs a test set).
    best_val_mae: float = float("nan")
    best_val_test_mae: float = float("nan")


def evaluate(eval_step, state, batches, rng=None) -> Dict[str, float]:
    # Accumulate per-batch metric arrays on device and fetch ONCE at the end:
    # a per-batch float() would force a host sync (a full round-trip on a
    # tunneled TPU) and serialize dispatch against compute.
    outs = []
    for gb in batches:
        if rng is not None:
            rng, sub = jax.random.split(rng)
            outs.append(eval_step(state, gb, sub))
        else:
            outs.append(eval_step(state, gb))
    tot = {"loss_sum": 0.0, "mae_sum": 0.0, "n": 0.0}
    for out in jax.device_get(outs):
        for k in tot:
            tot[k] += float(out[k])
    n = max(tot["n"], 1.0)
    return {"loss": tot["loss_sum"] / n, "mae": tot["mae_sum"] / n}


def fit(state, train_step, eval_step, train_batches_fn, val_batches_fn,
        test_batches_fn=None, *, epochs=1000, init_lr=1e-3,
        lr_reduce_factor=0.5, lr_schedule_patience=25, min_lr=1e-6,
        max_time_hours=12.0, seed=0, log_every=5, logger=None,
        checkpointer=None, best_val_test: bool = False,
        resume: bool = False, eval_sign_flip: bool = False) -> FitResult:
    """Epoch driver with plateau LR, min-lr stop, wall-clock budget and
    graceful KeyboardInterrupt — the reference pipeline's control flow
    (reference: GraphPrediction/main_ZINC_graph_regression.py:171-252).

    `best_val_test=True` reports the test metric from the best-val epoch
    (the Alchemy protocol, reference: Alchemy/main_alchemy.py:129-139)
    instead of the final model's (the ZINC protocol).

    `eval_sign_flip=True` threads a fresh rng into every eval step so the
    sign_flip PE method randomizes signs during evaluation too — the
    reference's behavior (handle_lap called from evaluate_network_sparse,
    train_ZINC_graph_regression.py:110)."""
    sched = ReduceLROnPlateau(factor=lr_reduce_factor,
                              patience=lr_schedule_patience,
                              min_lr=min_lr, lr=init_lr)
    rng = jax.random.PRNGKey(seed)
    erng = jax.random.PRNGKey(seed + 10007) if eval_sign_flip else None
    history = []
    t0 = time.time()
    epochs_run = 0
    start_epoch = 0
    best_val = float("inf")
    best_val_mae = float("nan")
    best_test = float("nan")
    log = logger or (lambda msg: print(msg, flush=True))
    if resume and checkpointer is not None:
        last = checkpointer.latest_step()
        if last is not None:
            target = {"params": state.params,
                      "batch_stats": state.batch_stats,
                      "opt_state": state.opt_state, "lr": sched.lr}
            restored = checkpointer.restore(target, last)
            state = TrainState(params=restored["params"],
                               batch_stats=restored["batch_stats"],
                               opt_state=restored["opt_state"],
                               step=state.step)
            sched.lr = float(restored.get("lr", sched.lr))
            start_epoch = last + 1
            rng = jax.random.fold_in(rng, start_epoch)
            log(f"resumed from checkpoint epoch {last} (lr {sched.lr:.2e})")
    try:
        for epoch in range(start_epoch, epochs):
            te0 = time.time()
            # keep the whole epoch's step dispatch asynchronous: metrics stay
            # on device (tiny scalars) and are fetched in one transfer at the
            # end of the epoch — a per-batch float() costs a full host<->TPU
            # round-trip and was the dominant epoch cost on tunneled chips
            ms = []
            for gb in train_batches_fn(epoch):
                rng, sub = jax.random.split(rng)
                state, m = train_step(state, gb, sched.lr, sub)
                ms.append(m)
            nb = len(ms)
            ms = jax.device_get(ms)
            train_loss = sum(float(m["loss"]) for m in ms) / max(nb, 1)
            train_mae = sum(float(m["mae"]) for m in ms) / max(nb, 1)
            if not np.isfinite(train_loss):
                # failure detection the reference lacks (SURVEY.md §5): a
                # non-finite loss poisons Adam state — stop with a clear
                # message instead of silently training on NaNs
                log(f"ABORT: non-finite train loss at epoch {epoch}; "
                    f"stopping (restore a checkpoint to resume)")
                break
            if erng is not None:
                erng, e1, e2 = jax.random.split(erng, 3)
            else:
                e1 = e2 = None
            val = evaluate(eval_step, state, val_batches_fn(), rng=e1)
            if val["loss"] <= best_val:
                best_val = val["loss"]
                # the selection criterion is val loss (may include auxiliary
                # terms, e.g. LSPE lapeig); report the plain val MAE at that
                # epoch so the FINAL_BEST_VAL log line is a true MAE
                best_val_mae = val["mae"]
                if test_batches_fn is not None:
                    best_test = evaluate(eval_step, state, test_batches_fn(),
                                         rng=e2)["mae"]
            lr_now = sched.step(val["loss"])
            epochs_run = epoch + 1
            rec = dict(epoch=epoch, lr=lr_now, train_loss=train_loss,
                       train_mae=train_mae, val_loss=val["loss"],
                       val_mae=val["mae"], time=time.time() - te0)
            history.append(rec)
            if epoch % log_every == 0:
                from ..utils.profiling import device_memory_stats
                mem = device_memory_stats()
                mem_s = (f" peak_mem {mem['peak_mb_in_use']:.0f}MB"
                         if "peak_mb_in_use" in mem else "")
                log(f"epoch {epoch:4d} lr {lr_now:.2e} "
                    f"train_mae {train_mae:.4f} val_mae {val['mae']:.4f} "
                    f"({rec['time']:.1f}s){mem_s}")
            if checkpointer is not None:
                checkpointer.save(epoch, {"params": state.params,
                                          "batch_stats": state.batch_stats,
                                          "opt_state": state.opt_state,
                                          "lr": sched.lr})
            if sched.converged:
                log("converged: lr <= min_lr")
                break
            if (time.time() - t0) > max_time_hours * 3600:
                log("stopping: max_time reached")
                break
    except KeyboardInterrupt:
        log("interrupted: finishing with final eval")

    if erng is not None:
        erng, e1, e2 = jax.random.split(erng, 3)
    else:
        e1 = e2 = None
    val = evaluate(eval_step, state, val_batches_fn(), rng=e1)
    test = (evaluate(eval_step, state, test_batches_fn(), rng=e2)
            if test_batches_fn else {"mae": float("nan")})
    test_mae = best_test if best_val_test else test["mae"]
    return FitResult(state=state, history=history, test_mae=test_mae,
                     val_mae=val["mae"], epochs_run=epochs_run,
                     wall_time=time.time() - t0,
                     best_val_mae=best_val_mae, best_val_test_mae=best_test)


# ---------------------------------------------------------------------------
# k-fold cross-validation (reference: GINESignNetPyG/core/train.py:81-179,
# split util :210-221)
# ---------------------------------------------------------------------------

def k_fold_split(n: int, k: int = 10, seed: int = 0):
    """Shuffled k-fold index split: list of (train_idx, test_idx) pairs."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    folds = np.array_split(perm, k)
    out = []
    for i in range(k):
        test_idx = folds[i]
        train_idx = np.concatenate([folds[j] for j in range(k) if j != i])
        out.append((train_idx, test_idx))
    return out


@dataclass
class KFoldResult:
    fold_best: list          # best metric per fold
    mean: float
    std: float
    curve_mean: float        # metric at the best epoch of the averaged curve
    curve_std: float
    best_epoch: int


def run_k_fold(graphs, make_state_and_steps, make_batches, *, k=10,
               epochs=100, init_lr=1e-3, lr_decay=0.5, lr_patience=50,
               seed=0, higher_is_better=False, logger=None) -> KFoldResult:
    """Generic k-fold driver.

    `make_state_and_steps(fold_seed)` -> (state, train_step, eval_step);
    `make_batches(graph_subset, shuffle_seed_or_None)` -> iterable of batches.
    Reports both reference aggregations: mean of per-fold best metrics, and
    the best epoch of the fold-averaged metric curve
    (reference: core/train.py:150-179).
    """
    log = logger or (lambda msg: print(msg, flush=True))
    curves = []
    fold_best = []
    sign = 1.0 if higher_is_better else -1.0
    for fold, (tr_idx, te_idx) in enumerate(k_fold_split(len(graphs), k, seed)):
        train_graphs = [graphs[i] for i in tr_idx]
        test_graphs = [graphs[i] for i in te_idx]
        state, train_step, eval_step = make_state_and_steps(fold)
        sched = StepLR(step_size=lr_patience, gamma=lr_decay, lr=init_lr)
        rng = jax.random.PRNGKey(seed + fold)
        curve = []
        best = -np.inf
        for epoch in range(epochs):
            for gb in make_batches(train_graphs, epoch):
                rng, sub = jax.random.split(rng)
                state, _ = train_step(state, gb, sched.lr, sub)
            sched.step()
            perf = evaluate(eval_step, state,
                            make_batches(test_graphs, None))["mae"]
            curve.append(perf)
            best = max(best, sign * perf)
        fold_best.append(sign * best)
        curves.append(curve)
        log(f"fold {fold}: best {sign * best:.4f}")
    curves = np.asarray(curves)            # [k, epochs]
    avg = curves.mean(axis=0)
    best_idx = int((sign * avg).argmax())
    fb = np.asarray(fold_best)
    return KFoldResult(fold_best=list(map(float, fb)),
                       mean=float(fb.mean()), std=float(fb.std()),
                       curve_mean=float(avg[best_idx]),
                       curve_std=float(curves.std(axis=0)[best_idx]),
                       best_epoch=best_idx)
