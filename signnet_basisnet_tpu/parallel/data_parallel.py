"""Data-parallel training over a device mesh.

Batches arrive stacked along a leading microbatch axis [D, ...] and are
sharded across the 'dp' mesh axis; each device computes loss/grads on its
local padded graph batch, gradients (and BN statistics updates) are averaged
with `psum`/`pmean` over 'dp', and the optimizer update is computed
replicated.  This is the TPU-native equivalent of the DDP path the reference
never implemented (SURVEY.md §2.5).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..training import metrics as M
from ..training.optim import scale_updates
from ..training.train import TrainState, l1_graph_loss


def build_dp_steps(predict, tx, mesh: Mesh, loss_fn=l1_graph_loss):
    """Returns (train_step, eval_step) jitted over the mesh.

    train_step(state, stacked_gb, lr, rng): state replicated, stacked_gb
    sharded on its leading axis over 'dp'.
    """
    dp_axes = ("dp",) if "mp" not in mesh.axis_names else ("dp", "mp")

    def worker(state, gb_stack, lr, rng):
        # local shard has leading dim = microbatches per device; loop via scan
        # is unnecessary at 1; average over local slices with a fori-style map.
        def one(gb, rng):
            rngs = {"dropout": rng, "sign_flip": jax.random.fold_in(rng, 1)}

            def _loss(params):
                pred, updates = predict(
                    {"params": params, "batch_stats": state.batch_stats},
                    gb, True, rngs, ["batch_stats"])
                return loss_fn(pred, gb), (pred,
                                           updates.get("batch_stats",
                                                       state.batch_stats))

            (loss, (pred, bs)), grads = jax.value_and_grad(
                _loss, has_aux=True)(state.params)
            y = gb.y[:, 0] if (pred.ndim == 1 and gb.y.ndim == 2) else gb.y
            mae = M.masked_l1(pred, y, gb.graph_mask)
            return loss, mae, grads, bs

        idx = jax.lax.axis_index(dp_axes[0])
        if len(dp_axes) > 1:
            idx = idx * jax.lax.axis_size(dp_axes[1]) \
                + jax.lax.axis_index(dp_axes[1])
        rng = jax.random.fold_in(rng, idx)

        n_local = jax.tree.leaves(gb_stack)[0].shape[0]
        losses, maes = [], []
        grads_acc = None
        bs_acc = None
        for i in range(n_local):
            gb = jax.tree.map(lambda x: x[i], gb_stack)
            loss, mae, grads, bs = one(gb, jax.random.fold_in(rng, i))
            losses.append(loss); maes.append(mae)
            grads_acc = grads if grads_acc is None else jax.tree.map(
                jnp.add, grads_acc, grads)
            bs_acc = bs if bs_acc is None else jax.tree.map(jnp.add, bs_acc, bs)
        grads = jax.tree.map(lambda g: g / n_local, grads_acc)
        bs = jax.tree.map(lambda b: b / n_local, bs_acc)
        loss = jnp.mean(jnp.stack(losses))
        mae = jnp.mean(jnp.stack(maes))

        # cross-device reductions ride ICI
        grads = jax.lax.pmean(grads, dp_axes)
        bs = jax.lax.pmean(bs, dp_axes)
        loss = jax.lax.pmean(loss, dp_axes)
        mae = jax.lax.pmean(mae, dp_axes)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = scale_updates(updates, lr)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(params=new_params, batch_stats=bs,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, {"loss": loss, "mae": mae}

    shard_axes = P(*dp_axes)
    mapped = jax.shard_map(
        worker, mesh=mesh,
        in_specs=(P(), shard_axes, P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    train_step = jax.jit(mapped, donate_argnums=(0,))

    def eval_worker(state, gb_stack):
        n_local = jax.tree.leaves(gb_stack)[0].shape[0]
        tot = {"loss_sum": 0.0, "mae_sum": 0.0, "n": 0.0}
        for i in range(n_local):
            gb = jax.tree.map(lambda x: x[i], gb_stack)
            pred, _ = predict({"params": state.params,
                               "batch_stats": state.batch_stats},
                              gb, False, None, ["batch_stats"])
            loss = loss_fn(pred, gb)
            y = gb.y[:, 0] if (pred.ndim == 1 and gb.y.ndim == 2) else gb.y
            mae = M.masked_l1(pred, y, gb.graph_mask)
            n = gb.graph_mask.sum()
            tot["loss_sum"] += loss * n
            tot["mae_sum"] += mae * n
            tot["n"] += n
        return {k: jax.lax.psum(v, dp_axes) for k, v in tot.items()}

    eval_step = jax.jit(jax.shard_map(
        eval_worker, mesh=mesh,
        in_specs=(P(), shard_axes), out_specs=P(), check_vma=False))
    return train_step, eval_step
