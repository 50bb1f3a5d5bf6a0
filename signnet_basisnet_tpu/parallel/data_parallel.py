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
        # local shard has leading dim = microbatches per device; accumulated
        # with lax.scan so compile time stays flat in n_local (a Python
        # unroll would duplicate the whole fwd+bwd graph per microbatch)
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

        if n_local == 1:
            # one microbatch per device (the common case): skip the scan —
            # a length-1 lax.scan wraps the whole fwd+bwd in a while loop,
            # which blocks XLA fusion across the loop boundary and costs
            # real runtime (VERDICT r2 #8)
            gb = jax.tree.map(lambda x: x[0], gb_stack)
            loss, mae, grads, bs = one(gb, jax.random.fold_in(rng, 0))
        else:
            def body(carry, inp):
                i, gb = inp
                loss_i, mae_i, grads_i, bs_i = one(
                    gb, jax.random.fold_in(rng, i))
                g_acc, b_acc, l_acc, m_acc = carry
                return (jax.tree.map(jnp.add, g_acc, grads_i),
                        jax.tree.map(jnp.add, b_acc, bs_i),
                        l_acc + loss_i, m_acc + mae_i), None

            init = (jax.tree.map(jnp.zeros_like, state.params),
                    jax.tree.map(jnp.zeros_like, state.batch_stats),
                    jnp.zeros(()), jnp.zeros(()))
            (grads_acc, bs_acc, loss_sum, mae_sum), _ = jax.lax.scan(
                body, init, (jnp.arange(n_local), gb_stack))
            grads = jax.tree.map(lambda g: g / n_local, grads_acc)
            bs = jax.tree.map(lambda b: b / n_local, bs_acc)
            loss = loss_sum / n_local
            mae = mae_sum / n_local

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
        def body(carry, gb):
            pred, _ = predict({"params": state.params,
                               "batch_stats": state.batch_stats},
                              gb, False, None, ["batch_stats"])
            loss = loss_fn(pred, gb)
            y = gb.y[:, 0] if (pred.ndim == 1 and gb.y.ndim == 2) else gb.y
            mae = M.masked_l1(pred, y, gb.graph_mask)
            n = gb.graph_mask.sum()
            return {"loss_sum": carry["loss_sum"] + loss * n,
                    "mae_sum": carry["mae_sum"] + mae * n,
                    "n": carry["n"] + n}, None

        init = {k: jnp.zeros(()) for k in ("loss_sum", "mae_sum", "n")}
        tot, _ = jax.lax.scan(body, init, gb_stack)
        return {k: jax.lax.psum(v, dp_axes) for k, v in tot.items()}

    eval_step = jax.jit(jax.shard_map(
        eval_worker, mesh=mesh,
        in_specs=(P(), shard_axes), out_specs=P(), check_vma=False))
    return train_step, eval_step
