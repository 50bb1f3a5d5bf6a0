"""Bisect why lax.scan-of-train-steps is ~5x slower than host-dispatched
flat steps (BENCH_r01/r02: scan=491k vs flat=2.5-3.7M edges/s; VERDICT r2
directive #8).

Variants timed (all = 30 sequential Adam train steps of the bench model):
  flat        : 30 host dispatches (the bench.py flat path)
  chain5      : one jit containing 5 python-chained steps, called 6 times
                -> is CHAINING inside one XLA program slow, or scan itself?
  scan_full   : lax.scan body = gather batch + split rng + train step (the
                bench.py scan path)
  scan_nogather: single batch closed over (no dynamic_index per iteration)
  scan_norng  : fixed rng key (no threefry in the loop)
Each also reports real-edges/s so the output maps onto the BENCH numbers.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_batches, BATCH_GRAPHS, HIDDEN, N_LAYERS, K, \
    SIGN_INV_LAYERS
from signnet_basisnet_tpu.graph import from_arrays
from signnet_basisnet_tpu.models import GINNet
from signnet_basisnet_tpu.training import (adam, build_steps, create_state,
                                           make_zinc_predict)

STEPS = 30

batches = build_batches()
edge_counts = [float(np.asarray(b["edge_mask"]).sum()) for b in batches]
gbs = [from_arrays(b) for b in batches]
stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *gbs)
edges_total = sum(edge_counts[i % len(gbs)] for i in range(STEPS))

model = GINNet(hidden_dim=HIDDEN, out_dim=HIDDEN, n_layers=N_LAYERS,
               pos_enc_dim=K, lap_method="sign_inv",
               sign_inv_layers=SIGN_INV_LAYERS, phi_out_dim=4,
               batch_norm=True, dropout=0.0)
tx = adam()
state0 = create_state(model, gbs[0], tx, model_kwargs={"pos_enc": gbs[0].eigvecs})
predict = make_zinc_predict(model, lap_method="sign_inv")
train_step, _ = build_steps(predict, tx, donate=False)
lr = jnp.float32(1e-3)
rng = jax.random.PRNGKey(0)


def report(name, dt):
    print(f"{name:14s} {dt * 1e3:9.2f} ms total  "
          f"{dt / STEPS * 1e3:7.3f} ms/step  "
          f"{edges_total / dt / 1e6:8.2f} M edges/s", flush=True)


def run_flat():
    st = state0
    for i in range(5):
        st, m = train_step(st, gbs[i % len(gbs)], lr, rng)
    jax.block_until_ready(m["loss"])
    best = float("inf")
    for _ in range(3):
        st = state0
        t0 = time.perf_counter()
        for i in range(STEPS):
            st, m = train_step(st, gbs[i % len(gbs)], lr, rng)
        jax.block_until_ready(m["loss"])
        best = min(best, time.perf_counter() - t0)
    report("flat", best)


def run_chain5():
    @jax.jit
    def chain(st):
        for i in range(5):
            st, m = train_step(st, gbs[i % len(gbs)], lr, rng)
        return st, m
    st, m = chain(state0)
    jax.block_until_ready(m["loss"])
    best = float("inf")
    for _ in range(3):
        st = state0
        t0 = time.perf_counter()
        for _ in range(STEPS // 5):
            st, m = chain(st)
        jax.block_until_ready(m["loss"])
        best = min(best, time.perf_counter() - t0)
    report("chain5", best)


def _scan_variant(name, gather=True, use_rng=True):
    @jax.jit
    def run_steps(st, batch_idx, key):
        def body(carry, i):
            st, key = carry
            if use_rng:
                key, sub = jax.random.split(key)
            else:
                sub = key
            if gather:
                gb = jax.tree.map(
                    lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, False),
                    stacked)
            else:
                gb = gbs[0]
            st, m = train_step(st, gb, lr, sub)
            return (st, key), m["loss"]
        (st, _), losses = jax.lax.scan(body, (st, key), batch_idx)
        return st, losses

    idx = jnp.arange(STEPS, dtype=jnp.int32) % len(gbs)
    st, losses = run_steps(state0, idx, rng)
    jax.block_until_ready(losses)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        st, losses = run_steps(state0, idx, rng)
        jax.block_until_ready(losses)
        best = min(best, time.perf_counter() - t0)
    report(name, best)


run_flat()
run_chain5()
_scan_variant("scan_full", gather=True, use_rng=True)
_scan_variant("scan_nogather", gather=False, use_rng=True)
_scan_variant("scan_norng", gather=True, use_rng=False)
print("SCAN_PROBE_DONE")
