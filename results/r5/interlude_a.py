"""r5 interlude A (chip-free window between queue_c and queue_r5a):

1. Pin the torch-CPU baseline (VERDICT r4 weak #3 / directive 7): one
   controlled measurement — idle host (no live chip run), pinned thread
   count, best-of-5 over 4-step windows — written to BASELINE_TORCH.json
   with its measurement conditions.  bench.py then REUSES this number as
   the denominator and reports fresh re-measurements only as a drift check.

2. Capture a real jax.profiler trace of the flagship GIN+SignNet train
   step (VERDICT r4 weak #2 / directive 4) in the headline mode
   (tile + bf16) and the f32 tile mode, 12 scanned steps each, so the
   per-op time breakdown inside the 12.2 ms step is measured, not asserted.
   Raw xplane.pb files land under results/r5/trace_{tile_bf16,tile}/ ;
   conversion to an op table happens in profile_report.py (host-side, no
   chip needed).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def pin_torch_baseline():
    import torch
    import bench

    torch.set_num_threads(2)
    batches = bench.build_batches()
    best = 0.0
    runs = []
    for _ in range(5):
        eps = bench.bench_torch_cpu(batches, steps=4)
        runs.append(round(eps, 1))
        best = max(best, eps)
    out = {
        "torch_cpu_baseline_eps": round(best, 1),
        "runs": runs,
        "conditions": {
            "date": "2026-08-21",
            "host": "2-vCPU axon host, no concurrent chip run "
                    "(queue paused), torch.set_num_threads(2)",
            "workload": "bench.bench_torch_cpu: architecture-matched "
                        "GIN+SignNet train step, scatter_add message "
                        "passing, batch 128, best-of-5 x 4 steps",
        },
    }
    with open("/root/repo/BASELINE_TORCH.json", "w") as f:
        json.dump(out, f, indent=1)
    print("PINNED torch baseline:", out["torch_cpu_baseline_eps"],
          "runs:", runs)


def trace_step(mode):
    import jax
    import jax.numpy as jnp
    import bench
    from signnet_basisnet_tpu.graph import segment as seg, from_arrays
    from signnet_basisnet_tpu.models import GINNet
    from signnet_basisnet_tpu.training import (adam, build_steps,
                                               create_state,
                                               make_zinc_predict)

    tile = bench.TILE
    batches = bench.build_batches(tile=tile)
    cdtype = jnp.bfloat16 if mode == "tile_bf16" else None
    seg.set_agg_backend("pallas_tile")

    edge_counts = [float(np.asarray(b["edge_mask"]).sum()) for b in batches]
    gbs = [from_arrays(b) for b in batches]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *gbs)
    model = GINNet(hidden_dim=bench.HIDDEN, out_dim=bench.HIDDEN,
                   n_layers=bench.N_LAYERS, pos_enc_dim=bench.K,
                   lap_method="sign_inv",
                   sign_inv_layers=bench.SIGN_INV_LAYERS, phi_out_dim=4,
                   batch_norm=True, dropout=0.0)
    tx = adam()
    state = create_state(model, gbs[0], tx,
                         model_kwargs={"pos_enc": gbs[0].eigvecs})
    predict = make_zinc_predict(model, lap_method="sign_inv",
                                compute_dtype=cdtype)
    train_step, _ = build_steps(predict, tx, donate=False)
    lr = jnp.float32(1e-3)

    STEPS = 12

    @jax.jit
    def run_steps(state, batch_idx, rng):
        def body(carry, i):
            st, key = carry
            key, sub = jax.random.split(key)
            gb = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, False),
                stacked)
            st, m = train_step(st, gb, lr, sub)
            return (st, key), m["loss"]
        (state, _), losses = jax.lax.scan(body, (state, rng), batch_idx)
        return state, losses

    idx = jnp.arange(STEPS, dtype=jnp.int32) % len(gbs)
    rng = jax.random.PRNGKey(0)
    state, losses = run_steps(state, idx, rng)   # compile + warmup
    float(jax.device_get(losses.sum()))

    tdir = f"/root/repo/results/r5/trace_{mode}"
    os.makedirs(tdir, exist_ok=True)
    jax.profiler.start_trace(tdir)
    t0 = time.perf_counter()
    state, losses = run_steps(state, idx, rng)
    val = float(jax.device_get(losses.sum()))
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    edges = sum(edge_counts[i % len(gbs)] for i in range(STEPS))
    print(f"TRACE {mode}: {STEPS} steps in {dt*1e3:.1f} ms "
          f"({dt/STEPS*1e3:.2f} ms/step, {edges/dt:.0f} edges/s, "
          f"loss_sum {val:.4f}) -> {tdir}")
    seg.set_agg_backend("xla")


if __name__ == "__main__":
    pin_torch_baseline()
    for mode in ("tile_bf16", "tile"):
        trace_step(mode)
    print("INTERLUDE_A_DONE")
