"""r5 interlude B: measure the tile_dense backend on the chip.

Runs the bench.py scan harness for {tile (r4 default), tile_dense,
tile_dense_bf16} and prints one line each, plus a short profiler re-trace
of tile_dense_bf16 to confirm the per-layer adjacency rebuild time is gone
(r5 trace showed _spmm_tiled_raw at 59-62% of step time).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import bench

    tiled = bench.build_batches(tile=bench.TILE)
    results = {}
    for name, kw in [
        ("tile_bf16", dict(compute_dtype=jnp.bfloat16,
                           agg_backend="pallas_tile")),
        ("tile_dense", dict(agg_backend="tile_dense")),
        ("tile_dense_bf16", dict(compute_dtype=jnp.bfloat16,
                                 agg_backend="tile_dense")),
    ]:
        try:
            eps = bench.bench_tpu_scan(tiled, **kw)
        except Exception as err:
            print(f"# {name} FAILED: {err}")
            eps = 0.0
        results[name] = round(eps, 1)
        print(json.dumps({"mode": name, "edges_per_s": round(eps, 1)}),
              flush=True)
    with open("/root/repo/results/r5/bench_tile_dense.json", "w") as f:
        json.dump(results, f, indent=1)

    # re-trace the winner for the op table
    from signnet_basisnet_tpu.graph import segment as seg, from_arrays
    from signnet_basisnet_tpu.models import GINNet
    from signnet_basisnet_tpu.training import (adam, build_steps,
                                               create_state,
                                               make_zinc_predict)
    seg.set_agg_backend("tile_dense")
    edge_counts = [float(np.asarray(b["edge_mask"]).sum()) for b in tiled]
    gbs = [from_arrays(b) for b in tiled]
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
                                compute_dtype=jnp.bfloat16)
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
    state, losses = run_steps(state, idx, rng)
    float(jax.device_get(losses.sum()))
    tdir = "/root/repo/results/r5/trace_tile_dense_bf16"
    os.makedirs(tdir, exist_ok=True)
    jax.profiler.start_trace(tdir)
    t0 = time.perf_counter()
    state, losses = run_steps(state, idx, rng)
    val = float(jax.device_get(losses.sum()))
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    edges = sum(edge_counts[i % len(gbs)] for i in range(STEPS))
    print(f"TRACE tile_dense_bf16: {STEPS} steps in {dt*1e3:.1f} ms "
          f"({dt/STEPS*1e3:.2f} ms/step, {edges/dt:.0f} edges/s, "
          f"loss_sum {val:.4f}) -> {tdir}")
    print("INTERLUDE_B_DONE")


if __name__ == "__main__":
    main()
