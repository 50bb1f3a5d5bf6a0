"""r5 interlude C (runs at the head of queue phase B):

1. Re-measure tile_dense{,_bf16} after the ellipsis-einsum change (phi
   features ride unflattened).
2. VERDICT r4 weak #7: bound the mp machinery's intrinsic cost ON THE
   REAL CHIP.  Real >=2-chip ICI is hardware-blocked, but the mp=1
   configuration runs the ENTIRE halo code path — partition_batch_mp
   layout, shard_map wrapper, augmented-index plumbing, the all_to_all
   (degenerate 1-device axis), psum'd BN/pool — on one chip, so
   (mp=1 halo step) - (plain step) is a direct measurement of the
   sharding machinery's overhead, not an extrapolation.  Both sides are
   timed identically (flat dispatch, value-fetch barrier, best-of-3).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def bench_modes():
    import jax.numpy as jnp
    import bench
    tiled = bench.build_batches(tile=bench.TILE)
    out = {}
    for name, kw in [
        ("tile_dense", dict(agg_backend="tile_dense")),
        ("tile_dense_bf16", dict(compute_dtype=jnp.bfloat16,
                                 agg_backend="tile_dense")),
    ]:
        eps = bench.bench_tpu_scan(tiled, **kw)
        out[name] = round(eps, 1)
        print(json.dumps({"mode": name + "_v2", "edges_per_s": round(eps, 1)}),
              flush=True)
    with open("/root/repo/results/r5/bench_tile_dense_v2.json", "w") as f:
        json.dump(out, f, indent=1)


def mp1_overhead():
    import jax
    import jax.numpy as jnp
    import bench
    from signnet_basisnet_tpu.graph import from_arrays
    from signnet_basisnet_tpu.models import GINNet
    from signnet_basisnet_tpu.parallel import (build_mp_steps,
                                               device_arrays_mp, make_mesh,
                                               partition_batch_mp)
    from signnet_basisnet_tpu.training import (adam, build_steps,
                                               create_state,
                                               make_zinc_predict)

    batches = bench.build_batches()           # plain (non-tiled) layout
    edge_counts = [float(np.asarray(b["edge_mask"]).sum()) for b in batches]
    gbs = [from_arrays(b) for b in batches]
    model = GINNet(hidden_dim=bench.HIDDEN, out_dim=bench.HIDDEN,
                   n_layers=bench.N_LAYERS, pos_enc_dim=bench.K,
                   lap_method="sign_inv",
                   sign_inv_layers=bench.SIGN_INV_LAYERS, phi_out_dim=4,
                   batch_norm=True, dropout=0.0)
    tx = adam()
    state = create_state(model, gbs[0], tx,
                         model_kwargs={"pos_enc": gbs[0].eigvecs})
    predict = make_zinc_predict(model, lap_method="sign_inv")
    lr = jnp.float32(1e-3)
    rng = jax.random.PRNGKey(0)
    STEPS = 20

    def time_steps(step_fn, batches_dev, st):
        for i in range(4):
            st, m = step_fn(st, batches_dev[i % len(batches_dev)], lr, rng)
        float(jax.device_get(m["loss"]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(STEPS):
                st, m = step_fn(st, batches_dev[i % len(batches_dev)], lr,
                                rng)
            float(jax.device_get(m["loss"]))
            best = min(best, time.perf_counter() - t0)
        return best / STEPS

    plain_step, _ = build_steps(predict, tx, donate=False)
    t_plain = time_steps(plain_step, gbs, state)

    mesh = make_mesh(dp=1, mp=1, devices=jax.devices()[:1])
    parts = [jax.tree.map(jnp.asarray,
                          device_arrays_mp(partition_batch_mp(b, 1)))
             for b in batches]
    mp_train, _ = build_mp_steps(predict, tx, mesh)
    state2 = create_state(model, gbs[0], tx,
                          model_kwargs={"pos_enc": gbs[0].eigvecs})
    t_mp = time_steps(mp_train, parts, state2)

    edges = float(np.mean(edge_counts))
    res = {
        "plain_step_ms": round(t_plain * 1e3, 3),
        "mp1_halo_step_ms": round(t_mp * 1e3, 3),
        "overhead_ms": round((t_mp - t_plain) * 1e3, 3),
        "overhead_pct": round(100 * (t_mp - t_plain) / t_plain, 2),
        "edges_per_batch": edges,
    }
    print(json.dumps({"mp1_overhead": res}), flush=True)
    with open("/root/repo/results/r5/mp1_overhead.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    bench_modes()
    mp1_overhead()
    print("INTERLUDE_C_DONE")
