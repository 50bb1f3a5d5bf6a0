"""Weak-scaling measurement on the virtual CPU mesh (VERDICT r1 #6).

Runs the full SignNetGNN DP train step at dp = 1/2/4/8 with a FIXED
per-device microbatch (weak scaling) for both multi-device schemes:

- shard_map data parallelism (parallel/data_parallel.build_dp_steps)
- GSPMD/pjit batch sharding (parallel/gspmd.build_gspmd_steps)

and prints steps/s + efficiency vs dp=1.  Run with

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py

CAVEAT (stated in RESULTS.md): this host has 2 physical cores, so the 8
"devices" time-share 2 cores — the numbers measure sharding-induced overhead
(collective scheduling, partitioned compilation), NOT ICI scaling.  Real
multi-host efficiency remains blocked on hardware; per-step collective
volume is the psum of grads (fixed, model-size) so the expected TPU-ICI
efficiency at this model size is >95%.
"""
import os
import sys
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp


def make_graphs(seed, count):
    from signnet_basisnet_tpu import spectral
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(count):
        n = int(rng.integers(9, 30))
        # molecule-like sparsity: ~3 edges/node (ZINC averages ~2.1)
        A = np.triu((rng.random((n, n)) < 3.0 / n).astype(int), 1)
        A = A + A.T
        s, r = np.nonzero(A)
        vals, vecs = spectral.full_evd_np(s, r, n)
        graphs.append(dict(senders=s, receivers=r,
                           node_feat=rng.integers(0, 28, n),
                           edge_feat=rng.integers(0, 4, len(s)),
                           y=np.array([float(rng.normal())], np.float32),
                           eigvals=vals, eigvecs=vecs))
    return graphs


GRAPHS_PER_MICRO = 15
MICRO_NODES, MICRO_EDGES = 512, 2048


def make_micro(seed):
    from signnet_basisnet_tpu.graph import batch_np
    return batch_np(make_graphs(seed, GRAPHS_PER_MICRO),
                    num_nodes=MICRO_NODES, num_edges=MICRO_EDGES,
                    num_graphs=GRAPHS_PER_MICRO + 1, k=8)


def make_global(dp):
    """GSPMD global batch = dp microbatches' worth of graphs in one padded
    batch with dp-times the budgets."""
    from signnet_basisnet_tpu.graph import batch_np
    graphs = []
    for i in range(dp):
        graphs += make_graphs(i, GRAPHS_PER_MICRO)
    return batch_np(graphs, num_nodes=MICRO_NODES * dp,
                    num_edges=MICRO_EDGES * dp,
                    num_graphs=GRAPHS_PER_MICRO * dp + dp, k=8)


def bench(step_fn, state, gbs, reps=10):
    """Times a train step, threading the (possibly donated) state through."""
    state, m = step_fn(state, gbs)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = step_fn(state, gbs)
    jax.block_until_ready(m)
    return (time.perf_counter() - t0) / reps


def main():
    from signnet_basisnet_tpu.data.batcher import stack_microbatches
    from signnet_basisnet_tpu.graph import from_arrays
    from signnet_basisnet_tpu.models import SignNetGNN
    from signnet_basisnet_tpu.parallel import (build_dp_steps,
                                               build_gspmd_steps, make_mesh)
    from signnet_basisnet_tpu.training import (adam, create_state,
                                               make_module_predict)

    model = SignNetGNN(n_hid=32, n_out=1, nl_signnet=4, nl_gnn=8, nl_rho=2)
    tx = adam()
    predict = make_module_predict(model)
    devices = jax.devices()
    micro = [make_micro(i) for i in range(8)]
    results = {"shard_map": {}, "gspmd": {}}

    for dp in (1, 2, 4, 8):
        if dp > len(devices):
            break
        mesh = make_mesh(dp=dp, mp=1, devices=devices[:dp])
        stacked = stack_microbatches(micro[:dp])
        gbs = jax.tree.map(jnp.asarray, from_arrays(stacked))
        gb0 = jax.tree.map(lambda x: x[0], gbs)
        state = create_state(model, gb0, tx)
        train_step, _ = build_dp_steps(predict, tx, mesh)
        t = bench(lambda s, g: train_step(s, g, jnp.float32(1e-3),
                                          jax.random.PRNGKey(0)),
                  state, gbs)
        results["shard_map"][dp] = t
        print(f"shard_map dp={dp}: {t * 1e3:8.1f} ms/step "
              f"({dp / t:.2f} microbatches/s)")

    for dp in (1, 2, 4, 8):
        if dp > len(devices):
            break
        mesh = make_mesh(dp=dp, mp=1, devices=devices[:dp])
        gb = jax.tree.map(jnp.asarray, from_arrays(make_global(dp)))
        state = create_state(model, gb, tx)
        train_step, _ = build_gspmd_steps(predict, tx, mesh, gb, axis="dp")
        t = bench(lambda s, g: train_step(s, g, jnp.float32(1e-3),
                                          jax.random.PRNGKey(0)),
                  state, gb)
        results["gspmd"][dp] = t
        print(f"gspmd     dp={dp}: {t * 1e3:8.1f} ms/step "
              f"({dp / t:.2f} microbatches/s)")

    # --- model parallel: the SAME global batch partitioned over mp devices
    # with per-layer neighbor-only halo exchange (parallel/mp_halo) — strong
    # scaling of one train step (GatedGCNNet + SignNet phi, VERDICT r3 #6)
    from signnet_basisnet_tpu.models import gnn_model
    from signnet_basisnet_tpu.parallel import (build_mp_steps,
                                               device_arrays_mp,
                                               partition_batch_mp)
    from signnet_basisnet_tpu.training import make_zinc_predict

    net = gnn_model("GatedGCN", hidden_dim=32, out_dim=32, n_layers=8,
                    pos_enc_dim=8, lap_method="sign_inv", sign_inv_layers=4,
                    phi_out_dim=4, batch_norm=True, dropout=0.0)
    arrays = make_global(4)                      # one fixed global batch
    gb_full = jax.tree.map(jnp.asarray, from_arrays(arrays))
    pz = make_zinc_predict(net, lap_method="sign_inv")
    results["mp_halo"] = {}
    for mp in (1, 2, 4, 8):
        if mp > len(devices):
            break
        state = create_state(net, gb_full, tx,
                             model_kwargs={"pos_enc": gb_full.eigvecs})
        if mp == 1:
            from signnet_basisnet_tpu.training import build_steps
            ts, _ = build_steps(pz, tx, donate=False)
            t = bench(lambda s, g: ts(s, g, jnp.float32(1e-3),
                                      jax.random.PRNGKey(0)),
                      state, gb_full)
        else:
            mesh = make_mesh(dp=1, mp=mp, devices=devices[:mp])
            mp_train, _ = build_mp_steps(pz, tx, mesh)
            parts = partition_batch_mp(arrays, mp)
            arrs = jax.tree.map(jnp.asarray, device_arrays_mp(parts))
            halo_frac = parts["halo"] * mp / (parts["shard_n"] * mp)
            print(f"mp_halo mp={mp}: halo={parts['halo']} rows/pair "
                  f"({halo_frac * 100:.1f}% of N)")
            t = bench(lambda s, g: mp_train(s, g, jnp.float32(1e-3),
                                            jax.random.PRNGKey(0)),
                      state, arrs)
        results["mp_halo"][mp] = t
        print(f"mp_halo   mp={mp}: {t * 1e3:8.1f} ms/step (strong scaling, "
              f"fixed global batch)")

    print("\nweak-scaling efficiency vs dp=1 (per-device throughput):")
    for scheme, r in results.items():
        if scheme == "mp_halo" or 1 not in r:
            continue
        base = r[1]
        row = "  ".join(f"dp={d}: {base / r[d] * 100:5.1f}%"
                        for d in sorted(r))
        print(f"{scheme:10s} {row}")
    if 1 in results["mp_halo"]:
        base = results["mp_halo"][1]
        row = "  ".join(
            f"mp={d}: {base / (r * d) * 100:5.1f}%"
            for d, r in sorted(results["mp_halo"].items()))
        print(f"mp_halo strong-scaling efficiency (speedup/mp): {row}")


if __name__ == "__main__":
    main()
