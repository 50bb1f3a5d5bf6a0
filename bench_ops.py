"""Micro-benchmarks for the aggregation kernels at ZINC batch shapes.

Runs on whatever backend JAX selects (the TPU under axon).  Compares:
- XLA scatter-add segment_sum (sorted indices),
- one-hot MXU matmul segment_sum,
- the Pallas fused SpMM kernel.
Prints one line per variant; use to pick graph.segment.set_sum_backend.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from signnet_basisnet_tpu import ops

N, E, D = 3072, 6912, 128
REPS = 50


def timeit(fn, *args):
    out = fn(*args)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    # data-dependent value fetch, NOT block_until_ready: the axon tunnel's
    # block_until_ready can return before completion (probe_timer.log),
    # inflating throughput.  The fetch adds one ~30ms round-trip,
    # amortized over REPS.
    jax.device_get(out)
    return (time.perf_counter() - t0) / REPS


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    senders = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
    receivers = jnp.asarray(np.sort(rng.integers(0, N, E).astype(np.int32)))
    w = jnp.asarray((rng.random(E) < 0.9).astype(np.float32))

    ref = jax.jit(lambda x, s, r, w: ops.spmm_reference(x, s, r, w, N))
    one = jax.jit(lambda x, s, r, w: ops.spmm_onehot(x, s, r, w, N))
    t_ref = timeit(ref, x, senders, receivers, w)
    t_one = timeit(one, x, senders, receivers, w)
    print(f"xla_scatter:  {t_ref * 1e6:8.1f} us  "
          f"({E / t_ref / 1e6:.1f} Medges/s)")
    print(f"onehot_mxu:   {t_one * 1e6:8.1f} us  "
          f"({E / t_one / 1e6:.1f} Medges/s)")

    try:
        s_np, r_np, w_np = ops.pad_edges_to(np.asarray(senders),
                                            np.asarray(receivers),
                                            np.asarray(w), 1024)
        senders, receivers, w = (jnp.asarray(s_np), jnp.asarray(r_np),
                                 jnp.asarray(w_np))
        starts, ends = ops.tile_edge_ranges(r_np, N, bn=256)
        starts = jnp.asarray(starts); ends = jnp.asarray(ends)
        pal = lambda x, s, r, w: ops.spmm_pallas(x, s, r, w, starts, ends,
                                                 num_nodes=N)
        t_pal = timeit(pal, x, senders, receivers, w)
        out_p = pal(x, senders, receivers, w)
        out_r = ref(x, senders, receivers, w)
        err = float(jnp.abs(out_p - out_r).max())
        print(f"pallas_spmm:  {t_pal * 1e6:8.1f} us  "
              f"({E / t_pal / 1e6:.1f} Medges/s)  max_err={err:.2e}")
    except Exception as exc:  # noqa: BLE001
        print(f"pallas_spmm:  FAILED ({type(exc).__name__}: {exc})")

    try:
        # tile-local layout: both endpoints inside one 256-node tile
        rng2 = np.random.default_rng(1)
        t = rng2.integers(0, N // 256, size=E)
        src = (t * 256 + rng2.integers(0, 256, size=E)).astype(np.int32)
        dst = (t * 256 + rng2.integers(0, 256, size=E)).astype(np.int32)
        order = np.argsort(dst, kind="stable")
        src, dst = src[order], dst[order]
        wt = rng2.random(E).astype(np.float32)
        src_p, dst_p, w_p = ops.pad_edges_to(src, dst, wt, 1024)
        starts, ends = ops.tile_edge_ranges(dst, N, bn=256)
        args = (x, jnp.asarray(src_p), jnp.asarray(dst_p), jnp.asarray(w_p),
                jnp.asarray(starts), jnp.asarray(ends))
        tiled = lambda *a: ops.spmm_tiled(*a, N, 256)
        t_til = timeit(tiled, *args)
        out_t = tiled(*args)
        ref_t = ops.spmm_reference(x, jnp.asarray(src), jnp.asarray(dst),
                                   jnp.asarray(wt), N)
        err = float(jnp.abs(out_t - ref_t).max())
        print(f"pallas_tiled: {t_til * 1e6:8.1f} us  "
              f"({E / t_til / 1e6:.1f} Medges/s)  max_err={err:.2e}")
    except Exception as exc:  # noqa: BLE001
        print(f"pallas_tiled: FAILED ({type(exc).__name__}: {exc})")

    bench_attention()
    bench_gatedgcn()
    bench_train_steps()


def _tiled_edges(rng, bn=256):
    n_tiles = N // bn
    t = rng.integers(0, n_tiles, size=E)
    src = (t * bn + rng.integers(0, bn, size=E)).astype(np.int32)
    dst = (t * bn + rng.integers(0, bn, size=E)).astype(np.int32)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    em = np.ones(E, np.float32)
    src_p, dst_p, em_p = ops.pad_edges_to(src, dst, em, 1024)
    starts, ends = ops.tile_edge_ranges(dst, N, bn=bn)
    return (jnp.asarray(src_p), jnp.asarray(dst_p), jnp.asarray(em_p),
            jnp.asarray(starts), jnp.asarray(ends), len(src_p))


def bench_gatedgcn(F=68):
    """Fused GatedGCN gate+aggregate kernel vs its XLA lowering at the ZINC
    GatedGCN config width (hidden 68) — first benchmark of this kernel
    (VERDICT r2 directive #4)."""
    rng = np.random.default_rng(4)
    sj, rj, ej, st, en, Ep = _tiled_edges(rng)
    Bh = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    Dh = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    Eh = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    Ce = jnp.asarray(rng.normal(size=(Ep, F)).astype(np.float32))

    xla = jax.jit(lambda Bh, Dh, Eh, Ce: ops.gatedgcn_gate_reference(
        Bh, Dh, Eh, Ce, sj, rj, ej, N))
    pal = jax.jit(lambda Bh, Dh, Eh, Ce: ops.gatedgcn_gate_tiled(
        Bh, Dh, Eh, Ce, sj, rj, ej, st, en, N, 256))
    try:
        t_x = timeit(xla, Bh, Dh, Eh, Ce)
        t_p = timeit(pal, Bh, Dh, Eh, Ce)
        ox, op_ = xla(Bh, Dh, Eh, Ce), pal(Bh, Dh, Eh, Ce)
        # compare VALID rows only: on padded edge rows the kernel writes
        # zeros while the XLA reference computes sentinel-index garbage;
        # both are masked out downstream (r3 bench_ops.log's 7.18 "error"
        # was exactly this padding artifact — valid-row error is 0.0)
        vm = ej > 0
        err = max(float(jnp.abs(ox[0] - op_[0]).max()),
                  float(jnp.abs((ox[1] - op_[1]) * vm[:, None]).max()))
        print(f"gate_xla:     {t_x * 1e6:8.1f} us  "
              f"({E / t_x / 1e6:.1f} Medges/s)")
        print(f"gate_pallas:  {t_p * 1e6:8.1f} us  "
              f"({E / t_p / 1e6:.1f} Medges/s)  max_err={err:.2e}  "
              f"speedup={t_x / t_p:.2f}x")

        def loss_x(Bh, Dh, Eh, Ce):
            agg, e_new = xla(Bh, Dh, Eh, Ce)
            return (agg ** 2).sum() + (e_new ** 2).sum()

        def loss_p(Bh, Dh, Eh, Ce):
            agg, e_new = pal(Bh, Dh, Eh, Ce)
            return (agg ** 2).sum() + (e_new ** 2).sum()

        gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2, 3)))
        gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2, 3)))
        t_gx = timeit(gx, Bh, Dh, Eh, Ce)
        t_gp = timeit(gp, Bh, Dh, Eh, Ce)
        print(f"gate_xla+bwd:    {t_gx * 1e6:8.1f} us")
        print(f"gate_pallas+bwd: {t_gp * 1e6:8.1f} us  "
              f"speedup={t_gx / t_gp:.2f}x")
    except Exception as exc:  # noqa: BLE001
        print(f"gate_pallas:  FAILED ({type(exc).__name__}: {exc})")


def bench_train_steps():
    """FULL train step of TransformerNet and GatedGCNNet at ZINC shapes,
    XLA backend vs pallas_tile backend (tile-local batches both ways):
    the number that decides whether the fused kernels ship as defaults."""
    import jax.numpy as jnp  # noqa: F811
    from signnet_basisnet_tpu.data import (add_lap_pe, choose_budgets,
                                           pack_batches, synthetic_zinc)
    from signnet_basisnet_tpu.graph import from_arrays
    from signnet_basisnet_tpu.graph import segment as seg
    from signnet_basisnet_tpu.models import gnn_model
    from signnet_basisnet_tpu.training import (adam, build_steps,
                                               create_state,
                                               make_zinc_predict)

    splits = synthetic_zinc(num_train=128, num_val=8, num_test=8, seed=0)
    train = splits["train"]
    add_lap_pe(train, 8)
    nb, eb, gc = choose_budgets(train, 128, tile=256)
    arrays = pack_batches(train, nb, eb, gc, k=8, tile=256)[0]
    gb = from_arrays(arrays)
    edges = float(np.asarray(arrays["edge_mask"]).sum())

    cfgs = {
        # the flagship bench.py model (GIN + SignNet, hidden 95, L=16):
        # the step the BENCH headline is made of (VERDICT r3 #3)
        "GIN": dict(hidden_dim=95, out_dim=95, n_layers=16,
                    pos_enc_dim=8, lap_method="sign_inv",
                    sign_inv_net="gin", sign_inv_layers=8, phi_out_dim=4,
                    batch_norm=True, dropout=0.0),
        "Transformer": dict(hidden_dim=64, out_dim=64, n_layers=10,
                            num_heads=8, pos_enc_dim=8, lap_method="sign_inv",
                            sign_inv_net="gin", sign_inv_layers=8,
                            phi_out_dim=4, edge_feat=True, batch_norm=True,
                            dropout=0.0),
        "GatedGCN": dict(hidden_dim=68, out_dim=68, n_layers=16,
                         pos_enc_dim=8, lap_method="sign_inv",
                         sign_inv_net="gin", sign_inv_layers=8,
                         phi_out_dim=4, edge_feat=True, batch_norm=True,
                         dropout=0.0),
    }
    for name, kw in cfgs.items():
        model = gnn_model(name, **kw)
        tx = adam()
        state = create_state(model, gb, tx,
                             model_kwargs={"pos_enc": gb.eigvecs})
        predict = make_zinc_predict(model, lap_method="sign_inv")
        lr = jnp.float32(1e-3)
        rng = jax.random.PRNGKey(0)
        times = {}
        for backend in ("xla", "pallas_tile"):
            seg.set_agg_backend(backend)
            try:
                train_step, _ = build_steps(predict, tx, donate=False)
                st = state
                for _ in range(5):
                    st, m = train_step(st, gb, lr, rng)
                float(jax.device_get(m["loss"]))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    st2 = st
                    for _ in range(20):
                        st2, m = train_step(st2, gb, lr, rng)
                    # honest barrier (see timeit note)
                    float(jax.device_get(m["loss"]))
                    best = min(best, (time.perf_counter() - t0) / 20)
                times[backend] = best
                print(f"{name}_step_{backend}: {best * 1e6:9.1f} us  "
                      f"({edges / best / 1e6:.2f} M real edges/s)")
            except Exception as exc:  # noqa: BLE001
                print(f"{name}_step_{backend}: FAILED "
                      f"({type(exc).__name__}: {exc})")
            finally:
                seg.set_agg_backend("xla")
        if len(times) == 2:
            print(f"{name}_step speedup (pallas vs xla): "
                  f"{times['xla'] / times['pallas_tile']:.3f}x")


def bench_attention(H=8, Dh=10):
    """Fused edge-softmax attention (pallas) vs its XLA lowering at ZINC
    production shapes (hidden 80 = 8 heads x 10, the Transformer config)."""
    rng = np.random.default_rng(2)
    n_tiles = N // 256
    t = rng.integers(0, n_tiles, size=E)
    src = (t * 256 + rng.integers(0, 256, size=E)).astype(np.int32)
    dst = (t * 256 + rng.integers(0, 256, size=E)).astype(np.int32)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    em = np.ones(E, np.float32)
    src_p, dst_p, em_p = ops.pad_edges_to(src, dst, em, 1024)
    starts, ends = ops.tile_edge_ranges(dst, N, bn=256)
    Q = jnp.asarray(rng.normal(size=(N, H, Dh)).astype(np.float32))
    K = jnp.asarray(rng.normal(size=(N, H, Dh)).astype(np.float32))
    V = jnp.asarray(rng.normal(size=(N, H, Dh)).astype(np.float32))
    E1 = jnp.asarray(rng.normal(size=(len(src_p), H, Dh)).astype(np.float32))
    sj, rj, ej = jnp.asarray(src_p), jnp.asarray(dst_p), jnp.asarray(em_p)
    st, en = jnp.asarray(starts), jnp.asarray(ends)

    xla = jax.jit(lambda Q, K, V, E1: ops.edge_softmax_attention_reference(
        Q, K, V, E1, sj, rj, ej, N))
    pal = jax.jit(lambda Q, K, V, E1: ops.edge_softmax_attention_tiled(
        Q, K, V, E1, sj, rj, ej, st, en, N, 256))
    try:
        t_x = timeit(xla, Q, K, V, E1)
        t_p = timeit(pal, Q, K, V, E1)
        err = float(jnp.abs(pal(Q, K, V, E1) - xla(Q, K, V, E1)).max())
        print(f"attn_xla:     {t_x * 1e6:8.1f} us  "
              f"({E / t_x / 1e6:.1f} Medges/s)")
        print(f"attn_pallas:  {t_p * 1e6:8.1f} us  "
              f"({E / t_p / 1e6:.1f} Medges/s)  max_err={err:.2e}  "
              f"speedup={t_x / t_p:.2f}x")

        # train-step shape: value+grad wrt all four operands
        gx = jax.jit(jax.grad(lambda Q, K, V, E1:
                              (xla(Q, K, V, E1) ** 2).sum(),
                              argnums=(0, 1, 2, 3)))
        gp = jax.jit(jax.grad(lambda Q, K, V, E1:
                              (pal(Q, K, V, E1) ** 2).sum(),
                              argnums=(0, 1, 2, 3)))
        t_gx = timeit(gx, Q, K, V, E1)
        t_gp = timeit(gp, Q, K, V, E1)
        print(f"attn_xla+bwd:    {t_gx * 1e6:8.1f} us")
        print(f"attn_pallas+bwd: {t_gp * 1e6:8.1f} us  "
              f"speedup={t_gx / t_gp:.2f}x")
    except Exception as exc:  # noqa: BLE001
        print(f"attn_pallas:  FAILED ({type(exc).__name__}: {exc})")


def bench_packer(n_graphs=10000, batch=128, reps=20):
    """Host packer throughput: numpy batch_np vs the native C++ packer
    (substantiates data/native.py's 'keeps up with the TPU' claim)."""
    from signnet_basisnet_tpu.data.native import (GraphStore,
                                                  native_available,
                                                  pack_batch_native)
    from signnet_basisnet_tpu.graph import batch_np
    rng = np.random.default_rng(3)
    gs = []
    for _ in range(n_graphs):
        n = int(rng.integers(10, 38))
        e = int(rng.integers(n, 3 * n))
        s = rng.integers(0, n, e).astype(np.int32)
        r = rng.integers(0, n, e).astype(np.int32)
        gs.append(dict(senders=s, receivers=r,
                       node_feat=rng.integers(0, 28, n).astype(np.int32),
                       edge_feat=rng.integers(0, 4, e).astype(np.int32),
                       y=np.array([float(rng.normal())], np.float32),
                       eigvecs=rng.normal(size=(n, 8)).astype(np.float32),
                       eigvals=rng.normal(size=(8,)).astype(np.float32)))
    nb, eb, gc = 3584, 14336, batch + 1
    idx = np.arange(batch)

    t0 = time.perf_counter()
    for i in range(reps):
        sel = [gs[(i * batch + j) % n_graphs] for j in range(batch)]
        batch_np(sel, nb, eb, gc, k=8)
    t_np = (time.perf_counter() - t0) / reps

    if native_available():
        store = GraphStore(gs, k=8)
        t0 = time.perf_counter()
        for i in range(reps):
            pack_batch_native(store, (idx + i * batch) % n_graphs, nb, eb, gc)
        t_nat = (time.perf_counter() - t0) / reps
        print(f"pack_numpy:   {t_np * 1e3:8.2f} ms/batch "
              f"({batch / t_np:.0f} graphs/s)")
        print(f"pack_native:  {t_nat * 1e3:8.2f} ms/batch "
              f"({batch / t_nat:.0f} graphs/s)  speedup={t_np / t_nat:.1f}x")
    else:
        print(f"pack_numpy:   {t_np * 1e3:8.2f} ms/batch; native lib not "
              f"built (make -C native)")


if __name__ == "__main__":
    if "--packer" in sys.argv:
        bench_packer()
    else:
        main()
