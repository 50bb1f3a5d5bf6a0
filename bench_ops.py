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
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
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


if __name__ == "__main__":
    main()
