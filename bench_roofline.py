"""Roofline / MFU analysis of the flagship train step (VERDICT r2 #3).

The r2 version fed ``compiled.cost_analysis()`` straight into MFU math; on
the experimental ``axon`` platform those counters are not HBM traffic (they
produced a physically impossible 310% MFU).  This version uses an ANALYTIC
FLOPs/bytes model of the benchmark train step built from the actual batch
shapes and layer dimensions:

- FLOPs: every matmul in the model (phi GIN stack over +-v and k channels,
  rho MLP, PE merge, 16 base GIN convs, readout) counted as 2*m*n*k, plus
  segment-sum aggregation adds (1 FLOP per gathered element).  Backward =
  2x the forward matmul FLOPs (two matmuls per Linear) + 1x aggregation;
  Adam ~= 12 FLOPs/param.
- Bytes: a LOWER bound assuming perfect XLA fusion — parameter traffic
  (fwd read + bwd read + grad write + Adam moment read/write), one
  write + one read of every inter-layer activation (saved for backward),
  edge-index reads for each gather/scatter pass, and the batch input.
  Real traffic is >= this, so the speed-of-light step time below is a true
  lower bound and %-of-peak numbers cannot exceed 100 unless the model or
  the timer is broken (in which case this script says so loudly).

XLA's cost_analysis numbers are printed alongside for reference but are
NOT used (labeled untrusted on this platform).

TPU v5e (v5 lite) public peaks: 197 TFLOP/s bf16, ~98.5 TFLOP/s f32
(emulated via 2 bf16 passes), 819 GB/s HBM.

Run on the TPU: ``python bench_roofline.py``.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

PEAK_BF16 = 197e12
PEAK_F32 = PEAK_BF16 / 2
PEAK_HBM = 819e9

HIDDEN, N_LAYERS, K, SIGN_INV_LAYERS, PHI_OUT = 95, 16, 8, 8, 4
F32 = 4  # bytes


def analytic_cost(N, E, G, P):
    """(train_flops, train_bytes_lower_bound) for the benchmark model
    (GINNet L=16 h=95 + GINDeepSigns phi 8 layers k=8 phi_out=4).

    N/E/G: padded node/edge/graph counts of one batch; P: param count.
    """
    H = HIDDEN
    mm = 0.0          # forward matmul FLOPs
    agg = 0.0         # forward aggregation (gather + segment-add) FLOPs
    act = 0.0         # inter-layer activation elements (saved for backward)

    # --- phi: SIGN_INV_LAYERS GIN layers on [2*N, K, d] (sign_fuse stacks
    # +v/-v), d_in = 1 then H, d_out = H except PHI_OUT at the last layer
    rows = 2 * N * K
    d_in = 1
    for i in range(SIGN_INV_LAYERS):
        d_out = PHI_OUT if i == SIGN_INV_LAYERS - 1 else H
        agg += 2 * E * K * d_in          # gather + segment-add, both signs
        mm += 2 * rows * d_in * H        # Linear d_in -> H
        mm += 2 * rows * H * d_out       # Linear H -> d_out
        act += rows * (d_in + H + d_out)
        d_in = d_out

    # --- rho: MLP (SIGN_INV_LAYERS layers) on [N, K*PHI_OUT] -> [N, K]
    d_in = K * PHI_OUT
    for i in range(SIGN_INV_LAYERS):
        d_out = K if i == SIGN_INV_LAYERS - 1 else H
        mm += 2 * N * d_in * d_out
        act += N * (d_in + d_out)
        d_in = d_out

    # --- PE merge: Linear K -> H (embedding_p); atom embedding is a lookup
    mm += 2 * N * K * H
    act += N * H

    # --- base: N_LAYERS GIN convs, each agg + Linear(H->H) + Linear(H->H)
    for _ in range(N_LAYERS):
        agg += E * H
        mm += 2 * N * H * H * 2
        act += N * H * 3

    # --- readout: segment-sum over nodes + MLPReadout (H -> H/2 -> H/4 -> 1)
    agg += N * H
    mm += 2 * G * (H * (H // 2) + (H // 2) * (H // 4) + (H // 4))

    fwd_flops = mm + agg
    # backward: 2 matmuls per forward matmul (dX and dW) + aggregation
    # transpose pass; optimizer: ~12 FLOPs/param (Adam moments + update)
    train_flops = fwd_flops + 2 * mm + agg + 12 * P

    # --- bytes (lower bound, perfect fusion):
    param_bytes = F32 * P * (1 + 1 + 1 + 4)  # fwd read, bwd read, grad
    # write, Adam read m+v+p / write m+v+p (approx 4P more transfers)
    act_bytes = F32 * act * 2                # write in fwd + read in bwd
    idx_bytes = 4 * E * 2 * (SIGN_INV_LAYERS + N_LAYERS)  # src+dst per agg
    input_bytes = F32 * (N * K) + 4 * (N + 2 * E + G)     # eigvecs + ids
    train_bytes = param_bytes + act_bytes + idx_bytes + input_bytes
    return train_flops, train_bytes


def build(batch_graphs, seed=0):
    from signnet_basisnet_tpu.data import (add_lap_pe, choose_budgets,
                                           pack_batches, synthetic_zinc)
    splits = synthetic_zinc(num_train=batch_graphs, num_val=8, num_test=8,
                            seed=seed)
    train = splits["train"]
    add_lap_pe(train, K)
    nb, eb, gb_ = choose_budgets(train, batch_graphs)
    return pack_batches(train, nb, eb, gb_, k=K)[0]


def main():
    import jax
    import jax.numpy as jnp
    from signnet_basisnet_tpu.graph import from_arrays
    from signnet_basisnet_tpu.models import GINNet
    from signnet_basisnet_tpu.training import (adam, build_steps, count_params,
                                               create_state,
                                               make_zinc_predict)

    # 128 = the reference protocol batch (the latency-bound regime), 2048 =
    # the throughput regime; 512 sits between and adds compile time without
    # changing the conclusion (r2 curve: 3.44 / 7.67 / 38.2 M edges/s)
    for bg in (128, 2048):
        arrays = build(bg)
        gb = from_arrays(arrays)
        edges = float(np.asarray(arrays["edge_mask"]).sum())
        model = GINNet(hidden_dim=HIDDEN, out_dim=HIDDEN, n_layers=N_LAYERS,
                       pos_enc_dim=K, lap_method="sign_inv",
                       sign_inv_layers=SIGN_INV_LAYERS, phi_out_dim=PHI_OUT,
                       batch_norm=True, dropout=0.0)
        tx = adam()
        state = create_state(model, gb, tx,
                             model_kwargs={"pos_enc": gb.eigvecs})
        P = count_params(state.params)
        predict = make_zinc_predict(model, lap_method="sign_inv")
        train_step, _ = build_steps(predict, tx, donate=False)

        lr = jnp.float32(1e-3)
        rng = jax.random.PRNGKey(0)
        N_pad = arrays["node_mask"].shape[0]
        E_pad = arrays["edge_mask"].shape[0]
        G_pad = arrays["y"].shape[0]
        flops, bytes_lb = analytic_cost(N_pad, E_pad, G_pad, P)

        # XLA's own counters: printed for reference only (untrusted on axon)
        try:
            ca = jax.jit(train_step).lower(state, gb, lr, rng).compile(
                ).cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            xla_flops = float(ca.get("flops", float("nan")))
            xla_bytes = float(ca.get("bytes accessed", float("nan")))
        except Exception:
            xla_flops = xla_bytes = float("nan")

        for _ in range(5):
            state, m = train_step(state, gb, lr, rng)
        jax.block_until_ready(m["loss"])
        reps = 30
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                state, m = train_step(state, gb, lr, rng)
            jax.block_until_ready(m["loss"])
            best = min(best, (time.perf_counter() - t0) / reps)
        dt = best

        mfu = flops / dt / PEAK_F32 * 100
        bw = bytes_lb / dt / PEAK_HBM * 100
        t_compute = flops / PEAK_F32
        t_mem = bytes_lb / PEAK_HBM
        sol = max(t_compute, t_mem)
        print(f"batch={bg:5d} graphs  N_pad={N_pad} E_pad={E_pad} "
              f"G_pad={G_pad} real_edges={edges:.0f} params={P}")
        print(f"  step {dt * 1e3:7.3f} ms   {edges / dt / 1e6:8.2f} M real "
              f"edges/s")
        print(f"  analytic: {flops / 1e9:7.2f} GFLOP (train step), "
              f">= {bytes_lb / 1e6:6.1f} MB HBM traffic")
        print(f"  xla cost_analysis (UNTRUSTED on axon): "
              f"{xla_flops / 1e9:.2f} GFLOP, {xla_bytes / 1e6:.1f} MB")
        print(f"  MFU {mfu:6.2f}% of f32 peak; HBM >= {bw:5.1f}% of 819 GB/s")
        if mfu > 100 or bw > 100:
            print("  ERROR: >100% of peak — analytic model or timer is "
                  "broken; numbers above are INVALID")
        bound = "HBM-bandwidth" if t_mem > t_compute else "compute"
        if max(mfu, bw) < 15:
            bound = (f"neither ({bound} is the nearer wall): the step is "
                     f"LATENCY/overhead-bound at this size")
        print(f"  speed-of-light step {sol * 1e3:.3f} ms "
              f"(compute {t_compute * 1e3:.3f} / memory {t_mem * 1e3:.3f}) "
              f"-> {dt / sol:.1f}x off roofline; bound: {bound}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
