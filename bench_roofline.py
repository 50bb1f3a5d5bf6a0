"""Roofline / MFU analysis of the flagship train step (VERDICT r1 #5).

For the benchmark model (GIN L=16 h=95 + SignNet phi 8 layers, k=8) at
batch sizes 128 / 512 / 2048 graphs:

- FLOPs and HBM bytes from XLA's own cost model
  (compiled.cost_analysis()), which accounts for every fused op in the
  compiled train step;
- measured step time on the real chip;
- % of peak compute and % of peak HBM bandwidth -> which wall the step is
  against, and the speed-of-light step time.

TPU v5e peaks (public spec): 197 TFLOP/s bf16, 98.5 TFLOP/s f32(emulated),
819 GB/s HBM.

Run on the TPU: `python bench_roofline.py`.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

PEAK_BF16 = 197e12
PEAK_F32 = PEAK_BF16 / 2
PEAK_HBM = 819e9

HIDDEN, N_LAYERS, K, SIGN_INV_LAYERS = 95, 16, 8, 8


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
    from signnet_basisnet_tpu.training import (adam, build_steps,
                                               create_state,
                                               make_zinc_predict)

    for bg in (128, 512, 2048):
        arrays = build(bg)
        gb = from_arrays(arrays)
        edges = float(np.asarray(arrays["edge_mask"]).sum())
        model = GINNet(hidden_dim=HIDDEN, out_dim=HIDDEN, n_layers=N_LAYERS,
                       pos_enc_dim=K, lap_method="sign_inv",
                       sign_inv_layers=SIGN_INV_LAYERS, phi_out_dim=4,
                       batch_norm=True, dropout=0.0)
        tx = adam()
        state = create_state(model, gb, tx,
                             model_kwargs={"pos_enc": gb.eigvecs})
        predict = make_zinc_predict(model, lap_method="sign_inv")
        train_step, _ = build_steps(predict, tx, donate=False)

        lr = jnp.float32(1e-3)
        rng = jax.random.PRNGKey(0)
        lowered = jax.jit(train_step).lower(state, gb, lr, rng)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
        bytes_hbm = float(ca.get("bytes accessed", float("nan")))

        for _ in range(5):
            state, m = train_step(state, gb, lr, rng)
        jax.block_until_ready(m["loss"])
        reps = 30
        t0 = time.perf_counter()
        for _ in range(reps):
            state, m = train_step(state, gb, lr, rng)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / reps

        mfu_f32 = flops / dt / PEAK_F32 * 100
        mfu_bf16 = flops / dt / PEAK_BF16 * 100
        bw = bytes_hbm / dt / PEAK_HBM * 100
        sol = max(flops / PEAK_F32, bytes_hbm / PEAK_HBM)
        n_nodes = arrays["node_mask"].shape[0]
        n_edges = arrays["edge_mask"].shape[0]
        print(f"batch={bg:5d} graphs  N_pad={n_nodes} E_pad={n_edges} "
              f"real_edges={edges:.0f}")
        print(f"  step {dt * 1e3:7.3f} ms   {edges / dt / 1e6:8.2f} M real "
              f"edges/s")
        print(f"  XLA cost: {flops / 1e9:.2f} GFLOP, "
              f"{bytes_hbm / 1e6:.1f} MB accessed")
        print(f"  MFU {mfu_f32:5.2f}% of f32 peak ({mfu_bf16:.2f}% of bf16); "
              f"HBM {bw:5.1f}% of 819 GB/s")
        print(f"  speed-of-light step {sol * 1e3:.3f} ms -> "
              f"{dt / sol:.1f}x off roofline; bound: "
              f"{'HBM' if bytes_hbm / PEAK_HBM > flops / PEAK_F32 else 'compute'}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
