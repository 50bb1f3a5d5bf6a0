"""Compare the pallas_tile GatedGCN s41 training curve against the r3 XLA
s41 run (VERDICT r3 directive #2: 'show the loss curve matches').

Same config, same seed, different aggregation backend AND batch packing
(tile-local first-fit vs contiguous), so batches contain the same graphs in
a different order/padding — curves are expected to track within run-to-run
noise, not bit-exactly.  Reports per-epoch overlay stats + final numbers.
"""
import json
import sys

import numpy as np


def load(path):
    with open(path) as f:
        d = json.load(f)
    h = d["history"]
    return d, np.array([r["val_mae"] for r in h]), \
        np.array([r["train_mae"] for r in h])


def main(xla_path, tile_path):
    dx, vx, tx = load(xla_path)
    dt, vt, tt = load(tile_path)
    n = min(len(vx), len(vt))
    print(f"epochs: xla={len(vx)} tile={len(vt)} (comparing first {n})")
    for lo, hi in [(0, 25), (25, 100), (100, n)]:
        hi = min(hi, n)
        if lo >= hi:
            continue
        dv = np.abs(vx[lo:hi] - vt[lo:hi])
        print(f"  epochs [{lo:3d},{hi:3d}): median |val_mae diff| "
              f"{np.median(dv):.4f}; val_mae xla {np.median(vx[lo:hi]):.4f} "
              f"tile {np.median(vt[lo:hi]):.4f}; train xla "
              f"{np.median(tx[lo:hi]):.4f} tile {np.median(tt[lo:hi]):.4f}")
    print(f"FINAL xla:  test {dx['test_mae']:.4f} val {dx['val_mae']:.4f}")
    print(f"FINAL tile: test {dt['test_mae']:.4f} val {dt['val_mae']:.4f} "
          f"best-val-test {dt.get('best_val_test_mae', float('nan')):.4f}")
    same = abs(dx["test_mae"] - dt["test_mae"])
    print(f"final test-MAE gap: {same:.4f} "
          f"({'MATCH (within seed noise ~0.01)' if same < 0.02 else 'DIVERGED'})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "results/r3/zinc/gatedgcn_zinc_signinv_gin_s41_results.json",
         sys.argv[2] if len(sys.argv) > 2 else
         "results/r4/zinc/gatedgcn_tile_s41_results.json")
