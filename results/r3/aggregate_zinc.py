"""Aggregate FINAL lines from results/r3/zinc/*.log into a mean+-std table
(mirrors the reference's 4-seed tables, GraphPrediction/README.md:14-30)."""
import glob
import re
import sys

import numpy as np

rows = {}
for path in sorted(glob.glob("results/r3/zinc/*_s*.log")):
    m = re.match(r".*/(\w+?)_s(\d+)\.log", path)
    cfg, seed = m.group(1), int(m.group(2))
    txt = open(path).read()
    f = re.findall(r"FINAL: test_mae=([\d.]+) val_mae=([\d.]+) "
                   r"epochs=(\d+) time=([\d.]+)h", txt)
    if not f:
        print(f"# {cfg} s{seed}: NO FINAL LINE (truncated?)", file=sys.stderr)
        continue
    test, val, ep, hours = f[-1]
    bv = re.findall(r"FINAL_BEST_VAL: test_mae=([\d.]+) val_mae=([\d.]+)",
                    txt)
    bv_test = float(bv[-1][0]) if bv else float("nan")
    rows.setdefault(cfg, []).append(
        (seed, float(test), float(val), int(ep), float(hours), bv_test))

for cfg, rs in rows.items():
    rs.sort()
    t = np.array([r[1] for r in rs])
    v = np.array([r[2] for r in rs])
    seeds = ",".join(str(r[0]) for r in rs)
    eps = ",".join(str(r[3]) for r in rs)
    per = " ".join(f"s{r[0]}={r[1]:.4f}" for r in rs)
    bvs = " ".join(f"s{r[0]}={r[5]:.4f}" for r in rs)
    print(f"{cfg}: test_mae {t.mean():.4f} +- {t.std():.4f} "
          f"(n={len(rs)} seeds [{seeds}]; per-seed {per}; "
          f"val {v.mean():.4f} +- {v.std():.4f}; epochs [{eps}]; "
          f"test@best-val per-seed {bvs})")
