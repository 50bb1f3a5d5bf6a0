"""Convert the r5 jax.profiler xplane traces into a per-op time table
(VERDICT r4 weak #2: the 12.2 ms flagship step needs a measured breakdown,
not an asserted one).

The tensorboard_plugin_profile converter in this image is incompatible with
the installed TF (_pywrap_profiler lacks xspace_to_tools_data), so this
aggregates the XSpace proto directly: find the TPU device plane, sum event
durations per op-metadata on the "XLA Ops" line, and group ops into
categories (matmul/fusion/pallas/copy/...) by name.

Usage: python results/r5/profile_report.py results/r5/trace_tile_bf16 [...]
Writes <dir>/op_table.md + prints it.
"""
import glob
import os
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load_xspace(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def categorize(name):
    n = name.lower()
    if "custom-call" in n or "mosaic" in n or "tpu_custom_call" in n:
        return "pallas kernel"
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion (elementwise/other)"
    if "convolution" in n or n.startswith("dot") or "gemm" in n:
        return "matmul"
    if "copy" in n or "bitcast" in n:
        return "copy/layout"
    if "all-reduce" in n or "all-to-all" in n or "collective" in n:
        return "collective"
    if "dynamic-update-slice" in n or "dynamic-slice" in n:
        return "dynamic slice"
    if "scatter" in n:
        return "scatter"
    if "gather" in n:
        return "gather"
    if "reduce" in n:
        return "reduce"
    if "infeed" in n or "outfeed" in n:
        return "infeed/outfeed"
    return "other"


def report(trace_dir):
    xs = load_xspace(trace_dir)
    dev_planes = [p for p in xs.planes
                  if "TPU" in p.name and "Host" not in p.name]
    if not dev_planes:
        dev_planes = [p for p in xs.planes
                      if p.name.startswith("/device:")]
    lines_out = [f"# Per-op profile: {trace_dir}", ""]
    for plane in dev_planes:
        meta = plane.event_metadata
        by_op = defaultdict(lambda: [0.0, 0])
        line_names = []
        import re
        for line in plane.lines:
            line_names.append(line.name)
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = (m.display_name or m.name) if m else str(ev.metadata_id)
                # `while`/`call`/`conditional` events CONTAIN their body ops
                # (the same line carries the nested leaves) — excluding them
                # keeps the table leaf-only and the total un-double-counted
                if re.match(r"(while|call|conditional|body|condition)[.\d]*$",
                            name.split("/")[-1]):
                    continue
                base = re.sub(r"\.\d+$", "", name)   # group fusion.123 etc.
                by_op[base][0] += ev.duration_ps / 1e6  # -> us
                by_op[base][1] += 1
        if not by_op:
            # fall back: aggregate every line
            for line in plane.lines:
                for ev in line.events:
                    m = meta.get(ev.metadata_id)
                    name = ((m.display_name or m.name) if m
                            else str(ev.metadata_id))
                    by_op[f"{line.name}:{name}"][0] += ev.duration_ps / 1e6
                    by_op[f"{line.name}:{name}"][1] += 1
        total = sum(v[0] for v in by_op.values())
        lines_out += [f"## plane `{plane.name}` (lines: {line_names})",
                      f"total device op time: {total:.0f} us", ""]
        by_cat = defaultdict(float)
        for name, (us, _) in by_op.items():
            by_cat[categorize(name)] += us
        lines_out += ["| category | time (us) | % |", "|---|---|---|"]
        for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
            lines_out.append(f"| {cat} | {us:.0f} | {100*us/total:.1f} |")
        lines_out += ["", "| op | time (us) | count | % |",
                      "|---|---|---|---|"]
        for name, (us, cnt) in sorted(by_op.items(),
                                      key=lambda kv: -kv[1][0])[:40]:
            lines_out.append(
                f"| `{name[:70]}` | {us:.0f} | {cnt} | {100*us/total:.1f} |")
        lines_out.append("")
    out = "\n".join(lines_out)
    with open(os.path.join(trace_dir, "op_table.md"), "w") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    for d in sys.argv[1:] or ["results/r5/trace_tile_bf16",
                              "results/r5/trace_tile"]:
        try:
            report(d)
        except Exception as e:
            print(f"{d}: {type(e).__name__}: {e}")
