"""Profiling: per-step timing, edges/s counters, jax.profiler traces.

The reference only had wall-clock epoch timing (SURVEY.md §5); here the
north-star metric (edges/s per chip) is first-class.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class Throughput:
    """Accumulates (edges, nodes, graphs, seconds) across steps."""

    def __init__(self):
        self.edges = 0.0
        self.nodes = 0.0
        self.graphs = 0.0
        self.seconds = 0.0
        self.steps = 0

    def add(self, gb, seconds: float) -> None:
        import numpy as np
        self.edges += float(np.asarray(gb.edge_mask).sum())
        self.nodes += float(np.asarray(gb.node_mask).sum())
        self.graphs += float(np.asarray(gb.graph_mask).sum())
        self.seconds += seconds
        self.steps += 1

    @property
    def edges_per_s(self) -> float:
        return self.edges / max(self.seconds, 1e-9)

    def summary(self) -> dict:
        s = max(self.seconds, 1e-9)
        return dict(edges_per_s=self.edges / s, nodes_per_s=self.nodes / s,
                    graphs_per_s=self.graphs / s,
                    step_ms=1e3 * self.seconds / max(self.steps, 1))


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed():
    t0 = time.perf_counter()
    box = {}
    yield box
    box["seconds"] = time.perf_counter() - t0


def device_memory_stats(device=None) -> dict:
    """Per-device memory stats in MB — the TPU analog of the reference's
    torch.cuda.max_memory_allocated/reserved epoch logging (reference:
    GINESignNetPyG/core/train.py:40-41,63).

    Returns {} on backends that don't expose memory_stats (e.g. CPU).
    """
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:  # noqa: BLE001 - backend-dependent availability
        return {}
    if not stats:
        return {}
    mb = 1024 ** 2
    out = {}
    for key in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit",
                "largest_alloc_size"):
        if key in stats:
            out[key.replace("bytes", "mb")] = stats[key] / mb
    return out


def log_memory(logger=None, device=None, prefix: str = "") -> dict:
    stats = device_memory_stats(device)
    if stats:
        msg = prefix + " ".join(f"{k}={v:.1f}MB" for k, v in stats.items())
        (logger or print)(msg)
    return stats
