"""MXU-based segment ops: scatter/gather as one-hot matmuls.

On TPU, `segment_sum` over random indices lowers to XLA scatter — a
VPU-serialized op.  For the padded molecular batches here (N ~ thousands,
D ~ 100) the same reduction can be written as a dense matmul with an on-the-
fly one-hot matrix, which runs on the 128x128 MXU at full tilt:

    out[n, d] = sum_e [receivers[e] == n] * msg[e, d]
              = onehot(receivers)^T @ msg

Trades FLOPs (E*N*D) for MXU throughput and removes the scatter bottleneck;
crossover depends on N — benchmarked in bench_ops.py, selected per-model via
`ops.set_aggregation_backend`.  The Pallas variant (pallas_spmm.py) blocks
the one-hot so it never materializes in HBM.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum_onehot(msg, segment_ids, num_segments, dtype=None):
    """out = onehot(segment_ids)^T @ msg — masked entries must already be 0."""
    dtype = dtype or msg.dtype
    oh = jax.nn.one_hot(segment_ids, num_segments, dtype=dtype)  # [E, N]
    return oh.T @ msg


def gather_onehot(x, indices, dtype=None):
    """x[indices] as onehot(indices) @ x."""
    dtype = dtype or x.dtype
    oh = jax.nn.one_hot(indices, x.shape[0], dtype=dtype)        # [E, N]
    return oh @ x


def spmm_onehot(x, senders, receivers, edge_mask, num_nodes,
                edge_weight=None):
    """Fused gather->weight->scatter: sum_{e: dst=n} w_e * x[src_e]."""
    msg = gather_onehot(x, senders)
    w = edge_mask if edge_weight is None else edge_mask * edge_weight
    msg = msg * w[:, None]
    return segment_sum_onehot(msg, receivers, num_nodes)
