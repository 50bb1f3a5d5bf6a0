"""Edge-partitioned message passing — model parallelism for huge graphs.

The structural analog of sequence parallelism for GNNs (SURVEY.md §2.5): the
padded edge array is sharded across the 'mp' mesh axis; node features are
replicated; each device gathers its edge shard's sources, computes messages,
and segment-sums into a *partial* node accumulator; one `psum` over 'mp'
(ICI) combines partials.  Compute scales 1/mp per device with one collective
per aggregation — the boundary-exchange of a partition-based scheme without
halo bookkeeping, correct for arbitrary partitions.

`shard_edges` pads E to a multiple of the axis size so the per-device shard
shape is static.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def pad_edges_for(mesh_axis_size: int, arrays: dict) -> dict:
    """Pad senders/receivers/edge_mask/etc to a multiple of the axis size."""
    E = arrays["senders"].shape[0]
    target = -(-E // mesh_axis_size) * mesh_axis_size
    if target == E:
        return arrays
    pad = target - E
    out = dict(arrays)
    for key in ("senders", "receivers"):
        out[key] = np.concatenate(
            [arrays[key], np.full(pad, arrays[key].max(), arrays[key].dtype)])
    for key in ("edge_mask",):
        out[key] = np.concatenate([arrays[key], np.zeros(pad, np.float32)])
    return out


def edge_sharded_aggregate(mesh: Mesh, axis: str = "mp"):
    """Returns aggregate(x, senders, receivers, edge_mask, num_nodes) with the
    edge axis sharded over `axis` and a psum combining partial node sums."""

    def worker(x, senders, receivers, edge_mask, num_nodes: int):
        msg = x[senders] * edge_mask[:, None]
        partial_sum = jax.ops.segment_sum(msg, receivers,
                                          num_segments=num_nodes)
        return jax.lax.psum(partial_sum, axis)

    def aggregate(x, senders, receivers, edge_mask, num_nodes: int):
        f = jax.shard_map(
            partial(worker, num_nodes=num_nodes), mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=P(), check_vma=False)
        return f(x, senders, receivers, edge_mask)

    return aggregate
