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


# ---------------------------------------------------------------------------
# Destination-partitioned schemes: nodes sharded [N/mp, D]; each device owns
# the edges whose destination lies in its node shard (a contiguous range of
# the destination-sorted edge array).  Two boundary-feature strategies:
#
# 1. `halo_edge_aggregate` — all-gather the node-feature shards over ICI
#    (the boundary exchange; moves N*D/mp bytes per device per hop), gather
#    sources from the gathered buffer, segment-sum locally into the owned
#    shard.  Compute AND output memory scale 1/mp; correct for any partition.
# 2. `tile_aligned_aggregate` — with the tile-local batch layout
#    (graph.batch.batch_np(tile=bn)) and shard boundaries on tile boundaries,
#    every edge's source lives on the destination's device by construction:
#    ZERO collectives in the forward pass.  The halo is empty because the
#    *layout* made it empty — partition-by-construction instead of halo
#    bookkeeping (SURVEY.md §2.5 / §7 step 8).
#
# `partition_edges_by_dst` builds the static per-device edge shards host-side.
# ---------------------------------------------------------------------------


def partition_edges_by_dst(arrays: dict, mp: int) -> dict:
    """Split a batch's (dst-sorted) edges into `mp` per-device shards.

    Returns senders/receivers/edge_mask reshaped to [mp, E_shard] with
    per-shard padding (zero-mask self-edges on the device's first node), so
    `shard_map` over the leading axis sees one static shard shape.
    """
    N = arrays["node_mask"].shape[0]
    if N % mp != 0:
        raise ValueError(f"num_nodes {N} not divisible by mp={mp}")
    shard_n = N // mp
    senders = np.asarray(arrays["senders"])
    receivers = np.asarray(arrays["receivers"])
    emask = np.asarray(arrays["edge_mask"])
    bounds = np.searchsorted(receivers, np.arange(mp + 1) * shard_n)
    e_shard = int(-(-max((bounds[1:] - bounds[:-1]).max(), 1) // 8) * 8)
    S = np.zeros((mp, e_shard), np.int32)
    R = np.zeros((mp, e_shard), np.int32)
    M = np.zeros((mp, e_shard), np.float32)
    for d in range(mp):
        lo, hi = bounds[d], bounds[d + 1]
        n = hi - lo
        S[d, :n] = senders[lo:hi]
        R[d, :n] = receivers[lo:hi]
        M[d, :n] = emask[lo:hi]
        S[d, n:] = d * shard_n      # padding: in-shard self-edge, zero mask
        R[d, n:] = d * shard_n
    return {"senders": S, "receivers": R, "edge_mask": M}


def halo_edge_aggregate(mesh: Mesh, axis: str = "mp"):
    """Destination-partitioned aggregation with an all-gather boundary
    exchange.  Inputs: x sharded [N/mp, D] over `axis`; per-device edge
    shards from `partition_edges_by_dst` (leading axis sharded)."""
    mp = mesh.shape[axis]

    def worker(x_shard, senders, receivers, edge_mask):
        d = jax.lax.axis_index(axis)
        shard_n = x_shard.shape[1]
        # boundary exchange over ICI: every device gets all shards
        x_full = jax.lax.all_gather(x_shard[0], axis, tiled=True)
        msg = x_full[senders[0]] * edge_mask[0][:, None]
        local_dst = receivers[0] - d * shard_n
        out = jax.ops.segment_sum(msg, local_dst, num_segments=shard_n)
        return out[None]

    def aggregate(x, senders, receivers, edge_mask):
        f = jax.shard_map(
            worker, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(axis), check_vma=False)
        shard_n = x.shape[0] // mp
        out = f(x.reshape(mp, shard_n, -1), senders, receivers, edge_mask)
        return out.reshape(x.shape[0], -1)

    return aggregate


def tile_aligned_aggregate(mesh: Mesh, axis: str = "mp"):
    """Zero-collective destination-partitioned aggregation for tile-local
    layouts: requires every edge's endpoints in the same node shard (true
    when the batch was packed with batch_np(tile=bn) and N/mp is a multiple
    of bn).  Forward pass touches no interconnect at all."""
    mp = mesh.shape[axis]

    def worker(x_shard, senders, receivers, edge_mask):
        d = jax.lax.axis_index(axis)
        shard_n = x_shard.shape[1]
        base = d * shard_n
        msg = x_shard[0][senders[0] - base] * edge_mask[0][:, None]
        out = jax.ops.segment_sum(msg, receivers[0] - base,
                                  num_segments=shard_n)
        return out[None]

    def aggregate(x, senders, receivers, edge_mask):
        f = jax.shard_map(
            worker, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(axis), check_vma=False)
        shard_n = x.shape[0] // mp
        out = f(x.reshape(mp, shard_n, -1), senders, receivers, edge_mask)
        return out.reshape(x.shape[0], -1)

    return aggregate
