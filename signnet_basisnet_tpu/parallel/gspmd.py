"""GSPMD sharding of the unmodified train step.

The pjit recipe (How to Scale Your Model): pick a mesh, annotate the input
shardings, and let XLA's SPMD partitioner insert the collectives.  Unlike
`data_parallel.py` (manual shard_map + psum) and `edge_partition.py`
(hand-written boundary exchange), nothing about the model changes here — the
same `build_steps` train_step is jitted with `in_shardings` that place the
node/edge axes of the GraphBatch on the mesh; XLA partitions every
gather/segment-sum and inserts the all-gathers/reduce-scatters it needs.

This is the low-effort scaling path for graphs too large for one chip; the
manual schemes remain for cases where the partitioner's choices are
suboptimal (they make the boundary traffic explicit and overlappable).
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.batch import GraphBatch


def graphbatch_shardings(mesh: Mesh, gb: GraphBatch, axis: str = "mp"):
    """NamedSharding pytree for a GraphBatch: node- and edge-indexed arrays
    sharded on their leading axis over `axis`, per-graph arrays replicated.

    Leading-axis lengths must divide the axis size (the batcher's budgets
    are aligned; pass align=mesh size multiples via choose_budgets)."""
    n_nodes = gb.node_mask.shape[0]
    n_edges = gb.edge_mask.shape[0]
    size = mesh.shape[axis]

    def spec_for(leaf):
        if leaf is None or not hasattr(leaf, "shape") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        lead = leaf.shape[0]
        if lead in (n_nodes, n_edges) and lead % size == 0:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, gb)


def build_gspmd_steps(predict, tx, mesh: Mesh, example_gb: GraphBatch,
                      axis: str = "mp", loss_fn=None):
    """(train_step, eval_step) = the ordinary single-device steps jitted with
    GSPMD shardings over `mesh`; params/opt state replicated."""
    from ..training.train import build_steps

    kwargs = {} if loss_fn is None else {"loss_fn": loss_fn}
    train_step, eval_step = build_steps(predict, tx, donate=False, **kwargs)
    gb_shard = graphbatch_shardings(mesh, example_gb, axis)
    repl = NamedSharding(mesh, P())

    train = jax.jit(train_step,
                    in_shardings=(repl, gb_shard, repl, repl))
    ev = jax.jit(eval_step, in_shardings=(repl, gb_shard))
    return train, ev
