"""Device mesh helpers.

The reference has no distributed code at all (SURVEY.md §2.5); scaling here
is JAX-native: a Mesh with a data axis ('dp', graph microbatches) and a model
axis ('mp', edge partitions of each graph batch), collectives lowered by XLA
onto ICI.  Multi-host init goes through `jax.distributed.initialize`.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, mp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // mp
    if dp * mp != n:
        raise ValueError(f"dp*mp = {dp * mp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, axis_names=("dp", "mp"))


def dp_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for stacked microbatches."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host initialization (no-op when single-process)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
