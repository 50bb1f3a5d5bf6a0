from .mesh import make_mesh, dp_sharding, replicated, init_distributed
from .data_parallel import build_dp_steps
from .edge_partition import (edge_sharded_aggregate, pad_edges_for,
                             partition_edges_by_dst, halo_edge_aggregate,
                             tile_aligned_aggregate)
from .gspmd import build_gspmd_steps, graphbatch_shardings
