from .batch import (GraphBatch, batch_np, from_arrays, to_dense_nodes,
                    from_dense_nodes, dense_node_index, tile_first_fit)
from . import segment

__all__ = ["GraphBatch", "batch_np", "from_arrays", "segment"]
