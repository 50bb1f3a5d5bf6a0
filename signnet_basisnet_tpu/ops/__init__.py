from .segment_matmul import segment_sum_onehot, gather_onehot, spmm_onehot
from .pallas_spmm import (spmm_pallas, spmm_reference, spmm_tiled,
                          tile_edge_ranges, pad_edges_to)
from .pallas_attention import (edge_softmax_attention_reference,
                               edge_softmax_attention_tiled)
from .pallas_gatedgcn import gatedgcn_gate_reference, gatedgcn_gate_tiled
from .tile_dense import spmm_tile_dense, tile_block_adj
