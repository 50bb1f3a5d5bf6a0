from .batcher import (
    choose_budgets, pack_batches, iterate_graphbatches, stack_microbatches,
)
from .zinc import (
    load_zinc, synthetic_zinc, add_lap_pe, add_full_evd, add_rwpe,
    avg_degree_stats, ZINC_NUM_ATOM_TYPE, ZINC_NUM_BOND_TYPE,
)
from .twodgrid import load_twodgrid, filter_labels, filter_response, FILTERS
from .alchemy import (
    load_alchemy, synthetic_alchemy, standardize_targets, ALCHEMY_NUM_TARGETS,
)
from .transforms import make_full_graph, make_full_graphs
from .native import native_available, GraphStore, pack_batch_native
