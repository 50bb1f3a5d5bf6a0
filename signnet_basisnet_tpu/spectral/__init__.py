from .laplacian import (
    adjacency_dense_np, sym_laplacian_np, unnormalized_laplacian_np,
    sym_laplacian_dense, unnormalized_laplacian_dense, dense_adjacency_from_graph,
)
from .eigh import (
    eigh_np, lap_pe_np, full_evd_np, rwpe_np, masked_eigh, batched_masked_eigh,
    canonical_sign, canonical_sign_np, PAD_EIGVAL,
)
from .projectors import (
    EigenspaceLayout, eigenspace_layout, projectors_by_multiplicity,
    round_eigvals, prop_higher_mult,
)
