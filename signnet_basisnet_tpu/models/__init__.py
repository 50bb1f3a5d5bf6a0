from .conv import (
    GINConv, GINEConv, MaskedGINConv, MaskedGINEConv, GCNConv, GATConv,
    GatedGCNLayer,
    PNATower, PNALayer, SimplifiedPNAConv, GraphTransformerAttention,
    GraphTransformerLayer, neighbor_sum, pna_aggregate, pna_scale,
)
from .signnet import (
    SignNet, GNN3d, SignPlus, GINDeepSigns, MaskedGINDeepSigns, GCNDeepSigns,
    TransformerDeepSigns, sign_fuse, sign_unfuse,
)
from .basisnet import IGNBasisInv, IGNShared, basis_features
from .gnn import GNN, SignNetGNN, make_conv
from .pe import apply_lap_method, sign_flip, abs_val, canonical
from .zinc_models import (
    GatedGCNNet, GINNet, GATNet, PNANet, TransformerNet, MODEL_REGISTRY,
    gnn_model, lapeig_loss, normalize_p,
)
from .baselines import NetGINE, GINEBondConv
from . import spectral_filters
from .spectral_filters import FILTER_MODEL_REGISTRY
