from .init import Linear, Embedding, ACTIVATIONS
from .norm import MaskedBatchNorm, MaskedLayerNorm
from .mlp import MLP, ElementsMLP, MaskedMLP, MLPReadout
from .encoders import DiscreteEncoder
from .deepsets import EqDeepSetsEncoder
from .ign import (
    IGN2to1, EquivariantLayer, BasicEquivariantLayer,
    contractions_2_to_2, contractions_2_to_1, contractions_1_to_2,
    contractions_1_to_1,
)
from .set_transformer import (
    SetTransformer, TransformerEncoderLayer, MultiHeadAttention,
    PositionwiseFeedForward, PositionalEncoding,
)
from .set2set import Set2Set, GRUStep, S2SReadout
