from .batch import GraphBatch, batch_np, from_arrays
from . import segment

__all__ = ["GraphBatch", "batch_np", "from_arrays", "segment"]
