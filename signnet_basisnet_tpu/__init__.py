"""signnet_basisnet_tpu — a TPU-native (JAX/XLA/Pallas) framework for sign- and
basis-invariant spectral graph networks (SignNet / BasisNet) and their base GNNs.

Built from scratch against the capabilities of the reference repo
cptq/SignNet-BasisNet (PyTorch/DGL/PyG); see SURVEY.md for the component map.
The compute path is pure JAX (jit/vmap/pjit + Pallas kernels); graphs are
fixed-shape padded batches so everything compiles to static-shape XLA programs.

Subpackages
-----------
graph     : padded batched-graph structure + segment ops (the message-passing core)
spectral  : Laplacians, eigendecomposition pipeline, eigenspace projectors
nn        : neural-net building blocks (masked BN/LN, MLPs, DeepSets, IGN, set transformer)
models    : invariance layers (SignNet/BasisNet) and base GNNs (GIN/GINE/GatedGCN/GAT/PNA/Transformer)
ops       : Pallas TPU kernels (fused SpMM-style aggregation, segment softmax) with XLA references
parallel  : device meshes, data-parallel and edge-partitioned training
data      : dataset loaders (ZINC, Alchemy, 2D-grid filters) + pad-and-bucket batcher
training  : config system, optimizers/schedules, train/eval loops, checkpointing, metrics
"""

__version__ = "0.1.0"
