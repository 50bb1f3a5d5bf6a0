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

# Persistent XLA compilation cache: the flagship programs take O(100 s) to
# compile on a tunneled TPU backend, and the protocol sweeps re-run the same
# HLO across seeds.  Opt out with SIGNNET_TPU_NO_COMPILE_CACHE=1.
import os as _os

if not _os.environ.get("SIGNNET_TPU_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        _cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), ".jax_cache"))
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
