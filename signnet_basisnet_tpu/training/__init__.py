from .config import Config, TrainConfig, ModelConfig, DataConfig, load_config
from .optim import adam, scale_updates, ReduceLROnPlateau, StepLR
from . import metrics
from .train import (
    TrainState, create_state, build_steps, make_zinc_predict,
    make_module_predict, make_lapeig_loss_fn, fit, evaluate, count_params,
    l1_graph_loss, FitResult, k_fold_split, run_k_fold, KFoldResult,
)
from .checkpoint import Checkpointer
