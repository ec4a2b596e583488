from .state import TrainState, create_train_state, make_optimizer
from .step import (
    LossConfig,
    compute_depth,
    compute_pose_with_inv,
    make_train_step,
    make_eval_step,
    make_eval_depth_step,
    make_inference_fn,
)
from .checkpoint import (
    save_checkpoint,
    restore_train_state,
    load_model_variables,
    model_variables,
    OrbaxCheckpointManager,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "LossConfig",
    "compute_depth",
    "compute_pose_with_inv",
    "make_train_step",
    "make_eval_step",
    "make_eval_depth_step",
    "make_inference_fn",
    "save_checkpoint",
    "restore_train_state",
    "load_model_variables",
    "model_variables",
    "OrbaxCheckpointManager",
]
