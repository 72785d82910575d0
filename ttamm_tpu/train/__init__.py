from .checkpoint import load_checkpoint, save_checkpoint
from .sharded_checkpoint import (
    load_sharded_checkpoint,
    save_sharded_checkpoint,
)
from .optim import (
    DenseOptConfig,
    DenseOptState,
    dense_opt_update,
    init_dense_opt,
    parse_dense_opt_config,
)
from .state import BatchData, TrainState, create_train_state
from .step import (
    TrainStepConfig,
    encode_corpus,
    make_eval_loss_step,
    make_train_step,
)

__all__ = [
    "BatchData",
    "DenseOptConfig",
    "DenseOptState",
    "TrainState",
    "TrainStepConfig",
    "create_train_state",
    "dense_opt_update",
    "encode_corpus",
    "init_dense_opt",
    "load_checkpoint",
    "load_sharded_checkpoint",
    "make_eval_loss_step",
    "make_train_step",
    "parse_dense_opt_config",
    "save_checkpoint",
    "save_sharded_checkpoint",
]
