from causal_gen_tpu.train.state import (
    TrainState,
    clip_by_global_norm,
    global_norm,
    init_train_state,
    make_optimizer,
)
from causal_gen_tpu.train.vae_trainer import (
    init_model_params,
    make_eval_step,
    make_train_step,
    preprocess_x,
    run_epoch,
    train,
)

__all__ = [
    "TrainState",
    "init_train_state",
    "make_optimizer",
    "global_norm",
    "clip_by_global_norm",
    "make_train_step",
    "make_eval_step",
    "init_model_params",
    "preprocess_x",
    "run_epoch",
    "train",
]
