from tinydiffusion_tpu.train.trainer import (
    DiffusionTrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)

__all__ = [
    "DiffusionTrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
