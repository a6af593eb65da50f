from ghost_tpu.train.losses import (
    hinge_g_loss,
    hinge_d_loss,
    id_cosine_loss,
    attr_loss,
    reconstruction_loss,
    eye_heatmap_loss,
    teacher_residual_loss,
    multi_round_loss,
    round_trip_loss,
    GeneratorLossWeights,
)
from ghost_tpu.train.train_step import TrainState, make_train_steps, TrainStepConfig

__all__ = [
    "hinge_g_loss",
    "hinge_d_loss",
    "id_cosine_loss",
    "attr_loss",
    "reconstruction_loss",
    "eye_heatmap_loss",
    "teacher_residual_loss",
    "multi_round_loss",
    "round_trip_loss",
    "GeneratorLossWeights",
    "TrainState",
    "make_train_steps",
    "TrainStepConfig",
]
