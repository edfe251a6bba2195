"""Training layer: jitted GAN step, trainer, checkpointing."""

from pdgn_tpu.train.train_step import (
    GANState,
    NetState,
    TrainConfig,
    init_state,
    make_optimizer,
    make_batched_sampler,
    make_sampler,
    make_train_step,
)
from pdgn_tpu.train.trainer import (
    ExperimentConfig,
    PDGNTrainer,
    normalize_point_clouds,
)

__all__ = [
    "ExperimentConfig",
    "GANState",
    "NetState",
    "PDGNTrainer",
    "TrainConfig",
    "init_state",
    "make_optimizer",
    "make_batched_sampler",
    "make_sampler",
    "make_train_step",
    "normalize_point_clouds",
]
