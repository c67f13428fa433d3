from . import dataset, error_recycling, lora, trainer
from .error_recycling import ErrorBuffers
from .trainer import ErrorRecyclingTrainer, TrainerConfig, make_train_step

__all__ = [
    "dataset",
    "error_recycling",
    "lora",
    "trainer",
    "ErrorBuffers",
    "ErrorRecyclingTrainer",
    "TrainerConfig",
    "make_train_step",
]
