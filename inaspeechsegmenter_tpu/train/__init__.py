from .data import ENGINES, class_weights, patch_dataset
from .trainer import Trainer, param_shardings

__all__ = ["Trainer", "param_shardings", "patch_dataset", "class_weights",
           "ENGINES"]
