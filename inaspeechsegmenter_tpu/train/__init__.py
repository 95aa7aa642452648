from .trainer import Trainer, param_shardings

__all__ = ["Trainer", "param_shardings"]
