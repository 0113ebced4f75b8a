from .state import ModelState
from .loop import Trainer
from . import loggers

__all__ = ["ModelState", "Trainer", "loggers"]
