from ..core.registry import get_model
from .base import ModelBase, default_opt

__all__ = ["get_model", "ModelBase", "default_opt"]
