from . import preprocess
from .loader import DataLoader, InfiniteLoader, collate

__all__ = ["preprocess", "DataLoader", "InfiniteLoader", "collate"]
