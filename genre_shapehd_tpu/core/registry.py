"""Model / dataset registries.

Counterpart of /root/reference/models/__init__.py:4-9 and
datasets/__init__.py:4-6 (importlib alias dispatch), with explicit
registration instead of import-by-name so typos fail loudly and
discovery is greppable.
"""

from __future__ import annotations

import importlib
from typing import Dict, Type

_MODEL_MODULES: Dict[str, str] = {
    "marrnet1": "genre_shapehd_tpu.models.marrnet1",
    "marrnet2": "genre_shapehd_tpu.models.marrnet2",
    "marrnet": "genre_shapehd_tpu.models.marrnet",
    "wgangp": "genre_shapehd_tpu.models.wgangp",
    "shapehd": "genre_shapehd_tpu.models.shapehd",
    "depth_pred_with_sph_inpaint": "genre_shapehd_tpu.models.depth_inpaint",
    "genre_full_model": "genre_shapehd_tpu.models.genre_full",
}

_DATASET_MODULES: Dict[str, str] = {
    "shapenet": "genre_shapehd_tpu.data.shapenet",
    "test": "genre_shapehd_tpu.data.testset",
    "synthetic": "genre_shapehd_tpu.data.synthetic",
    "procedural": "genre_shapehd_tpu.data.procedural",
}


def get_model(alias: str, test: bool = False) -> Type:
    """Return the Model (or Model_test) class registered under ``alias``."""
    if alias not in _MODEL_MODULES:
        raise KeyError(
            f"unknown model '{alias}'; available: {sorted(_MODEL_MODULES)}")
    mod = importlib.import_module(_MODEL_MODULES[alias])
    return getattr(mod, "ModelTest" if test else "Model")


def get_dataset(alias: str) -> Type:
    if alias not in _DATASET_MODULES:
        raise KeyError(
            f"unknown dataset '{alias}'; available: {sorted(_DATASET_MODULES)}")
    mod = importlib.import_module(_DATASET_MODULES[alias])
    return getattr(mod, "Dataset")


def model_aliases():
    return sorted(_MODEL_MODULES)


def dataset_aliases():
    return sorted(_DATASET_MODULES)
