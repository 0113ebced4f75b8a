"""Checkpoint save/load with the reference's resume semantics.

Format (a pickle of pure-numpy pytrees) mirrors the reference layout
(/root/reference/models/netinterface.py:405-412):
  {'nets': [net_state, ...], 'optimizers': [opt_state, ...],
   'epoch': int, 'loss_eval': float, 'extra': {...}}

Resume policy (/root/reference/train.py:144-171, options_train.py:17-19):
  resume == 0   -> from scratch
  resume == -1  -> <logdir>/checkpoint.pt
  resume == -2  -> <logdir>/best.pt
  resume == N>0 -> <logdir>/nets/{N:04d}.pt

Loading an optimizer keeps the *current* LR/hyperparams
(netinterface.py:439-448 ``keep_training_params``): in the optax world the
hyperparameters live in the (static) optimizer, not its state, so loading
only the state gives the same behaviour by construction.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    """Pull device arrays to host; leave python scalars/strings untouched."""
    return jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(payload), f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def resume_path(logdir: str, resume: int) -> Optional[str]:
    if resume == 0:
        return None
    if resume == -1:
        return os.path.join(logdir, "checkpoint.pt")
    if resume == -2:
        return os.path.join(logdir, "best.pt")
    if resume > 0:
        return os.path.join(logdir, "nets", f"{resume:04d}.pt")
    raise ValueError(f"invalid resume value {resume}")
