"""Persistent XLA compilation cache setup.

Full-model compiles over the axon tunnel take tens of minutes; the
persistent cache drops repeat compiles to seconds.  Called by the CLIs,
bench, and the graft entry points.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    path = path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
