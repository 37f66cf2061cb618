"""Persistent XLA compile cache for the CLI tools.

Remote-TPU compiles take 20-240 s per program; every tool entry point calls
``enable_compile_cache()`` so a recipe's second run (and every later stage
sharing a geometry) skips them.  Opt out with ``DSRG_TPU_CACHE_DIR=""``.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str | None:
    if path is None:
        path = os.environ.get(
            "DSRG_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "dsrg_tpu_xla"),
        )
    if not path:
        return None
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:  # older jax or readonly fs: cache is best-effort
        return None
    return path
