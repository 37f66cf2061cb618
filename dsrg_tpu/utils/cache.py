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
    try:
        # By default jax ALSO derives a GPU-autotune cache path from the
        # cache dir and embeds it in the XLA debug_options, which are hashed
        # into every cache key — so entries become keyed to the cache dir's
        # PATH (different dir or host => guaranteed miss; root-caused via
        # protoc --decode_raw on the hashed CompileOptions, field 310).
        # The feature is GPU-only — meaningless on the CPU/TPU backends this
        # project runs — so disable it: keys become portable across cache
        # dirs and hosts, which the committed dryrun seed
        # (recipes/dryrun_cache/) and the .jax_cache/~/.cache split rely on.
        jax.config.update("jax_persistent_cache_enable_xla_caches", "")
    except Exception:
        pass
    return path
