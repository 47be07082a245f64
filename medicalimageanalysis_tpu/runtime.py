"""JAX runtime defaults applied once, lazily, by the compute packages.

A persistent compilation cache matters far more here than on local
hardware: against a tunneled TPU every cold compile is a multi-minute
remote round trip, so a fresh process re-paying it per entry point
(ingest, registration, DVH) dominates wall time. Any cache dir the
user (or bench.py) already configured wins.
"""

from __future__ import annotations

import os

_done = False


def setup_jax_cache():
    """Idempotent: set a persistent compile cache unless one exists."""
    global _done
    if _done:
        return
    _done = True
    try:
        import jax
        current = getattr(jax.config, "jax_compilation_cache_dir", None)
        if current is None:
            cache = os.environ.get(
                "MIA_JAX_CACHE", os.path.expanduser("~/.cache/jax_mia"))
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        # never fail an import over a cache nicety
        pass
