"""Persistent XLA compilation cache setup shared by the benchmark drivers.

Remote-chip compiles are expensive and wildly variable (10s-450s for the
same program), so every standalone driver (bench.py, the accuracy/AUROC
harnesses, the serving benchmark) enables the on-disk cache: repeated and
swept runs then skip recompiles entirely.
"""

from __future__ import annotations

import os

# Wipe-proof default (VERDICT r3 item 2): /tmp is cleared between sessions,
# which turned the 0.5 s warm start into a 220 s cold record in BENCH_r03.
# The repo directory itself persists across sessions, so the cache lives in
# a gitignored repo-local .cache/ next to the package; env-overridable via
# JAX_COMPILATION_CACHE_DIR.
_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
DEFAULT_CACHE = os.path.join(_REPO_ROOT, ".cache", "jax")


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (or
    ``$JAX_COMPILATION_CACHE_DIR``, or the default). Returns the directory
    in use, or None when setup failed (never raises — a benchmark must not
    die over a cache)."""
    cache = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_CACHE)
    try:
        import jax

        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache
    except Exception:  # noqa: BLE001
        return None
