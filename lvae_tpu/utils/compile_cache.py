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
        _prune(cache)
        return cache
    except Exception:  # noqa: BLE001
        return None


def _prune(cache: str) -> None:
    """Size-budget eviction for the XLA layer: unlike the AOT layer
    (aot_cache._prune), JAX never evicts persistent-cache entries, and a
    durable repo-local cache accumulates stale-HLO entries forever. Evict
    least-recently-USED top-level entries beyond ``LVAE_XLA_CACHE_GB``
    (default 10). JAX does not touch mtime on cache hits (only writes set
    it), so recency is ``max(atime, mtime)``: a hit READS the file, and on
    the usual relatime mounts that refreshes atime at >=24 h granularity —
    approximate LRU, not the oldest-written FIFO that plain mtime would
    give (a hot entry compiled early would then be evicted before cold
    recent ones, costing a 10-450 s recompile). On noatime mounts this
    degrades to FIFO; size LVAE_XLA_CACHE_GB generously there.
    Subdirectories (the AOT store) are left to their own GC. Never
    raises."""
    try:
        budget = float(os.environ.get("LVAE_XLA_CACHE_GB", "10")) * 1e9
        entries = []
        for name in os.listdir(cache):
            p = os.path.join(cache, name)
            if not os.path.isfile(p):
                continue
            st = os.stat(p)
            entries.append((max(st.st_atime, st.st_mtime), st.st_size, p))
        total = sum(e[1] for e in entries)
        for _, size, p in sorted(entries):
            if total <= budget:
                break
            try:
                os.unlink(p)
                total -= size
            except OSError:
                pass
    except Exception:  # noqa: BLE001
        pass
