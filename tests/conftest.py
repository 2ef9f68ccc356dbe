"""Test configuration: CPU backend, 8 virtual devices for sharding tests, x64.

The environment's axon sitecustomize force-registers a TPU backend and sets
``jax_platforms='axon,cpu'`` at interpreter start, so overriding the env var
is not enough — we must update the jax config after import. XLA_FLAGS must be
in place before the CPU backend initialises (first device use).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Suite wall time is compile-dominated; the persistent cache makes repeat
# runs (CI/driver and local iteration) skip recompiles entirely. Repo-local
# (gitignored .cache/) so it survives the between-session /tmp wipes that
# cold-started round 3.
_cache = os.environ.get(
    "JAX_TEST_COMPILATION_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "jax-tests"),
)
if _cache:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "sharding tests expect 8 virtual CPU devices"
