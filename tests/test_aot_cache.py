"""AOT executable cache (utils/aot_cache.py): cold-start skip of trace+lower.

On the real chip the full Hensman epoch program round-trips (measured r3:
2.0 s load+exec vs 85.6 s trace+compile, bitwise-identical trajectory —
benchmarks/README.md). XLA:CPU's AOT loader is incomplete on real programs,
so under the CPU test backend the cache is default-disabled and these tests
cover the mechanics (keying, device restore, corruption fallback, the CPU
guard) with a trivial program where CPU AOT does work.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from lvae_tpu.data.blocks import build_subject_blocks
from lvae_tpu.models import vae as mv
from lvae_tpu.train import hensman as th
from lvae_tpu.train import state as st
from lvae_tpu.utils import aot_cache

from tests.test_training import make_cfg, tiny_cohort


def build_trainer(subjects_per_batch=3, seed=0):
    ds = tiny_cohort()
    blocks = build_subject_blocks(np.asarray(ds.labels), id_covariate=2)
    cfg = make_cfg(natural_gradient=True)
    model = mv.SimpleVAE(latent_dim=3, num_dim=20)
    z = st.init_inducing_points(np.asarray(ds.labels), 5, seed=0)
    return th.HensmanTrainer(
        model, cfg, ds, blocks, z, subjects_per_batch=subjects_per_batch,
        seed=seed,
    )


def test_aot_disabled_on_cpu_backend(tmp_path, monkeypatch):
    """Default: no artifacts on the CPU backend (XLA:CPU AOT loader is
    incomplete); training must still work through the compiled fallback."""
    monkeypatch.setenv("LVAE_AOT_CACHE", str(tmp_path))
    monkeypatch.delenv("LVAE_AOT", raising=False)
    t1 = build_trainer()
    ms = t1.run_epochs(2)
    assert np.isfinite(ms[-1].net)
    assert not any(f.endswith(".pkl") for f in os.listdir(tmp_path))


def test_aot_disabled_by_env(tmp_path, monkeypatch):
    monkeypatch.setenv("LVAE_AOT_CACHE", str(tmp_path))
    monkeypatch.setenv("LVAE_AOT", "0")
    assert not aot_cache.enabled()


def _trivial_compiled(scale: float):
    @jax.jit
    def f(x):
        return (x * scale).sum()

    x = jnp.arange(16.0)
    return f.lower(x).compile(), x


def test_aot_roundtrip_trivial_program(tmp_path, monkeypatch):
    """save() → load() restores a runnable executable on the saved device
    assignment (1 of the 8 virtual devices) with identical results."""
    monkeypatch.setenv("LVAE_AOT_CACHE", str(tmp_path))
    monkeypatch.setenv("LVAE_AOT", "force")
    compiled, x = _trivial_compiled(2.0)
    key = aot_cache.cache_key("trivial", aot_cache.avals(x))
    assert aot_cache.save(key, compiled)
    fn = aot_cache.load(key)
    assert fn is not None
    assert float(fn(x)) == float(compiled(x)) == 240.0


def test_aot_key_sensitivity(monkeypatch):
    k1 = aot_cache.cache_key("tag", "a", 3)
    assert k1 == aot_cache.cache_key("tag", "a", 3)  # stable
    assert k1 != aot_cache.cache_key("tag", "a", 4)  # static arg
    assert k1 != aot_cache.cache_key("other", "a", 3)  # tag
    x32 = jnp.zeros((4,), jnp.float32)
    x64 = jnp.zeros((4,), jnp.float64)
    assert aot_cache.avals(x32) != aot_cache.avals(x64)  # dtype in avals
    assert aot_cache.avals((x32, 5)) != aot_cache.avals((x32, 6))  # statics


def test_aot_corrupt_artifact_returns_none_and_removes(tmp_path, monkeypatch):
    monkeypatch.setenv("LVAE_AOT_CACHE", str(tmp_path))
    monkeypatch.setenv("LVAE_AOT", "force")
    path = os.path.join(str(tmp_path), "broken-key.pkl")
    with open(path, "wb") as f:
        f.write(b"not a pickle")
    assert aot_cache.load("broken-key") is None
    assert not os.path.exists(path)


def test_aot_missing_device_ids_fall_back(tmp_path, monkeypatch):
    """An artifact recorded for device ids not present here must miss."""
    import pickle

    monkeypatch.setenv("LVAE_AOT_CACHE", str(tmp_path))
    monkeypatch.setenv("LVAE_AOT", "force")
    compiled, x = _trivial_compiled(2.0)
    from jax.experimental import serialize_executable as se

    payload, in_tree, out_tree = se.serialize(compiled)
    with open(os.path.join(str(tmp_path), "alien.pkl"), "wb") as f:
        pickle.dump((payload, in_tree, out_tree, [999]), f)
    assert aot_cache.load("alien") is None


def test_aot_key_covers_baked_constants(monkeypatch):
    """Constants the trace bakes in but the avals can't see must key the
    cache (r3 review finding): block-table CONTENTS (same shapes, different
    subject ordering), the optimizer lr/kind, and module-global model
    switches. A collision here silently trains with another run's tables."""
    t = build_trainer()
    base = t._aot_key(1)
    assert base == t._aot_key(1)  # stable
    assert base != t._aot_key(2)  # chunk length

    # same-shape different-content tables
    t2 = build_trainer()
    tb = t2.tables[0]
    t2.tables = (tb._replace(index=tb.index.at[0, 0].set(tb.index[0, 1])),)
    assert t2._aot_key(1) != base

    # optimizer fingerprint (ctor arg, not a cfg field)
    t3 = build_trainer()
    t3._opt_key = (3e-4, "adam")
    assert t3._aot_key(1) != base

    # module-global model switch
    monkeypatch.setattr(mv, "use_reshape_max_pool", True)
    assert build_trainer()._aot_key(1) != base


def test_content_digest_sensitivity():
    a = jnp.asarray(np.arange(6.0).reshape(2, 3))
    b = a.at[0, 0].set(7.0)
    assert aot_cache.content_digest((a, 1)) == aot_cache.content_digest((a, 1))
    assert aot_cache.content_digest((a, 1)) != aot_cache.content_digest((b, 1))
    assert aot_cache.content_digest(a) != aot_cache.content_digest(
        a.astype(jnp.float32)
    )


def test_aot_prune_evicts_oldest_beyond_budget(tmp_path, monkeypatch):
    """save() GC: oldest-touched artifacts beyond LVAE_AOT_CACHE_GB go,
    the just-saved key stays even if the budget is exceeded."""
    import os
    import time

    from lvae_tpu.utils import aot_cache

    monkeypatch.setenv("LVAE_AOT_CACHE", str(tmp_path))
    # 3 x 1 MB artifacts against a 2.5 MB budget
    monkeypatch.setenv("LVAE_AOT_CACHE_GB", str(2.5e6 / 1e9))
    blob = b"x" * 1_000_000
    for i, name in enumerate(["old", "mid", "new"]):
        p = tmp_path / f"{name}.pkl"
        p.write_bytes(blob)
        os.utime(p, (time.time() - 100 + i, time.time() - 100 + i))
    aot_cache._prune(str(tmp_path), keep="new")
    left = sorted(f.name for f in tmp_path.glob("*.pkl"))
    assert "new.pkl" in left and "old.pkl" not in left
    # total now within budget
    assert sum(f.stat().st_size for f in tmp_path.glob("*.pkl")) <= 2.5e6

    # the keep key survives even when it alone exceeds the budget
    monkeypatch.setenv("LVAE_AOT_CACHE_GB", str(0.5e6 / 1e9))
    aot_cache._prune(str(tmp_path), keep="new")
    assert [f.name for f in tmp_path.glob("*.pkl")] == ["new.pkl"]


def test_xla_cache_prune_budget(tmp_path, monkeypatch):
    """enable_compile_cache's XLA-layer GC (LVAE_XLA_CACHE_GB): evicts
    oldest-touched top-level entries beyond the budget, never touches the
    AOT subdirectory (it has its own GC)."""
    import os
    import time

    from lvae_tpu.utils import compile_cache as cc

    d = tmp_path / "xla"
    (d / "aot").mkdir(parents=True)
    (d / "aot" / "keep.pkl").write_bytes(b"x" * 1024)
    for i in range(5):
        p = d / f"e{i}-cache"
        p.write_bytes(b"x" * 1_000_000)
        os.utime(p, (time.time() - 100 + i,) * 2)
    monkeypatch.setenv("LVAE_XLA_CACHE_GB", str(3e-3))  # 3 MB budget
    cc._prune(str(d))
    assert sorted(os.listdir(d)) == ["aot", "e2-cache", "e3-cache", "e4-cache"]
    assert (d / "aot" / "keep.pkl").exists()
