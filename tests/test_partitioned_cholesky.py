"""The batched Pallas Cholesky is self-partitioning inside mesh traces.

kernels_pallas/cholesky.py declares a custom_partitioning rule (batch dims
passthrough, matrix dims replicated) so multi-device mesh programs keep the
kernel, launched on each device's local shard, instead of pinning the XLA
Cholesky like the non-partitionable fast paths do. These tests prove on the
8-virtual-device CPU mesh (kernel in interpret mode):

- values == the XLA reference on 4x2 / 2x1 meshes, rank-3 and rank-4 stacks,
  with the operand sharding preserved on both outputs;
- the per-shard lowering really sees LOCAL batch shapes;
- a sharded Hensman epoch routed through the partitioned kernel matches the
  plain XLA trainer trajectory;
- gradients through cholesky_and_inverse match under the mesh route;
- the divisibility guard replicates batch dims the mesh axis cannot split
  (a padded local shard would not be SPD).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from lvae_tpu.kernels_pallas import cholesky as kc
from lvae_tpu.ops import linalg as la
from lvae_tpu.parallel.mesh import make_mesh


def _spd(shape, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=shape), dtype)
    n = shape[-1]
    return x @ jnp.swapaxes(x, -1, -2) + 3.0 * jnp.eye(n, dtype=dtype)


def _force_partitioned(monkeypatch):
    """CPU test posture: gate passes, per-shard kernel runs in interpret."""
    monkeypatch.setattr(kc, "_use_pallas", lambda a, max_n=64: True)
    monkeypatch.setattr(kc, "_partition_interpret", True)


@pytest.fixture
def no_compile_cache():
    """The partition callbacks run during backend compilation — a program
    served from the persistent cache (or an earlier in-process jit of the
    same avals+shardings) never re-invokes them, so spy-based tests must
    compile fresh."""
    old = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    yield
    jax.config.update("jax_enable_compilation_cache", old)


@pytest.mark.parametrize(
    "shape,spec,mesh_shape",
    [
        ((4, 8, 6, 6), P("latent", "data"), (4, 2)),
        ((4, 6, 6), P("latent"), (1, 2)),
        ((8, 5, 5), P("data"), (4, 1)),
    ],
)
def test_partitioned_matches_reference(monkeypatch, shape, spec, mesh_shape):
    _force_partitioned(monkeypatch)
    data, latent = mesh_shape
    mesh = make_mesh(data, latent)
    a = _spd(shape)
    l_ref = jnp.linalg.cholesky(a)
    inv_ref = jnp.linalg.inv(a)

    a_sh = jax.device_put(a, NamedSharding(mesh, spec))
    with mesh, la.pallas_suppressed():
        l, inv = jax.jit(la.cholesky_and_inverse)(a_sh)

    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(inv), np.asarray(inv_ref), rtol=2e-5, atol=2e-6
    )
    # both outputs keep the operand's batch placement
    ndim = len(shape)
    want = tuple(spec) + (None,) * (ndim - len(spec))
    for out in (l, inv):
        got = tuple(out.sharding.spec) + (None,) * (ndim - len(out.sharding.spec))
        assert got == want


def test_lowering_sees_local_shards(monkeypatch, no_compile_cache):
    _force_partitioned(monkeypatch)
    jax.clear_caches()  # in-process executable reuse also skips the callbacks
    shapes = []
    orig = kc._chol_inv_direct

    def spy(a, interpret=False):
        shapes.append(a.shape)
        return orig(a, interpret)

    monkeypatch.setattr(kc, "_chol_inv_direct", spy)
    mesh = make_mesh(4, 2)
    a = _spd((4, 8, 6, 6))
    a_sh = jax.device_put(a, NamedSharding(mesh, P("latent", "data")))
    with mesh, la.pallas_suppressed():
        l, _ = jax.jit(la.cholesky_and_inverse)(a_sh)
    l.block_until_ready()
    # the partitioner lowered per-shard: latent 4/2, data 8/4
    assert (2, 2, 6, 6) in shapes, shapes


def test_sharded_hensman_epoch_runs_partitioned_kernel(monkeypatch, no_compile_cache):
    """End-to-end: the mesh-traced Hensman epoch keeps the Cholesky kernel
    (per-shard, interpret) and reproduces the plain XLA trainer's metrics."""
    import lvae_tpu.ops.kernels as kx
    from lvae_tpu.parallel.mesh import ShardedHensmanTrainer
    from tests.test_pallas_mesh_gate import _tiny_hensman

    # pin the fused B-chain OFF: under LVAE_BCHAIN=1 the [L,S,T,T] B blocks
    # route through kernels_pallas/b_chain.py and never reach this kernel
    # (that composition is tests/test_partitioned_b_chain.py's job)
    monkeypatch.setattr(kx, "use_pallas_b_chain", False)

    plain = _tiny_hensman()
    m0 = plain.run_epoch()

    _force_partitioned(monkeypatch)
    jax.clear_caches()  # in-process executable reuse also skips the callbacks
    shapes = []
    orig = kc._chol_inv_direct

    def spy(a, interpret=False):
        shapes.append(a.shape)
        return orig(a, interpret)

    monkeypatch.setattr(kc, "_chol_inv_direct", spy)
    sharded = ShardedHensmanTrainer(_tiny_hensman(), make_mesh(2, 1))
    m1 = sharded.run_epoch()

    assert shapes, "mesh trace never reached the partitioned kernel"
    # the minibatch B stack [L=2, S=2, T, T] splits S over the 2-way data axis
    assert any(s[:-2] == (2, 1) for s in shapes if len(s) == 4), shapes
    # m0 ran the XLA Cholesky (plain CPU trainer); m1 ran the Pallas kernel
    # per shard. Per-op numerics agree at 2e-5 (test_partitioned_matches_
    # reference) but a whole epoch of natural-gradient steps accumulates to
    # ~1e-4 relative — this test pins the ROUTING, not kernel-vs-XLA drift.
    np.testing.assert_allclose(m1.net, m0.net, rtol=1e-3)
    np.testing.assert_allclose(m1.kld, m0.kld, rtol=1e-3)


def test_grads_match_under_mesh_route(monkeypatch):
    mesh = make_mesh(2, 2)
    a = _spd((2, 4, 5, 5), seed=3)

    def loss(a):
        l, inv = la.cholesky_and_inverse(a)
        return jnp.sum(inv) + jnp.sum(jnp.log(jnp.diagonal(l, axis1=-2, axis2=-1)))

    g_ref = jax.grad(loss)(a)  # before forcing: plain XLA path
    _force_partitioned(monkeypatch)
    a_sh = jax.device_put(a, NamedSharding(mesh, P("latent", "data")))
    with mesh, la.pallas_suppressed():
        g = jax.jit(jax.grad(loss))(a_sh)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=2e-4, atol=2e-5)


def test_divisibility_guard_replicates_unaligned_dims():
    mesh = make_mesh(4, 2)
    sh = NamedSharding(mesh, P("latent", "data"))
    # latent divides 4 but data axis (4) does not divide 5 -> replicated
    out = kc._replicate_tail_sharding(sh, (4, 5, 6, 6))
    assert tuple(out.spec) + (None,) * (4 - len(out.spec)) == (
        "latent",
        None,
        None,
        None,
    )
    # tuple entries: ('data','latent') product 8 divides 16
    sh2 = NamedSharding(mesh, P(("data", "latent")))
    out2 = kc._replicate_tail_sharding(sh2, (16, 6, 6))
    assert out2.spec[0] == ("data", "latent")
    out3 = kc._replicate_tail_sharding(sh2, (12, 6, 6))
    assert out3.spec[0] is None


def test_escape_hatch_pins_xla(monkeypatch):
    """use_partitioned_cholesky=False restores the r2 policy: mesh traces
    fall back to the XLA Cholesky (gate returns False under suppression)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(kc, "use_partitioned_cholesky", False)
    a = jnp.zeros((4, 8, 8), jnp.float32)
    assert kc._use_pallas(a)
    with la.pallas_suppressed():
        assert not kc._use_pallas(a)
