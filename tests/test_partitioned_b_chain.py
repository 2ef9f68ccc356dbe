"""The fused Pallas B-chain is self-partitioning inside mesh traces.

kernels_pallas/b_chain.py declares a custom_partitioning rule (L threads the
params and every output, S threads the covariate blocks and the B⁻¹ stack,
everything else replicates) whose per-shard lowering finishes log|B| and
tr(B⁻¹K0) with a psum over the mesh axes sharding S. These tests prove on
the 8-virtual-device CPU mesh (kernel in interpret mode per shard):

- values == the XLA chain on multi-device meshes with BOTH L and S sharded
  (the psum is load-bearing: a missing one would leave partial S-sums);
- output shardings follow the declared rule;
- the per-shard lowering really sees LOCAL (L, S) shapes;
- gradients through b_chain_operators match under the mesh route;
- a sharded Hensman epoch routed through the partitioned fused chain
  reproduces the plain XLA trainer's metrics;
- the divisibility guard replicates dims the mesh axis cannot split
  (positional reassembly of a padded B⁻¹ stack would misplace rows).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import lvae_tpu.ops.kernels as kx
from lvae_tpu.kernels_pallas import b_chain as bc
from lvae_tpu.ops import linalg as la
from lvae_tpu.parallel.mesh import make_mesh
from tests.test_b_chain import make_inputs, xla_reference


@pytest.fixture
def no_compile_cache():
    """The partition callbacks run during backend compilation — a cached
    program never re-invokes them, so spy-based tests must compile fresh."""
    old = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    yield
    jax.config.update("jax_enable_compilation_cache", old)


def _shard_args(mesh, kp0, kp1, noise, xb, mask):
    lat = NamedSharding(mesh, P("latent"))
    lat2 = NamedSharding(mesh, P("latent", None))
    kp0 = jax.tree.map(lambda a: jax.device_put(a, lat2), kp0)
    kp1 = jax.tree.map(lambda a: jax.device_put(a, lat2), kp1)
    noise = jax.device_put(noise, lat)
    xb = jax.device_put(xb, NamedSharding(mesh, P("data", None, None)))
    mask = jax.device_put(mask, NamedSharding(mesh, P("data", None)))
    return kp0, kp1, noise, xb, mask


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 1), (1, 2)])
def test_partitioned_matches_xla_on_mesh(mesh_shape):
    data, latent = mesh_shape
    mesh = make_mesh(data, latent)
    spec0, spec1, kp0, kp1, noise, xb, mask = make_inputs(s=8, t=4, latent=4, seed=2)
    ib0, ld0, tr0 = xla_reference(spec0, spec1, kp0, kp1, noise, xb, mask)

    kp0s, kp1s, ns, xbs, ms = _shard_args(mesh, kp0, kp1, noise, xb, mask)
    fn = jax.jit(functools.partial(bc.b_chain_operators, spec0, spec1))
    with mesh, la.pallas_suppressed():
        ib1, ld1, tr1 = fn(kp0s, kp1s, ns, xbs, ms)

    np.testing.assert_allclose(np.asarray(ib1), np.asarray(ib0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(tr1), np.asarray(tr0), rtol=2e-5, atol=2e-5)
    # outputs follow the declared rule: B⁻¹ [L, S, T, T] on both axes,
    # the reduced scalars on 'latent' only
    ib_spec = tuple(ib1.sharding.spec) + (None,) * (4 - len(ib1.sharding.spec))
    want_l = "latent" if latent > 1 else None
    want_s = "data" if data > 1 else None
    assert ib_spec[:2] == (want_l, want_s), ib_spec
    ld_spec = tuple(ld1.sharding.spec) + (None,)
    assert ld_spec[0] == want_l, ld_spec


def test_lowering_sees_local_shards(no_compile_cache, monkeypatch):
    jax.clear_caches()  # in-process executable reuse also skips the callbacks
    shapes = []
    orig = bc._b_chain_pallas

    def spy(spec0, spec1, s0, g0, s1, g1, noise, xb, mask, **kw):
        shapes.append((s0.shape, xb.shape))
        return orig(spec0, spec1, s0, g0, s1, g1, noise, xb, mask, **kw)

    monkeypatch.setattr(bc, "_b_chain_pallas", spy)
    mesh = make_mesh(2, 2)
    spec0, spec1, kp0, kp1, noise, xb, mask = make_inputs(s=8, t=4, latent=4, seed=2)
    kp0s, kp1s, ns, xbs, ms = _shard_args(mesh, kp0, kp1, noise, xb, mask)
    fn = jax.jit(functools.partial(bc.b_chain_operators, spec0, spec1))
    with mesh, la.pallas_suppressed():
        ib, _, _ = fn(kp0s, kp1s, ns, xbs, ms)
    ib.block_until_ready()
    # the partitioner lowered per-shard: latent 4/2, data 8/2
    assert any(s0s[0] == 2 and xbs_[0] == 4 for s0s, xbs_ in shapes), shapes


def test_grads_match_under_mesh_route():
    mesh = make_mesh(2, 2)
    spec0, spec1, kp0, kp1, noise, xb, mask = make_inputs(s=8, t=4, latent=4, seed=3)

    def loss(kp0, kp1, noise, xb, mask):
        ib, ld, tr = bc.b_chain_operators(spec0, spec1, kp0, kp1, noise, xb, mask)
        w = jnp.arange(ib.size, dtype=ib.dtype).reshape(ib.shape) / ib.size
        return jnp.sum(ib * w) + jnp.sum(ld * 0.7) + jnp.sum(tr * 1.3)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(kp0, kp1, noise, xb, mask)
    kp0s, kp1s, ns, xbs, ms = _shard_args(mesh, kp0, kp1, noise, xb, mask)
    with mesh, la.pallas_suppressed():
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(kp0s, kp1s, ns, xbs, ms)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_sharded_hensman_epoch_runs_partitioned_bchain(
    no_compile_cache, monkeypatch
):
    """End-to-end: the mesh-traced Hensman epoch keeps the fused B-chain
    (per-shard, interpret) and reproduces the plain XLA trainer's metrics."""
    from lvae_tpu.parallel.mesh import ShardedHensmanTrainer
    from tests.test_pallas_mesh_gate import _tiny_hensman

    plain = _tiny_hensman()
    m0 = plain.run_epoch()

    monkeypatch.setattr(kx, "use_pallas_b_chain", True)
    jax.clear_caches()
    shapes = []
    orig = bc._b_chain_pallas

    def spy(spec0, spec1, s0, g0, s1, g1, noise, xb, mask, **kw):
        shapes.append(xb.shape)
        return orig(spec0, spec1, s0, g0, s1, g1, noise, xb, mask, **kw)

    monkeypatch.setattr(bc, "_b_chain_pallas", spy)
    sharded = ShardedHensmanTrainer(_tiny_hensman(), make_mesh(2, 1))
    m1 = sharded.run_epoch()

    assert shapes, "mesh trace never reached the partitioned fused chain"
    # the minibatch [S=2, T, Q] blocks split S over the 2-way data axis
    assert any(s[0] == 1 for s in shapes), shapes
    # m0 ran the XLA chain; m1 the fused kernel per shard — per-op numerics
    # agree at 2e-5, a whole epoch accumulates ~1e-4 relative (this pins
    # ROUTING, not kernel-vs-XLA drift; cf. tests/test_partitioned_cholesky)
    np.testing.assert_allclose(m1.net, m0.net, rtol=1e-3)
    np.testing.assert_allclose(m1.kld, m0.kld, rtol=1e-3)


def test_bucketed_sharded_epoch_runs_partitioned_bchain(
    no_compile_cache, monkeypatch
):
    """Composition: ragged bucketed training × mesh sharding × the
    partitioned fused B-chain. The bucketed epoch program scans one body per
    bucket at its own static [S, T_bucket] shape; under a mesh trace each
    bucket's fused chain must route through the partitioning rule at ITS
    shape, and the trajectory must match the plain bucketed trainer's."""
    from lvae_tpu.data import blocks as bk
    from lvae_tpu.parallel.mesh import ShardedHensmanTrainer
    from tests.test_buckets import _make_trainer, ragged_cohort

    ds = ragged_cohort()
    blocks = bk.build_subject_blocks(ds.labels, id_covariate=2)

    plain = _make_trainer(ds, blocks, t_buckets=2)
    assert len(plain.tables) == 2, "fixture no longer ragged-bucketed"
    m0 = [plain.run_epoch() for _ in range(2)]

    monkeypatch.setattr(kx, "use_pallas_b_chain", True)
    jax.clear_caches()
    t_dims = []
    orig = bc._b_chain_pallas

    def spy(spec0, spec1, s0, g0, s1, g1, noise, xb, mask, **kw):
        t_dims.append(xb.shape[1])
        return orig(spec0, spec1, s0, g0, s1, g1, noise, xb, mask, **kw)

    monkeypatch.setattr(bc, "_b_chain_pallas", spy)
    sharded = ShardedHensmanTrainer(
        _make_trainer(ds, blocks, t_buckets=2), make_mesh(2, 1)
    )
    m1 = [sharded.run_epoch() for _ in range(2)]

    # both bucket programs (T=3 and T=8 caps) reached the partitioned kernel
    assert set(t_dims) == {3, 8}, t_dims
    for a, b in zip(m0, m1):
        np.testing.assert_allclose(b.net, a.net, rtol=1e-3)
        np.testing.assert_allclose(b.kld, a.kld, rtol=1e-3)


def test_same_axis_on_l_and_s_stays_valid():
    """If one mesh axis shards BOTH the params' L and the covariates' S,
    P(axis, axis, ...) on the B⁻¹ result would be invalid. Shardy resolves
    the factor conflict itself (one dim per output keeps the axis); the
    `_placements` guard keeps the partition callbacks consistent for the
    GSPMD fallback. Pin: values unchanged, no axis used twice in any
    output spec."""
    mesh = make_mesh(2, 1)
    spec0, spec1, kp0, kp1, noise, xb, mask = make_inputs(s=8, t=4, latent=4, seed=5)
    ib0, ld0, tr0 = xla_reference(spec0, spec1, kp0, kp1, noise, xb, mask)

    lat2 = NamedSharding(mesh, P("data", None))  # 'data' shards L...
    kp0s = jax.tree.map(lambda a: jax.device_put(a, lat2), kp0)
    kp1s = jax.tree.map(lambda a: jax.device_put(a, lat2), kp1)
    ns = jax.device_put(noise, NamedSharding(mesh, P("data")))
    xbs = jax.device_put(xb, NamedSharding(mesh, P("data", None, None)))  # ...and S
    ms = jax.device_put(mask, NamedSharding(mesh, P("data", None)))

    fn = jax.jit(functools.partial(bc.b_chain_operators, spec0, spec1))
    with mesh, la.pallas_suppressed():
        ib1, ld1, tr1 = fn(kp0s, kp1s, ns, xbs, ms)
    np.testing.assert_allclose(np.asarray(ib1), np.asarray(ib0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(tr1), np.asarray(tr0), rtol=2e-5, atol=2e-5)
    for out in (ib1, ld1, tr1):
        used = [
            n
            for e in out.sharding.spec
            if e is not None
            for n in (e if isinstance(e, tuple) else (e,))
        ]
        assert len(used) == len(set(used)), out.sharding.spec


def test_divisibility_guard_replicates_unaligned_dims():
    mesh = make_mesh(4, 2)
    sh = NamedSharding(mesh, P("data", None, None))
    # data axis (4) divides 8 -> kept
    assert bc._entry_if_divides(sh, 0, 8) == "data"
    # data axis (4) does not divide 5 -> replicated
    assert bc._entry_if_divides(sh, 0, 5) is None
    # unsharded dim / rank overflow -> None
    assert bc._entry_if_divides(sh, 1, 8) is None
    assert bc._entry_if_divides(NamedSharding(mesh, P()), 0, 8) is None
    # tuple entries: product 8 divides 16, not 12
    sh2 = NamedSharding(mesh, P(("data", "latent")))
    assert bc._entry_if_divides(sh2, 0, 16) == ("data", "latent")
    assert bc._entry_if_divides(sh2, 0, 12) is None


def test_partitioned_long_t_split_path():
    """The long-T split-fusion route (64 < T <= MAX_T: B-inverse kernel +
    XLA trace side) keeps the partitioning rule intact — the per-shard
    lower_fn computes tr(B⁻¹K0) from its LOCAL shard and the psum over the
    S-sharding axes completes it, same as the fully-fused path."""
    mesh = make_mesh(2, 1)
    spec0, spec1, kp0, kp1, noise, xb, mask = make_inputs(
        s=4, t=70, latent=2, seed=5
    )
    assert xb.shape[1] > bc.MAX_T_FULL_LANE  # must exercise the split route
    ib0, ld0, tr0 = xla_reference(spec0, spec1, kp0, kp1, noise, xb, mask)

    kp0s, kp1s, ns, xbs, ms = _shard_args(mesh, kp0, kp1, noise, xb, mask)
    fn = jax.jit(functools.partial(bc.b_chain_operators, spec0, spec1))
    with mesh, la.pallas_suppressed():
        ib1, ld1, tr1 = fn(kp0s, kp1s, ns, xbs, ms)

    np.testing.assert_allclose(np.asarray(ib1), np.asarray(ib0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld0), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(tr1), np.asarray(tr0), rtol=2e-4, atol=2e-4
    )
    assert tuple(ib1.sharding.spec)[:2] == (None, "data")
