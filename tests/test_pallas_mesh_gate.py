"""Non-partitionable Pallas fast paths must not enter mesh-traced programs.

XLA's SPMD partitioner has no sharding rule for bare Pallas custom calls, so
a program compiled for a multi-device mesh has to stay on the XLA
implementations — whose partitioning the compiled-HLO tests prove
(tests/test_sharding.py). ``ops.linalg.pallas_suppressed`` is the trace-scope
marker; the sharded trainer facades and ``sharded_gp_predict`` enter it
around every dispatch. These tests pin (a) each gate honours the context and
(b) the sharded Hensman facade really keeps the fused B-chain out of its
trace while the plain trainer (same forced flag) uses it — with the
self-partitioning route switched OFF, since the batched Cholesky and the
fused B-chain now declare their own partitioning rules and by default stay
on the kernels inside mesh traces (tests/test_partitioned_cholesky.py,
tests/test_partitioned_b_chain.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lvae_tpu.ops.kernels as kx
from lvae_tpu.kernels_pallas import cholesky as kc
from lvae_tpu.ops import elbo as eb
from lvae_tpu.ops import linalg as la
from tests.test_b_chain import make_inputs


def test_cholesky_gate_honours_suppression(monkeypatch):
    # the gate itself runs no pallas code, so faking the backend is safe
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    a = jnp.zeros((4, 8, 8), jnp.float32)
    assert kc._use_pallas(a)
    with la.pallas_suppressed():
        # the Cholesky is self-partitioning: the kernel STAYS on inside mesh
        # traces (routed through custom_partitioning by _chol_inv_impl)...
        assert kc._use_pallas(a)
        # ...unless the partitioned route is switched off
        monkeypatch.setattr(kc, "use_partitioned_cholesky", False)
        assert not kc._use_pallas(a)
        monkeypatch.setattr(kc, "use_partitioned_cholesky", True)
    assert kc._use_pallas(a)  # depth restored on exit


def test_suppression_nests_and_inactive_is_noop():
    assert not la.pallas_suppress_active()
    with la.pallas_suppressed(False):
        assert not la.pallas_suppress_active()
        with la.pallas_suppressed():
            with la.pallas_suppressed():
                assert la.pallas_suppress_active()
            assert la.pallas_suppress_active()
        assert not la.pallas_suppress_active()


def test_bchain_gate_honours_suppression(monkeypatch):
    from lvae_tpu.kernels_pallas import b_chain as bc

    monkeypatch.setattr(kx, "use_pallas_b_chain", True)
    monkeypatch.setattr(bc, "use_partitioned_b_chain", False)
    spec0, spec1, kp0, kp1, noise, xb, mask = make_inputs()
    z = np.asarray(xb[:3, 0, :])  # [M, Q] inducing rows

    ops = eb.gp_block_operators(spec0, spec1, kp0, kp1, noise, xb, z, mask)
    assert ops.tr_iB_K0 is not None  # fused path taken (interpret on CPU)

    with la.pallas_suppressed():
        ops_x = eb.gp_block_operators(spec0, spec1, kp0, kp1, noise, xb, z, mask)
    assert ops_x.tr_iB_K0 is None  # XLA chain pinned (partitioned route off)

    # with the self-partitioning route ON (default) the fused path stays
    monkeypatch.setattr(bc, "use_partitioned_b_chain", True)
    with la.pallas_suppressed():
        ops_p = eb.gp_block_operators(spec0, spec1, kp0, kp1, noise, xb, z, mask)
    assert ops_p.tr_iB_K0 is not None

    # and it is the same math either way
    np.testing.assert_allclose(
        np.asarray(ops.iB), np.asarray(ops_x.iB), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ops.logdet_B), np.asarray(ops_x.logdet_B), rtol=1e-5
    )


def _tiny_hensman(seed=0):
    from lvae_tpu.data.blocks import build_subject_blocks
    from lvae_tpu.data.datasets import ArrayDataset
    from lvae_tpu.models import vae as mv
    from lvae_tpu.train import hensman as th
    from lvae_tpu.train import state as st
    from tests.test_b_chain import make_spec

    rng = np.random.RandomState(seed)
    p, t = 4, 4
    n = p * t
    labels = np.stack(
        [
            np.tile(np.arange(t), p).astype(float),
            np.repeat(rng.normal(size=p), t),
            np.repeat(np.arange(p), t).astype(float),
            np.repeat(rng.randint(0, 2, p), t).astype(float),
        ],
        axis=1,
    )
    ds = ArrayDataset(
        data=rng.uniform(size=(n, 20)).astype(np.float32),
        labels=labels,
        mask=np.ones((n, 20), np.float32),
    )
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    spec0, spec1 = make_spec()
    cfg = th.HensmanConfig(
        spec0=spec0, spec1=spec1, latent_dim=2, P_tot=p, N_tot=n,
        weight=0.5, loss_function="mse", natural_gradient=True,
        natural_gradient_lr=0.01, constrain_scales=True, eps=1e-5,
        dropout=False,
    )
    z = st.init_inducing_points(ds.labels, m_inducing=4, seed=0)
    model = mv.SimpleVAE(latent_dim=2, num_dim=20)
    return th.HensmanTrainer(
        model, cfg, ds, blocks, z, subjects_per_batch=2, seed=0
    )


def test_sharded_hensman_keeps_bchain_out_of_the_trace(monkeypatch):
    from lvae_tpu.kernels_pallas import b_chain as bc
    from lvae_tpu.parallel.mesh import ShardedHensmanTrainer, make_mesh

    monkeypatch.setattr(kx, "use_pallas_b_chain", True)
    # pin the r2 policy: with the self-partitioning route off, the mesh
    # trace must fall back to the XLA chain (route-on coverage lives in
    # tests/test_partitioned_b_chain.py)
    monkeypatch.setattr(bc, "use_partitioned_b_chain", False)
    calls = []
    orig = bc.b_chain_operators

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(bc, "b_chain_operators", spy)

    # the forced flag reaches the unsharded trace (the spy would catch it)
    plain = _tiny_hensman()
    m0 = plain.run_epoch()
    assert calls, "sentinel never fired on the plain trainer — gate moved?"
    assert np.isfinite(m0.net)

    # the mesh-traced program must stay on the XLA chain
    calls.clear()
    sharded = ShardedHensmanTrainer(_tiny_hensman(), make_mesh(2, 1))
    m1 = sharded.run_epoch()
    assert not calls, "fused B-chain entered a multi-device mesh trace"
    assert np.isfinite(m1.net)

    # trivial 1-device meshes keep the fast paths (no suppression)
    calls.clear()
    sharded1 = ShardedHensmanTrainer(_tiny_hensman(), make_mesh(1, 1))
    sharded1.run_epoch()
    assert calls, "1-device mesh should keep the Pallas fast paths"


def test_sharded_vi_prediction_set_suppresses(monkeypatch):
    """VI phase 2 closes over the mesh-placed state — its trace needs the
    same XLA pinning as the epoch programs (review finding)."""
    from lvae_tpu.data.blocks import build_subject_blocks
    from lvae_tpu.kernels_pallas import b_chain as bc
    from lvae_tpu.models import vae as mv
    from lvae_tpu.parallel.mesh import ShardedVITrainer, make_mesh
    from lvae_tpu.train import state as st
    from lvae_tpu.train.vi import VIConfig, VITrainer
    from tests.test_b_chain import make_spec
    from tests.test_training import tiny_cohort

    monkeypatch.setattr(kx, "use_pallas_b_chain", True)
    monkeypatch.setattr(bc, "use_partitioned_b_chain", False)
    calls = []
    orig = bc.b_chain_operators

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(bc, "b_chain_operators", spy)

    def build():
        ds = tiny_cohort(p=4, t=4, seed=0)
        blocks = build_subject_blocks(ds.labels, id_covariate=2)
        spec0, spec1 = make_spec()
        model = mv.SimpleVAE(latent_dim=2, num_dim=20)
        params = jax.jit(lambda k, x: model.init(k, x, deterministic=True))(
            jax.random.key(0), jnp.asarray(ds.data[:2], jnp.float32)
        )
        gp = st.init_gp_params(spec0, spec1, 2, constrain_scales=True)
        cfg = VIConfig(
            spec0=spec0, spec1=spec1, latent_dim=2, weight=0.5,
            loss_function="mse", constrain_scales=True, eps=1e-6,
        )
        z = st.init_inducing_points(ds.labels, m_inducing=4, seed=0)
        return VITrainer(model, cfg, ds, blocks, z, params, gp)

    def pred_cohort():
        pred = tiny_cohort(p=2, t=4, seed=5)
        pred.labels[:, 2] += 100
        return pred

    plain = build()
    plain.fit(1, log_every=0, chunk=1)
    plain.optimize_prediction_set(pred_cohort(), epochs=2, log_every=0)
    assert calls, "sentinel never fired on the plain VI trainer — gate moved?"

    calls.clear()
    sharded = ShardedVITrainer(build(), make_mesh(2, 1))
    sharded.fit(1, log_every=0, chunk=1)
    mu, _ = sharded.optimize_prediction_set(pred_cohort(), epochs=2, log_every=0)
    assert not calls, "fused B-chain entered the sharded VI phase-2 trace"
    assert np.all(np.isfinite(np.asarray(mu)))


def test_fused_adam_suppressed_matches(monkeypatch):
    """The fused Adam keeps its init-decided padded layout under suppression
    and runs the identical math as plain XLA ops."""
    import optax

    from lvae_tpu.kernels_pallas.adam import fused_adam

    rng = np.random.default_rng(0)
    params = {
        "a": jnp.asarray(rng.normal(size=(33, 5)), jnp.float32),
        "b": jnp.asarray(rng.normal(size=(7,)), jnp.float32),
    }
    grads_seq = [
        jax.tree.map(
            lambda p: jnp.asarray(
                np.random.default_rng(10 + i).normal(size=p.shape), jnp.float32
            ),
            params,
        )
        for i in range(3)
    ]

    def run(suppress):
        opt = fused_adam(1e-2, interpret=True)  # interpret → _fuse() True on CPU
        p = params
        state = opt.init(p)  # init outside any guard: padded fused layout
        for g in grads_seq:
            with la.pallas_suppressed(suppress):
                updates, state = opt.update(g, state, p)
            p = optax.apply_updates(p, updates)
        return p, state

    p_ref, s_ref = run(False)
    p_sup, s_sup = run(True)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(p_sup[k]), np.asarray(p_ref[k]), rtol=1e-6, atol=1e-7
        )
    np.testing.assert_allclose(
        np.asarray(s_sup.mu), np.asarray(s_ref.mu), rtol=1e-6, atol=1e-7
    )
    # mixed: one suppressed step in the middle of fused steps keeps layout
    opt = fused_adam(1e-2, interpret=True)
    p = params
    state = opt.init(p)
    for i, g in enumerate(grads_seq):
        with la.pallas_suppressed(i == 1):
            updates, state = opt.update(g, state, p)
        p = optax.apply_updates(p, updates)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(p[k]), np.asarray(p_ref[k]), rtol=1e-6, atol=1e-7
        )


def test_sharded_gp_predict_suppresses(monkeypatch):
    """sharded_gp_predict pins the XLA implementations while tracing."""
    from lvae_tpu.parallel import mesh as pm

    seen = []

    class _FakeJit:
        def __call__(self, *a, **k):
            seen.append(la.pallas_suppress_active())
            raise RuntimeError("stop")

    monkeypatch.setattr(pm, "_gp_predict_jit", lambda: _FakeJit())
    mesh = pm.make_mesh(2, 1)
    spec0, spec1, kp0, kp1, noise, xb, mask = make_inputs()
    inputs = {"xb": xb, "mask": mask}
    with pytest.raises(RuntimeError, match="stop"):
        pm.sharded_gp_predict(
            spec0, spec1, kp0, kp1, noise, inputs, np.asarray(xb[:2, 0, :]),
            mesh,
        )
    assert seen == [True]
    assert not la.pallas_suppress_active()
