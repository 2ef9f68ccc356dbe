"""Fused Pallas B-chain (kernels_pallas/b_chain.py) vs the XLA path.

The kernel must be the SAME function as block builds + B assembly +
cholesky_and_inverse + logdet + tr(B⁻¹K0): forward outputs, parameter
gradients, and every downstream bound. Runs the Pallas interpreter on CPU
(the compiled kernel path is exercised on TPU via the LVAE_BCHAIN A/B).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lvae_tpu.ops.kernels as kx
from lvae_tpu.ops import elbo as eb
from lvae_tpu.ops import linalg as la


@pytest.fixture
def bchain_on():
    old = kx.use_pallas_b_chain
    kx.use_pallas_b_chain = True
    yield
    kx.use_pallas_b_chain = old


def make_spec():
    return kx.split_kernel_spec(
        cat_kernel=[2],
        sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )


def make_inputs(s=5, t=4, latent=3, q=4, seed=0, ragged=True):
    rng = np.random.RandomState(seed)
    xb = np.zeros((s, t, q), np.float32)
    xb[:, :, 0] = np.arange(t)[None] + rng.rand(s, 1)  # time
    xb[:, :, 1] = rng.randn(s, t)
    xb[:, :, 2] = np.arange(s)[:, None]  # id
    xb[:, :, 3] = rng.randint(0, 2, (s, 1))
    mask = np.ones((s, t), np.float32)
    if ragged:
        mask[1, 3:] = 0.0  # short subject
        mask[3, :] = 0.0  # ghost row
        xb = xb * mask[:, :, None]
    spec0, spec1 = make_spec()

    def perturbed(spec):
        kp = kx.init_kernel_params(spec, latent)
        return kx.KernelParams(
            raw_scale=kp.raw_scale
            + jnp.asarray(rng.randn(*kp.raw_scale.shape).astype(np.float32)) * 0.3,
            raw_lengthscale=kp.raw_lengthscale
            + jnp.asarray(
                rng.randn(*kp.raw_lengthscale.shape).astype(np.float32)
            ) * 0.3,
        )

    kp0 = perturbed(spec0)
    kp1 = perturbed(spec1)
    noise = jnp.asarray(rng.rand(latent).astype(np.float32) + 0.5)
    return spec0, spec1, kp0, kp1, noise, jnp.asarray(xb), jnp.asarray(mask)


def xla_reference(spec0, spec1, kp0, kp1, noise, xb, mask):
    k0_st = kx.block_kernel_matrix(spec0, kp0, xb, mask)
    b = kx.block_b_operator(spec1, kp1, xb, mask, noise)
    lb = la.cholesky(b)
    ib = la.chol_inverse(lb)
    logdet = la.logdet_from_chol(lb, batch_dims=1)
    tr = jnp.einsum("lptu,lptu->l", ib, k0_st)
    return ib, logdet, tr


def test_forward_matches_xla(bchain_on):
    from lvae_tpu.kernels_pallas.b_chain import b_chain_operators

    args = make_inputs()
    ib0, ld0, tr0 = xla_reference(*args)
    ib1, ld1, tr1 = b_chain_operators(*args)
    np.testing.assert_allclose(np.asarray(ib1), np.asarray(ib0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld0), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(tr1), np.asarray(tr0), rtol=2e-5, atol=2e-5
    )


def test_forward_lane_padding(bchain_on):
    """L·S not a multiple of 128 (always, at these sizes) and a full-ghost
    row both behave: padding lanes factor I and contribute nothing."""
    from lvae_tpu.kernels_pallas.b_chain import b_chain_operators

    args = make_inputs(s=7, t=5, latent=4, seed=3)
    ib0, ld0, tr0 = xla_reference(*args)
    ib1, ld1, tr1 = b_chain_operators(*args)
    np.testing.assert_allclose(np.asarray(ib1), np.asarray(ib0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld0), atol=2e-5)


def test_param_gradients_match(bchain_on):
    """d/d(raw kernel params, noise) of a mixed scalar of all three outputs
    equals the XLA path's autodiff."""
    from lvae_tpu.kernels_pallas.b_chain import b_chain_operators

    spec0, spec1, kp0, kp1, noise, xb, mask = make_inputs()

    def loss(fn, kp0, kp1, noise):
        ib, ld, tr = fn(spec0, spec1, kp0, kp1, noise, xb, mask)
        w = jnp.arange(ib.size, dtype=ib.dtype).reshape(ib.shape) / ib.size
        return jnp.sum(ib * w) + jnp.sum(ld * 0.7) + jnp.sum(tr * 1.3)

    g0 = jax.grad(lambda *a: loss(xla_reference, *a), argnums=(0, 1, 2))(
        kp0, kp1, noise
    )
    g1 = jax.grad(lambda *a: loss(b_chain_operators, *a), argnums=(0, 1, 2))(
        kp0, kp1, noise
    )
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )


def test_gp_block_operators_integration(bchain_on):
    """gp_block_operators with the fused gate == the XLA path on every bound
    (gp_elbo, dubo, minibatch_kld + natural gradients)."""
    spec0, spec1, kp0, kp1, noise, xb, mask = make_inputs(s=6, t=4, latent=3)
    s, t, _ = xb.shape
    latent = 3
    rng = np.random.RandomState(7)
    # spread the inducing points' RBF covariate so K0zz is well-conditioned:
    # a near-rank-1 gram makes iK0zz amplify f32 reassociation noise into
    # the natural gradients, which would test conditioning, not the wiring
    z = rng.randn(6, xb.shape[2]).astype(np.float32)
    z[:, 0] = np.linspace(0.0, 12.0, 6)
    z = jnp.asarray(z)
    yb = jnp.asarray(rng.randn(s, t, latent).astype(np.float32))
    mu_b = jnp.asarray(rng.randn(s, t, latent).astype(np.float32))
    lv_b = jnp.asarray((rng.randn(s, t, latent) * 0.1).astype(np.float32))
    m = jnp.asarray(rng.randn(latent, 6, 1).astype(np.float32))
    h0 = rng.randn(latent, 6, 6).astype(np.float32) / 3
    H = jnp.asarray(h0 @ np.swapaxes(h0, -1, -2) + 0.5 * np.eye(6, dtype=np.float32))

    def all_bounds():
        ops = eb.gp_block_operators(
            spec0, spec1, kp0, kp1, noise, xb, z, mask=mask, eps=1e-5
        )
        el = eb.gp_elbo(ops, yb)
        du = eb.dubo(ops, mu_b, lv_b)
        kld, ng = eb.minibatch_kld(
            ops, m, H, mu_b, lv_b, P_tot=6, P_batch=jnp.asarray(5.0),
            N_tot=20, natural_gradient=True,
        )
        return el, du, kld, ng.grad_m, ng.grad_H

    kx.use_pallas_b_chain = False
    ref = all_bounds()
    kx.use_pallas_b_chain = True
    got = all_bounds()
    names = ["gp_elbo", "dubo", "kld", "grad_m", "grad_H"]
    for n, a, b in zip(names, ref, got):
        # rsqrt-pivot Cholesky reassociates differently from XLA's blocked
        # factorization; observed f32 drift ~3e-5 relative on these bounds
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4, err_msg=n
        )


def test_usable_gate():
    from lvae_tpu.kernels_pallas import b_chain as bc

    spec0, spec1, kp0, kp1, noise, xb, mask = make_inputs()
    assert bc.usable(spec0, spec1, kp0, xb, jnp.float32)
    assert not bc.usable(spec0, spec1, kp0, xb, jnp.float64)
    # T beyond the VMEM budget falls back
    xb_big = jnp.zeros((2, bc.MAX_T + 1, 4), jnp.float32)
    assert not bc.usable(spec0, spec1, kp0, xb_big, jnp.float32)
    # empty spec falls back
    empty = kx.KernelSpec(components=())
    assert not bc.usable(empty, spec1, kp0, xb, jnp.float32)


def test_hensman_epoch_integration(bchain_on):
    """A tiny Hensman epoch trains through the fused gate and matches the
    XLA path's trajectory (f32 reassociation tolerance)."""
    from lvae_tpu.data.blocks import build_subject_blocks
    from lvae_tpu.data.datasets import ArrayDataset
    from lvae_tpu.models import vae as mv
    from lvae_tpu.train import hensman as th
    from lvae_tpu.train import state as st

    rng = np.random.RandomState(0)
    p, t = 6, 4
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
        spec0=spec0, spec1=spec1, latent_dim=3, P_tot=p, N_tot=n,
        weight=0.5, loss_function="mse", natural_gradient=True,
        natural_gradient_lr=0.01, constrain_scales=True, eps=1e-5,
        dropout=False,
    )
    z = st.init_inducing_points(ds.labels, m_inducing=6, seed=0)

    def run(flag, epochs=3):
        kx.use_pallas_b_chain = flag
        model = mv.SimpleVAE(latent_dim=3, num_dim=20)
        tr = th.HensmanTrainer(
            model, cfg, ds, blocks, z, subjects_per_batch=3, seed=0
        )
        return [tr.run_epoch().net for _ in range(epochs)]

    ref = run(False)
    got = run(True)
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, ref, rtol=1e-3)


def test_cat_mod_component(bchain_on):
    """The centred-categorical factor (CatKernelMod, kernel_spec.py:35-55 —
    implemented here as cat_mod) evaluates correctly inside the fused
    kernel's component loop."""
    from lvae_tpu.kernels_pallas.b_chain import b_chain_operators

    rng = np.random.RandomState(4)
    s, t, latent = 4, 3, 2
    xb = np.zeros((s, t, 3), np.float32)
    xb[:, :, 0] = np.arange(t)[None]
    xb[:, :, 1] = rng.randint(0, 4, (s, t))  # 4-class categorical
    xb[:, :, 2] = np.arange(s)[:, None]
    mask = np.ones((s, t), np.float32)
    spec0 = kx.KernelSpec(components=(
        kx.KernelComponent(kind="cat_mod", rbf_col=-1, eq_cols=(),
                           and_cols=(), cat_mod=(1, 4)),
        kx.KernelComponent(kind="sqexp", rbf_col=0, eq_cols=(),
                           and_cols=(), cat_mod=(-1, 0)),
    ))
    spec1 = kx.KernelSpec(components=(
        kx.KernelComponent(kind="cat", rbf_col=-1, eq_cols=(2,),
                           and_cols=(), cat_mod=(-1, 0)),
    ))
    kp0 = kx.init_kernel_params(spec0, latent)
    kp1 = kx.init_kernel_params(spec1, latent)
    noise = jnp.ones((latent,), jnp.float32)
    args = (spec0, spec1, kp0, kp1, noise, jnp.asarray(xb), jnp.asarray(mask))
    ib0, ld0, tr0 = xla_reference(*args)
    ib1, ld1, tr1 = b_chain_operators(*args)
    np.testing.assert_allclose(np.asarray(ib1), np.asarray(ib0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(tr1), np.asarray(tr0), rtol=2e-5, atol=2e-5)


@pytest.fixture
def batch_major_on():
    from lvae_tpu.kernels_pallas import b_chain as bc

    old = bc.use_batch_major_out
    bc.use_batch_major_out = True
    yield
    bc.use_batch_major_out = old


def test_batch_major_output_bitwise(bchain_on, batch_major_on):
    """The batch-major emit path (use_batch_major_out: [L·S, T, T] written
    straight from VMEM, no XLA relayout of the lanes-major stack) is the
    same numbers — the kernel writes identical floats, only the output
    layout moves — across all three outputs and the parameter gradients."""
    from lvae_tpu.kernels_pallas import b_chain as bc

    args = make_inputs(s=7, t=5, latent=4, seed=3)

    def run_all(flag):
        old = bc.use_batch_major_out
        bc.use_batch_major_out = flag
        try:
            outs = bc.b_chain_operators(*args)

            def scalar(kp0, kp1, noise):
                ib, ld, tr = bc.b_chain_operators(
                    args[0], args[1], kp0, kp1, noise, args[5], args[6]
                )
                return (
                    jnp.sum(ib * jnp.cos(jnp.arange(ib.size, dtype=ib.dtype)
                                         .reshape(ib.shape)))
                    + jnp.sum(ld * 1.3) + jnp.sum(tr * 0.7)
                )

            grads = jax.grad(scalar, argnums=(0, 1, 2))(
                args[2], args[3], args[4]
            )
            return outs, grads
        finally:
            bc.use_batch_major_out = old

    (ib0, ld0, tr0), g0 = run_all(False)
    (ib1, ld1, tr1), g1 = run_all(True)
    np.testing.assert_array_equal(np.asarray(ib1), np.asarray(ib0))
    np.testing.assert_array_equal(np.asarray(ld1), np.asarray(ld0))
    np.testing.assert_array_equal(np.asarray(tr1), np.asarray(tr0))
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batch_major_matches_xla(bchain_on, batch_major_on):
    """Batch-major emit vs the XLA chain on the ragged fixture."""
    from lvae_tpu.kernels_pallas.b_chain import b_chain_operators

    args = make_inputs()
    ib0, ld0, tr0 = xla_reference(*args)
    ib1, ld1, tr1 = b_chain_operators(*args)
    np.testing.assert_allclose(np.asarray(ib1), np.asarray(ib0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld0), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(tr1), np.asarray(tr0), rtol=2e-5, atol=2e-5
    )


def test_long_t_split_fusion(bchain_on):
    """64 < T <= MAX_T runs the SPLIT FUSION (B-inverse Pallas kernel +
    XLA trace side; lane-halving was rejected — a 64-lane last dim pads
    back to a 128-lane tile, see b_chain.py): forward outputs AND parameter
    gradients match the XLA chain at T=90 (VERDICT r3 item 6)."""
    from lvae_tpu.kernels_pallas import b_chain as bc

    assert bc._long_t_active(), "long-T routing must be the measured default"
    args = make_inputs(s=4, t=90, latent=2, seed=1)
    ib0, ld0, tr0 = xla_reference(*args)
    ib1, ld1, tr1 = bc.b_chain_operators(*args)
    np.testing.assert_allclose(np.asarray(ib1), np.asarray(ib0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld0), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(tr1), np.asarray(tr0), rtol=2e-4, atol=2e-4
    )

    spec0, spec1, kp0, kp1, noise, xb, mask = args

    def loss(fn, kp0, kp1, noise):
        ib, ld, tr = fn(spec0, spec1, kp0, kp1, noise, xb, mask)
        w = jnp.arange(ib.size, dtype=ib.dtype).reshape(ib.shape) / ib.size
        return jnp.sum(ib * w) + jnp.sum(ld * 0.7) + jnp.sum(tr * 1.3)

    g0 = jax.grad(lambda *a: loss(xla_reference, *a), argnums=(0, 1, 2))(
        kp0, kp1, noise
    )
    g1 = jax.grad(lambda *a: loss(bc.b_chain_operators, *a), argnums=(0, 1, 2))(
        kp0, kp1, noise
    )
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5
        )


def test_long_t_per_bucket_routing():
    """usable() routes per bucket shape: a T<=64 bucket always takes the
    fused chain, a 64<T<=MAX_T bucket takes it iff the long-T switch is on,
    T>MAX_T always falls back to XLA."""
    from lvae_tpu.kernels_pallas import b_chain as bc

    spec0, spec1, kp0, *_ = make_inputs()

    def can(t):
        return bc.usable(
            spec0, spec1, kp0, jnp.zeros((3, t, 4), jnp.float32), jnp.float32
        )

    old = bc.use_long_t_halves
    try:
        bc.use_long_t_halves = True
        assert can(20) and can(64) and can(65) and can(90) and can(bc.MAX_T)
        assert not can(bc.MAX_T + 1)
        bc.use_long_t_halves = False
        assert can(20) and can(64)
        assert not can(65) and not can(90)
    finally:
        bc.use_long_t_halves = old


def test_long_t_batch_major_matches_xla(bchain_on, batch_major_on):
    """Batch-major emit × the long-T split path (both non-default layout
    paths composed) still matches the XLA chain."""
    from lvae_tpu.kernels_pallas import b_chain as bc

    args = make_inputs(s=4, t=70, latent=2, seed=3)
    assert args[5].shape[1] > bc.MAX_T_FULL_LANE
    ib0, ld0, tr0 = xla_reference(*args)
    ib1, ld1, tr1 = bc.b_chain_operators(*args)
    np.testing.assert_allclose(np.asarray(ib1), np.asarray(ib0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld0), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(tr1), np.asarray(tr0), rtol=2e-4, atol=2e-4
    )


def test_gp_block_operators_long_t_routing(bchain_on):
    """gp_block_operators consults usable() and routes a 64<T<=MAX_T ragged
    cohort through the split-fusion chain: gp_elbo + dubo equal the XLA
    path at long T (the elbo-level integration of round 8)."""
    spec0, spec1, kp0, kp1, noise, xb, mask = make_inputs(
        s=4, t=70, latent=2, seed=6
    )
    rng = np.random.RandomState(9)
    z = rng.randn(5, xb.shape[2]).astype(np.float32)
    z[:, 0] = np.linspace(0.0, 40.0, 5)
    z = jnp.asarray(z)
    yb = jnp.asarray(rng.randn(4, 70, 2).astype(np.float32))
    mu_b = jnp.asarray(rng.randn(4, 70, 2).astype(np.float32))
    lv_b = jnp.asarray((rng.randn(4, 70, 2) * 0.1).astype(np.float32))

    def bounds():
        ops = eb.gp_block_operators(
            spec0, spec1, kp0, kp1, noise, xb, z, mask=mask, eps=1e-5
        )
        return eb.gp_elbo(ops, yb), eb.dubo(ops, mu_b, lv_b)

    kx.use_pallas_b_chain = False
    el0, du0 = bounds()
    kx.use_pallas_b_chain = True
    el1, du1 = bounds()
    np.testing.assert_allclose(np.asarray(el1), np.asarray(el0), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(du1), np.asarray(du0), rtol=2e-4, atol=2e-4
    )


def test_long_t_split_fusion_t128(bchain_on):
    """96 < T <= 128: the split fusion's VMEM arithmetic says 4 live
    [128,128,128] f32 buffers ≈ 33.6 MB fit the raised 64 MB scoped budget
    (VERDICT r4 item 6 — the r4 cap at 96 was an unmeasured cliff).
    Forward outputs AND parameter gradients match the XLA chain at T=128."""
    from lvae_tpu.kernels_pallas import b_chain as bc

    assert bc.MAX_T >= 128, "T=128 must be inside the split-fusion cap"
    args = make_inputs(s=4, t=128, latent=2, seed=2)
    ib0, ld0, tr0 = xla_reference(*args)
    ib1, ld1, tr1 = bc.b_chain_operators(*args)
    np.testing.assert_allclose(np.asarray(ib1), np.asarray(ib0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld0), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(tr1), np.asarray(tr0), rtol=2e-4, atol=2e-4
    )

    spec0, spec1, kp0, kp1, noise, xb, mask = args

    def loss(fn, kp0, kp1, noise):
        ib, ld, tr = fn(spec0, spec1, kp0, kp1, noise, xb, mask)
        w = jnp.arange(ib.size, dtype=ib.dtype).reshape(ib.shape) / ib.size
        return jnp.sum(ib * w) + jnp.sum(ld * 0.7) + jnp.sum(tr * 1.3)

    g0 = jax.grad(lambda *a: loss(xla_reference, *a), argnums=(0, 1, 2))(
        kp0, kp1, noise
    )
    g1 = jax.grad(lambda *a: loss(bc.b_chain_operators, *a), argnums=(0, 1, 2))(
        kp0, kp1, noise
    )
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5
        )
