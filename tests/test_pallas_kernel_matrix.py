"""Fused Pallas kernel-matrix builder vs the XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvae_tpu.kernels_pallas import kernel_matrix as pkm
from lvae_tpu.ops import kernels as kx


def problem(rng, n1=70, n2=37, latent=3):
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2, 3],
        bin_kernel=[1],
        sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    spec = kx.KernelSpec(components=spec0.components + spec1.components)
    kp = kx.init_kernel_params(spec, latent_dim=latent)
    kp = kp._replace(
        raw_scale=kp.raw_scale + 0.3 * rng.normal(size=kp.raw_scale.shape).astype(np.float32),
        raw_lengthscale=kp.raw_lengthscale
        + 0.3 * rng.normal(size=kp.raw_lengthscale.shape).astype(np.float32),
    )
    x1 = np.stack(
        [rng.normal(size=n1), rng.integers(0, 2, n1), rng.integers(0, 4, n1),
         rng.integers(0, 3, n1)], axis=1,
    ).astype(np.float32)
    x2 = np.stack(
        [rng.normal(size=n2), rng.integers(0, 2, n2), rng.integers(0, 4, n2),
         rng.integers(0, 3, n2)], axis=1,
    ).astype(np.float32)
    return spec, kp, jnp.asarray(x1), jnp.asarray(x2)


def test_fused_matches_reference_interpret():
    rng = np.random.default_rng(0)
    spec, kp, x1, x2 = problem(rng)
    scale = kx.constrain(kp.raw_scale)
    ls = kx.constrain(kp.raw_lengthscale)
    g = 0.5 / (ls * ls)
    got = pkm._kernel_matrix_pallas(spec, scale, g, x1, x2, interpret=True)
    want = kx.kernel_matrix(spec, kp, x1, x2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


def test_fused_vjp_matches_autodiff():
    rng = np.random.default_rng(1)
    spec, kp, x1, x2 = problem(rng, n1=20, n2=15, latent=2)
    cot = jnp.asarray(rng.normal(size=(2, 20, 15)), jnp.float32)

    # compare the analytic backward directly against autodiff of the XLA path
    def loss_ref(raw_s, raw_l):
        k = kx.kernel_matrix(spec, kx.KernelParams(raw_s, raw_l), x1, x2)
        return jnp.sum(k * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(kp.raw_scale, kp.raw_lengthscale)

    def loss_fused(raw_s, raw_l):
        scale = kx.constrain(raw_s)
        g = 0.5 / (kx.constrain(raw_l) ** 2)
        d_scale, d_g, _, _ = pkm._fused_bwd(spec, (scale, g, x1, x2), cot)
        # chain rule back to raw params via jvp of the constraints
        _, pull_s = jax.vjp(kx.constrain, raw_s)
        _, pull_l = jax.vjp(lambda r: 0.5 / (kx.constrain(r) ** 2), raw_l)
        return pull_s(d_scale)[0], pull_l(d_g)[0]

    g_fused = loss_fused(kp.raw_scale, kp.raw_lengthscale)
    np.testing.assert_allclose(np.asarray(g_fused[0]), np.asarray(g_ref[0]), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_fused[1]), np.asarray(g_ref[1]), rtol=1e-4, atol=1e-6)


def test_block_pair_matches_reference_interpret():
    """Lane-packed [L,S,T,T] pair builder == XLA block_kernel_matrix."""
    from lvae_tpu.kernels_pallas.kernel_matrix import _block_pair_pallas

    rng = np.random.default_rng(0)
    L, S, T, Q = 4, 5, 6, 6
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    xb = rng.normal(size=(S, T, Q)).astype(np.float32)
    xb[:, :, 2] = np.repeat(np.arange(S), T).reshape(S, T)
    xb = jnp.asarray(xb)
    mask = jnp.asarray((rng.uniform(size=(S, T)) > 0.3).astype(np.float32))
    kp0 = kx.init_kernel_params(spec0, L)
    kp1 = kx.init_kernel_params(spec1, L)
    s0, g0 = kx.constrain(kp0.raw_scale), 0.5 / kx.constrain(kp0.raw_lengthscale) ** 2
    s1, g1 = kx.constrain(kp1.raw_scale), 0.5 / kx.constrain(kp1.raw_lengthscale) ** 2
    k0p, k1p = _block_pair_pallas(spec0, spec1, s0, g0, s1, g1, xb, mask, interpret=True)
    np.testing.assert_allclose(
        np.asarray(k0p), np.asarray(kx.block_kernel_matrix(spec0, kp0, xb, mask)),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(k1p), np.asarray(kx.block_kernel_matrix(spec1, kp1, xb, mask)),
        atol=1e-6,
    )


def test_block_pair_custom_vjp_matches_autodiff():
    from lvae_tpu.kernels_pallas.kernel_matrix import fused_block_pair

    rng = np.random.default_rng(1)
    L, S, T, Q = 3, 4, 5, 6
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    xb = rng.normal(size=(S, T, Q)).astype(np.float32)
    xb[:, :, 2] = np.repeat(np.arange(S), T).reshape(S, T)
    xb = jnp.asarray(xb)
    mask = jnp.asarray((rng.uniform(size=(S, T)) > 0.2).astype(np.float32))
    kp0 = kx.init_kernel_params(spec0, L)
    kp1 = kx.init_kernel_params(spec1, L)
    s0, g0 = kx.constrain(kp0.raw_scale), 0.5 / kx.constrain(kp0.raw_lengthscale) ** 2
    s1, g1 = kx.constrain(kp1.raw_scale), 0.5 / kx.constrain(kp1.raw_lengthscale) ** 2
    w0 = jnp.asarray(rng.normal(size=(L, S, T, T)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(L, S, T, T)).astype(np.float32))

    def loss_pallas(a, b, c, d):
        k0, k1 = fused_block_pair(spec0, spec1, a, b, c, d, xb, mask)
        return (k0 * w0).sum() + (k1 * w1).sum()

    def loss_ref(a, b, c, d):
        kpa = kx.KernelParams(kx.unconstrain(a), kx.unconstrain(jnp.sqrt(0.5 / b)))
        kpb = kx.KernelParams(kx.unconstrain(c), kx.unconstrain(jnp.sqrt(0.5 / d)))
        k0 = kx.block_kernel_matrix(spec0, kpa, xb, mask)
        k1 = kx.block_kernel_matrix(spec1, kpb, xb, mask)
        return (k0 * w0).sum() + (k1 * w1).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(s0, g0, s1, g1)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(s0, g0, s1, g1)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)
