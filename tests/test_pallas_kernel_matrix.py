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
        + 0.3 * rng.normal(size=kp.raw_scale.shape).astype(np.float32),
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
