"""Pallas batched Cholesky+inverse kernel vs jnp.linalg (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvae_tpu.kernels_pallas.cholesky import (
    _chol_inv_bwd,
    _chol_inv_fwd,
    cholesky_inverse,
    cholesky_inverse_interpret,
)
from lvae_tpu.ops import linalg as la


def spd_stack(rng, batch, n, dtype=np.float32):
    h = rng.normal(size=batch + (n, n)).astype(dtype) / np.sqrt(n)
    a = h @ np.swapaxes(h, -1, -2) + 0.5 * np.eye(n, dtype=dtype)
    return jnp.asarray(a)


@pytest.mark.parametrize("shape,n", [((7,), 4), ((3, 5), 8), ((2,), 20)])
def test_kernel_matches_lapack(shape, n):
    rng = np.random.default_rng(0)
    a = spd_stack(rng, shape, n)
    l_got, inv_got = cholesky_inverse_interpret(a)
    l_want = np.linalg.cholesky(np.asarray(a, np.float64))
    inv_want = np.linalg.inv(np.asarray(a, np.float64))
    np.testing.assert_allclose(np.asarray(l_got), l_want, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(inv_got), inv_want, rtol=2e-3, atol=2e-4)


def test_cpu_fallback_path():
    """On CPU the public entry uses the XLA path and still matches."""
    rng = np.random.default_rng(1)
    a = spd_stack(rng, (4,), 6)
    l, inv = cholesky_inverse(a)
    np.testing.assert_allclose(
        np.asarray(l), np.linalg.cholesky(np.asarray(a)), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(inv @ a), np.broadcast_to(np.eye(6), (4, 6, 6)), atol=1e-4
    )


def test_custom_vjp_matches_autodiff():
    """The shared VJP equals autodiff through cholesky + cho_solve-inverse."""
    rng = np.random.default_rng(2)
    a = spd_stack(rng, (3,), 5, dtype=np.float64)

    def f_custom(a_):
        l, inv = cholesky_inverse(a_)
        return (
            jnp.sum(jnp.log(jnp.diagonal(l, axis1=-2, axis2=-1)))
            + jnp.sum(inv * jnp.cos(jnp.arange(5.0)))
        )

    def f_ref(a_):
        l = jnp.linalg.cholesky(a_)
        inv = la.chol_inverse(l)
        return (
            jnp.sum(jnp.log(jnp.diagonal(l, axis1=-2, axis2=-1)))
            + jnp.sum(inv * jnp.cos(jnp.arange(5.0)))
        )

    # build symmetric input from unconstrained params, as the GP code does
    def through_sym(f):
        def g(h):
            sym = h @ jnp.swapaxes(h, -1, -2) + 0.5 * jnp.eye(5)
            return f(sym)

        return g

    h0 = jnp.asarray(rng.normal(size=(3, 5, 5)))
    g_custom = jax.grad(through_sym(f_custom))(h0)
    g_ref = jax.grad(through_sym(f_ref))(h0)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref), rtol=1e-8)


def test_vjp_inverse_only_and_chol_only():
    rng = np.random.default_rng(3)
    a = spd_stack(rng, (2,), 4, dtype=np.float64)

    def sym(h):
        return h @ jnp.swapaxes(h, -1, -2) + 0.4 * jnp.eye(4)

    h0 = jnp.asarray(rng.normal(size=(2, 4, 4)))
    for pick in (0, 1):
        g1 = jax.grad(lambda h: jnp.sum(cholesky_inverse(sym(h))[pick] ** 2))(h0)
        g2 = jax.grad(
            lambda h: jnp.sum(
                (
                    jnp.linalg.cholesky(sym(h))
                    if pick == 0
                    else la.chol_inverse(jnp.linalg.cholesky(sym(h)))
                )
                ** 2
            )
        )(h0)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-7)
