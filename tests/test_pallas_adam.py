"""Fused flat-Adam kernel vs optax.adam (math oracle).

The kernel (kernels_pallas/adam.py) must be bit-for-bit the same *algorithm*
as optax.adam: mu/nu EMAs with bias correction, no eps_root. The jnp
fallback path is what the CPU test suite exercises in the trainers; the
Pallas body runs here in interpreter mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lvae_tpu.kernels_pallas.adam import _padded_len, fused_adam


def _tree(seed, dtype, sizes=((64, 3), (7,), (1,), (300, 30))):
    rng = np.random.default_rng(seed)
    return {
        f"w{i}": jnp.asarray(rng.normal(size=s), dtype)
        for i, s in enumerate(sizes)
    }, rng


def _run(opt, params, grads_seq):
    state = opt.init(params)
    for g in grads_seq:
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return params


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.float32])
def test_jnp_fallback_matches_optax(dtype):
    """On CPU the fused transform takes the jnp path — identical trajectories."""
    params, rng = _tree(0, dtype)
    grads_seq = [
        jax.tree.map(
            lambda p: jnp.asarray(rng.normal(size=p.shape), dtype), params
        )
        for _ in range(8)
    ]
    lr = 3e-3
    p_ref = _run(optax.adam(lr), params, grads_seq)
    p_fused = _run(fused_adam(lr), params, grads_seq)
    tol = 1e-12 if dtype == jnp.float64 else 2e-6
    for k in params:
        np.testing.assert_allclose(p_fused[k], p_ref[k], rtol=tol, atol=tol)


def test_pallas_kernel_matches_optax_interpret():
    """The Pallas body itself (interpret mode), f32, multi-block grid."""
    # big enough to need >1 grid block: > 512*128 elements
    params, rng = _tree(1, jnp.float32, sizes=((600, 130), (40,), (3, 5)))
    assert _padded_len(sum(p.size for p in params.values())) > 512 * 128
    grads_seq = [
        jax.tree.map(
            lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32),
            params,
        )
        for _ in range(5)
    ]
    lr = 1e-2
    p_ref = _run(optax.adam(lr), params, grads_seq)
    p_fused = _run(fused_adam(lr, interpret=True), params, grads_seq)
    for k in params:
        np.testing.assert_allclose(p_fused[k], p_ref[k], rtol=2e-6, atol=2e-6)


def test_pallas_kernel_tiny_tree_interpret():
    """Padding edge: a pytree far smaller than one tile."""
    params, rng = _tree(2, jnp.float32, sizes=((3,), (2, 2)))
    grads_seq = [
        jax.tree.map(
            lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32),
            params,
        )
        for _ in range(6)
    ]
    p_ref = _run(optax.adam(1e-2), params, grads_seq)
    p_fused = _run(fused_adam(1e-2, interpret=True), params, grads_seq)
    for k in params:
        np.testing.assert_allclose(p_fused[k], p_ref[k], rtol=2e-6, atol=2e-6)


def test_none_leaves_pass_through():
    """Trainables carry None fields (m/h_factor under natural gradients)."""
    params = {"a": jnp.ones((4, 4), jnp.float32), "b": None}
    grads = {"a": jnp.full((4, 4), 0.5, jnp.float32), "b": None}
    opt = fused_adam(1e-3)
    state = opt.init(params)
    updates, state = opt.update(grads, state, params)
    assert updates["b"] is None
    assert np.all(np.isfinite(np.asarray(updates["a"])))
