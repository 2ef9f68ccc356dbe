"""Model-layer tests: shapes, loss semantics (VAE.py:16-273), dropout rng."""

import jax
import jax.numpy as jnp
import numpy as np

from lvae_tpu.models import vae as mv


def init_conv(latent_dim=8, key=0):
    model = mv.ConvVAE(latent_dim=latent_dim, num_dim=36 * 36, vy_init=1.0, p=0.5)
    x = jnp.zeros((2, 36, 36, 1), jnp.float32)
    params = model.init(jax.random.key(key), x, deterministic=True)
    return model, params


def test_convvae_shapes():
    model, params = init_conv()
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(3, 36, 36, 1)), jnp.float32)
    recon, mu, log_var = model.apply(params, x, deterministic=True)
    assert recon.shape == (3, 36, 36, 1)
    assert mu.shape == (3, 8) and log_var.shape == (3, 8)
    assert float(recon.min()) >= 0.0 and float(recon.max()) <= 1.0


def test_simplevae_shapes():
    model = mv.SimpleVAE(latent_dim=4, num_dim=100)
    x = jnp.zeros((5, 100), jnp.float32)
    params = model.init(jax.random.key(0), x)
    recon, mu, log_var = model.apply(params, x, deterministic=True)
    assert recon.shape == (5, 100) and mu.shape == (5, 4)


def test_vy_initialisation():
    """vy == vy_init at init through the softplus floor (VAE.py:32-42)."""
    _, params = init_conv()
    vy = mv.vy_from_params(params)
    np.testing.assert_allclose(np.asarray(vy), 1.0, rtol=1e-5)


def test_loss_function_masked_mse():
    rng = np.random.default_rng(0)
    n, d = 4, 10
    recon = jnp.asarray(rng.uniform(size=(n, d)))
    x = jnp.asarray(rng.uniform(size=(n, d)))
    mask = jnp.asarray(rng.integers(0, 2, size=(n, d)).astype(np.float64))
    raw_log_vy = jnp.zeros((d,))
    mse, nll = mv.vae_loss(raw_log_vy, recon, x, mask)
    se = np.asarray((recon - x) ** 2 * mask)
    want_mse = se.sum(1) / np.maximum(np.asarray(mask).sum(1), 1)
    np.testing.assert_allclose(np.asarray(mse), want_mse, rtol=1e-6)
    # NLL: se/(2 vy) + const for EVERY pixel (VAE.py:160-161)
    want_nll = (se / 2.0 + 0.5 * np.log(2 * np.pi)).sum(1)
    np.testing.assert_allclose(np.asarray(nll), want_nll, rtol=1e-6)


def test_loss_all_masked_row_is_finite():
    recon = jnp.ones((2, 5))
    x = jnp.zeros((2, 5))
    mask = jnp.asarray([[0.0] * 5, [1.0] * 5])
    mse, nll = mv.vae_loss(jnp.zeros((5,)), recon, x, mask)
    assert np.isfinite(np.asarray(mse)).all()
    assert float(mse[0]) == 0.0


def test_sample_latent_reparameterisation():
    mu = jnp.asarray([[1.0, 2.0]])
    log_var = jnp.asarray([[-30.0, -30.0]])  # ~zero std
    z = mv.sample_latent(jax.random.key(0), mu, log_var)
    np.testing.assert_allclose(np.asarray(z), np.asarray(mu), atol=1e-5)


def test_dropout_is_stochastic_in_train_mode():
    model, params = init_conv()
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 36, 36, 1)), jnp.float32)
    r1, *_ = model.apply(params, x, deterministic=False, rngs={"dropout": jax.random.key(1)})
    r2, *_ = model.apply(params, x, deterministic=False, rngs={"dropout": jax.random.key(2)})
    r3, *_ = model.apply(params, x, deterministic=False, rngs={"dropout": jax.random.key(1)})
    assert not np.allclose(np.asarray(r1), np.asarray(r2))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r3))


def test_encode_decode_roundtrip_jits():
    model, params = init_conv()
    x = jnp.zeros((2, 36, 36, 1), jnp.float32)

    @jax.jit
    def fwd(p, x):
        return model.apply(p, x, deterministic=True)

    recon, mu, lv = fwd(params, x)
    assert recon.shape == x.shape


def test_rnn_bidirectional_full_receptive_field():
    """Every timepoint's variational moments must see the WHOLE subject
    sequence: the backward pass is re-aligned to forward time order
    (keep_order=True), so perturbing a MIDDLE frame changes the moments at
    t=0 — the misaligned sum (backward state over [T-1-t..T-1]) would leave
    the middle invisible to early timepoints."""
    import jax
    import jax.numpy as jnp

    from lvae_tpu.models.rnn import RNNVAE

    t = 6
    model = RNNVAE(latent_dim=3, num_dim=10, T=t, hidden_dim=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(t, 10)), jnp.float32)
    params = jax.jit(lambda k, xx: model.init(k, xx, deterministic=True))(
        jax.random.key(0), x
    )

    def moments(xx):
        mu, lv = model.apply(params, xx, method=RNNVAE.encode)
        return np.asarray(mu)

    base = moments(x)
    for t_perturb in (t - 1, t // 2):  # last frame AND a middle frame
        xp = x.at[t_perturb].add(1.0)
        delta0 = np.abs(moments(xp)[0] - base[0]).max()
        assert delta0 > 1e-6, (
            f"moments at t=0 blind to frame {t_perturb} (delta {delta0})"
        )
    # and the forward direction: perturbing t=0 reaches the last timepoint
    xp = x.at[0].add(1.0)
    assert np.abs(moments(xp)[-1] - base[-1]).max() > 1e-6


def test_reshape_max_pool_forward_identity():
    """The reshape-based 2x2 pool (kept as a measured-negative A/B toggle,
    benchmarks/README.md r3 roofline) is forward-identical to nn.max_pool on
    non-overlapping windows; the ConvVAE forward is bitwise-unchanged."""
    import flax.linen as nn

    rng = np.random.default_rng(7)
    h = jnp.asarray(rng.standard_normal((3, 36, 36, 16)), jnp.float32)
    ref = nn.max_pool(h, (2, 2), strides=(2, 2))
    np.testing.assert_array_equal(np.asarray(_forced(h)), np.asarray(ref))


def _forced(h):
    old = mv.use_reshape_max_pool
    mv.use_reshape_max_pool = True
    try:
        return mv._max_pool_2x2(h)
    finally:
        mv.use_reshape_max_pool = old


def test_convvae_forward_same_under_pool_toggle():
    model, params = init_conv()
    x = jnp.asarray(np.random.default_rng(3).uniform(size=(2, 36, 36, 1)), jnp.float32)
    recon0, mu0, _ = model.apply(params, x, deterministic=True)
    old = mv.use_reshape_max_pool
    mv.use_reshape_max_pool = True
    try:
        recon1, mu1, _ = model.apply(params, x, deterministic=True)
    finally:
        mv.use_reshape_max_pool = old
    np.testing.assert_array_equal(np.asarray(mu0), np.asarray(mu1))
    np.testing.assert_array_equal(np.asarray(recon0), np.asarray(recon1))
