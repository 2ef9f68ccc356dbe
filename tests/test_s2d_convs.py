"""Space-to-depth conv formulation (models/vae.py use_s2d_convs).

The TPU-lane-packing rewrite of ConvVAE's conv/pool/deconv chain must be the
SAME function: identical param tree (names, shapes, init values), identical
outputs modulo float reassociation, identical dropout-RNG consumption, and
matching gradients. The reference semantics being preserved are VAE.py:90-124
(encode/decode of the 36×36 ConvVAE).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lvae_tpu.models.vae as mv
from lvae_tpu.models.vae import ConvVAE


@pytest.fixture
def s2d_on():
    old = mv.use_s2d_convs
    mv.use_s2d_convs = True
    yield
    mv.use_s2d_convs = old


def _init(model, hw=36, n=3, seed=0):
    x = jnp.asarray(np.random.RandomState(seed).rand(n, hw, hw, 1))
    params = model.init(jax.random.PRNGKey(1), x)
    return params, x


def test_param_tree_identical(s2d_on):
    """Init under the fused path creates the exact tree nn.Conv would."""
    model = ConvVAE(latent_dim=4, dtype=jnp.float64)
    x = jnp.asarray(np.random.RandomState(0).rand(3, 36, 36, 1))
    mv.use_s2d_convs = False
    p_std = model.init(jax.random.PRNGKey(1), x)
    mv.use_s2d_convs = True
    p_s2d = model.init(jax.random.PRNGKey(1), x)
    flat_std = jax.tree_util.tree_flatten_with_path(p_std)
    flat_s2d = jax.tree_util.tree_flatten_with_path(p_s2d)
    assert [k for k, _ in flat_std[0]] == [k for k, _ in flat_s2d[0]]
    for (ka, a), (kb, b) in zip(flat_std[0], flat_s2d[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(ka))


def test_forward_equivalence_f64(s2d_on):
    """encode/decode match the standard path at machine precision in f64."""
    model = ConvVAE(latent_dim=6, dtype=jnp.float64)
    params, x = _init(model)
    mv.use_s2d_convs = False
    mu0, lv0 = model.apply(params, x, method=ConvVAE.encode)
    rec0 = model.apply(params, mu0, method=ConvVAE.decode)
    mv.use_s2d_convs = True
    mu1, lv1 = model.apply(params, x, method=ConvVAE.encode)
    rec1 = model.apply(params, mu1, method=ConvVAE.decode)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(lv1), np.asarray(lv0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(rec1), np.asarray(rec0), atol=1e-12)


def test_forward_equivalence_f32(s2d_on):
    model = ConvVAE(latent_dim=6, dtype=jnp.float32)
    params, x = _init(model)
    x = x.astype(jnp.float32)
    mv.use_s2d_convs = False
    mu0, lv0 = model.apply(params, x, method=ConvVAE.encode)
    mv.use_s2d_convs = True
    mu1, lv1 = model.apply(params, x, method=ConvVAE.encode)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lv1), np.asarray(lv0), atol=2e-5)


def test_dropout_rng_consumption_identical(s2d_on):
    """Training mode (dropout active): both paths draw the same masks, so the
    stochastic forward is ALSO equal — the fused path applies dropout to
    tensors of the standard layout/shape at the same call sites."""
    model = ConvVAE(latent_dim=6, dtype=jnp.float64, p=0.5)
    params, x = _init(model)
    rngs = {"dropout": jax.random.PRNGKey(7)}

    def fwd(flag):
        mv.use_s2d_convs = flag
        mu, lv = model.apply(
            params, x, False, method=ConvVAE.encode, rngs=rngs
        )
        rec = model.apply(params, mu, False, method=ConvVAE.decode, rngs=rngs)
        return mu, lv, rec

    mu0, lv0, rec0 = fwd(False)
    mu1, lv1, rec1 = fwd(True)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(rec1), np.asarray(rec0), atol=1e-12)


def test_gradient_equivalence(s2d_on):
    """d(loss)/d(params) matches between paths (f64, deterministic)."""
    model = ConvVAE(latent_dim=4, dtype=jnp.float64)
    params, x = _init(model, n=2)

    def loss(p):
        mu, lv = model.apply(p, x, method=ConvVAE.encode)
        rec = model.apply(p, mu, method=ConvVAE.decode)
        return jnp.sum((rec - x) ** 2) + jnp.sum(mu**2) + jnp.sum(lv**2)

    mv.use_s2d_convs = False
    g0 = jax.grad(loss)(params)
    mv.use_s2d_convs = True
    g1 = jax.grad(loss)(params)
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    assert len(flat0) == len(flat1)
    for (k, a), (_, b) in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-10, err_msg=str(k)
        )


def test_non_36_image_size(s2d_on):
    """The fused path is generic over image_hw % 4 == 0 (e.g. 28×28)."""
    model = ConvVAE(latent_dim=3, num_dim=28 * 28, image_hw=28, dtype=jnp.float64)
    params, x = _init(model, hw=28)
    mv.use_s2d_convs = False
    mu0, _ = model.apply(params, x, method=ConvVAE.encode)
    rec0 = model.apply(params, mu0, method=ConvVAE.decode)
    mv.use_s2d_convs = True
    mu1, _ = model.apply(params, x, method=ConvVAE.encode)
    rec1 = model.apply(params, mu1, method=ConvVAE.decode)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(rec1), np.asarray(rec0), atol=1e-12)


def test_auto_gate():
    """Default (None) = auto: S2D_AUTO_DEFAULT on TPU, always off on CPU."""
    assert mv.use_s2d_convs is None or isinstance(mv.use_s2d_convs, bool)
    old = mv.use_s2d_convs
    mv.use_s2d_convs = None
    try:
        expected = mv.S2D_AUTO_DEFAULT and jax.default_backend() == "tpu"
        assert mv._s2d_active() == expected
    finally:
        mv.use_s2d_convs = old


def test_hensman_epoch_integration(s2d_on):
    """The full Hensman epoch program (grads through encode/decode, Adam,
    natural gradients) traces and runs with the fused formulation, and its
    early trajectory matches the standard path (same seeds; differences are
    f32 reassociation only)."""
    from lvae_tpu.data.blocks import build_subject_blocks
    from lvae_tpu.data.datasets import ArrayDataset
    from lvae_tpu.ops import kernels as kx
    from lvae_tpu.train import hensman as th
    from lvae_tpu.train import state as st

    rng = np.random.RandomState(0)
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
    data = rng.uniform(size=(n, 36, 36, 1)).astype(np.float32)
    mask = np.ones((n, 36 * 36), np.float32)
    ds = ArrayDataset(data=data, labels=labels, mask=mask)
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2],
        sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    cfg = th.HensmanConfig(
        spec0=spec0, spec1=spec1, latent_dim=3, P_tot=p, N_tot=n,
        weight=0.5, loss_function="mse", natural_gradient=True,
        natural_gradient_lr=0.01, constrain_scales=True, eps=1e-5,
        dropout=False,
    )
    z = st.init_inducing_points(ds.labels, m_inducing=6, seed=0)

    def run(flag, epochs=3):
        mv.use_s2d_convs = flag
        model = ConvVAE(latent_dim=cfg.latent_dim, num_dim=36 * 36, p=0.0)
        trainer = th.HensmanTrainer(
            model, cfg, ds, blocks, z, subjects_per_batch=2, seed=0
        )
        return [trainer.run_epoch().net for _ in range(epochs)]

    losses_std = run(False)
    losses_s2d = run(True)
    assert np.all(np.isfinite(losses_s2d))
    np.testing.assert_allclose(losses_s2d, losses_std, rtol=1e-3)


def test_sharded_hensman_with_s2d(s2d_on):
    """The fused formulation composes with the mesh-parallel trainer: a 2x1
    data-mesh epoch equals the single-device epoch (f64)."""
    from lvae_tpu.data.blocks import build_subject_blocks
    from lvae_tpu.parallel.mesh import ShardedHensmanTrainer, make_mesh
    from lvae_tpu.train import hensman as th
    from lvae_tpu.train import state as st
    from tests.test_training import make_cfg

    rng = np.random.RandomState(1)
    p, t = 4, 3
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
    from lvae_tpu.data.datasets import ArrayDataset

    ds = ArrayDataset(
        data=rng.uniform(size=(n, 36, 36, 1)).astype(np.float64),
        labels=labels,
        mask=np.ones((n, 36 * 36), np.float64),
    )
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    cfg = make_cfg(True, p=p, t=t, latent_dim=3)._replace(N_tot=n)

    def build():
        model = ConvVAE(latent_dim=3, num_dim=36 * 36, p=0.0, dtype=jnp.float64)
        z = st.init_inducing_points(ds.labels, m_inducing=6, seed=0)
        return th.HensmanTrainer(
            model, cfg, ds, blocks, z, subjects_per_batch=2, seed=0,
            dtype=jnp.float64,
        )

    ref = build()
    ref_hist = [ref.run_epoch().net for _ in range(2)]
    sharded = ShardedHensmanTrainer(build(), make_mesh(2, 1))
    got_hist = [sharded.run_epoch().net for _ in range(2)]
    np.testing.assert_allclose(got_hist, ref_hist, rtol=1e-8)
