"""Unit tests for the kernel library against hand-computed matrices.

Semantics under test come from the reference:
  BinKernel: 1 iff x1+x2 == 2      (kernel_spec.py:23)
  CatKernel: 1 iff x1-x2 == 0      (kernel_spec.py:32)
  RBF: exp(-(d²)/(2 l²)), l=2.5    (kernel_spec.py:58-69)
  ScaleKernel wraps every component; missing-value masks multiply a BinKernel
  on the mask column (kernel_gen.py:29-34).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lvae_tpu.ops import kernels as kx


def params_with(spec, scales, lengthscales=None, latent_dim=None):
    c = spec.num_components
    kp = kx.init_kernel_params(spec, latent_dim=latent_dim, dtype=jnp.float64)
    raw_s = kx.unconstrain(jnp.asarray(scales, jnp.float64))
    kp = kp._replace(raw_scale=jnp.broadcast_to(raw_s, kp.raw_scale.shape))
    if lengthscales is not None:
        raw_l = kx.unconstrain(jnp.asarray(lengthscales, jnp.float64))
        kp = kp._replace(raw_lengthscale=jnp.broadcast_to(raw_l, kp.raw_lengthscale.shape))
    return kp


def test_constrain_roundtrip():
    vals = jnp.asarray([1e-6, 0.1, 0.6931, 2.5, 100.0], jnp.float64)
    raw = kx.unconstrain(vals)
    np.testing.assert_allclose(kx.constrain(raw), vals, rtol=1e-10)


def test_cat_kernel_hand():
    spec = kx.build_kernel_spec(cat_kernel=[0])
    x1 = jnp.asarray([[1.0], [2.0], [1.0]])
    x2 = jnp.asarray([[1.0], [3.0]])
    kp = params_with(spec, [1.0])
    k = kx.kernel_matrix(spec, kp, x1, x2)
    np.testing.assert_allclose(k, [[1, 0], [0, 0], [1, 0]], atol=1e-12)


def test_bin_kernel_hand():
    spec = kx.build_kernel_spec(bin_kernel=[0])
    x1 = jnp.asarray([[1.0], [0.0], [1.0]])
    x2 = jnp.asarray([[1.0], [0.0]])
    kp = params_with(spec, [2.0])
    k = kx.kernel_matrix(spec, kp, x1, x2)
    # both == 1 → 1, scaled by 2
    np.testing.assert_allclose(k, [[2, 0], [0, 0], [2, 0]], atol=1e-12)


def test_rbf_kernel_hand():
    spec = kx.build_kernel_spec(sqexp_kernel=[0])
    x1 = jnp.asarray([[0.0], [1.0]])
    x2 = jnp.asarray([[0.0], [3.0]])
    kp = params_with(spec, [1.0], [2.5])
    k = np.asarray(kx.kernel_matrix(spec, kp, x1, x2))
    expect = np.exp(-np.asarray([[0.0, 9.0], [1.0, 4.0]]) / (2 * 2.5**2))
    np.testing.assert_allclose(k, expect, rtol=1e-12)


def test_interaction_kernel_hand():
    # cat x rbf interaction: k = 1[x_cat equal] * exp(-d_cont²/2l²), scaled
    spec = kx.build_kernel_spec(
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 1}]
    )
    x1 = jnp.asarray([[0.0, 1.0], [1.0, 2.0]])
    x2 = jnp.asarray([[2.0, 1.0], [0.0, 2.0]])
    kp = params_with(spec, [3.0], [2.0])
    k = np.asarray(kx.kernel_matrix(spec, kp, x1, x2))
    rbf = np.exp(-np.asarray([[4.0, 0.0], [1.0, 1.0]]) / (2 * 4.0))
    cat = np.asarray([[1.0, 0.0], [0.0, 1.0]])
    np.testing.assert_allclose(k, 3.0 * rbf * cat, rtol=1e-12)


def test_missing_value_mask():
    # covariate 0 (rbf) has missing values flagged by mask column 1
    spec = kx.build_kernel_spec(
        sqexp_kernel=[0], covariate_missing_val=[{"covariate": 0, "mask": 1}]
    )
    assert spec.components[0].and_cols == (1,)
    x1 = jnp.asarray([[0.0, 1.0], [1.0, 0.0]])
    x2 = jnp.asarray([[0.0, 1.0]])
    kp = params_with(spec, [1.0], [2.5])
    k = np.asarray(kx.kernel_matrix(spec, kp, x1, x2))
    assert k[0, 0] == pytest.approx(1.0)
    assert k[1, 0] == 0.0  # x1[1] has mask 0 → component vanishes


def test_additive_sum_and_latent_batch():
    spec = kx.build_kernel_spec(cat_kernel=[1], sqexp_kernel=[0])
    x = jnp.asarray([[0.0, 1.0], [1.0, 1.0], [2.0, 2.0]])
    kp = kx.init_kernel_params(spec, latent_dim=4, dtype=jnp.float64)
    k = kx.kernel_matrix(spec, kp, x, x)
    assert k.shape == (4, 3, 3)
    # all latent dims share the same init → identical slices
    np.testing.assert_allclose(k[0], k[3], rtol=1e-12)
    # sum of components: diag = scale_cat + scale_rbf
    np.testing.assert_allclose(
        np.diagonal(np.asarray(k[0])), 2 * np.log(2.0), rtol=1e-10
    )


def test_split_kernel_spec_reference_config():
    """The sample config (config/LVAE_config_sample.txt:40-45) splits 2/3."""
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2],
        sqexp_kernel=[0],
        cat_int_kernel=[
            {"cont_covariate": 0, "cat_covariate": 2},
            {"cont_covariate": 0, "cat_covariate": 3},
            {"cont_covariate": 1, "cat_covariate": 4},
        ],
        id_covariate=2,
    )
    # kernel1: cat(id) + cat(id)*rbf(age); kernel0: rbf(age) + 2 interactions
    assert spec1.num_components == 2
    assert spec0.num_components == 3
    assert spec1.components[0].eq_cols == (2,)
    assert spec1.components[1].rbf_col == 0


def test_validity_mask_zeroes_rows_cols():
    spec = kx.build_kernel_spec(cat_kernel=[0])
    x = jnp.asarray([[1.0], [1.0], [1.0]])
    kp = params_with(spec, [1.0])
    mask = jnp.asarray([1.0, 0.0, 1.0])
    k = np.asarray(kx.kernel_matrix(spec, kp, x, x, mask1=mask, mask2=mask))
    assert k[1].sum() == 0 and k[:, 1].sum() == 0
    assert k[0, 2] == 1.0


def test_block_kernel_matrix_matches_per_subject():
    spec = kx.build_kernel_spec(cat_kernel=[1], sqexp_kernel=[0])
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.normal(size=(3, 4, 2)))
    kp = kx.init_kernel_params(spec, latent_dim=2, dtype=jnp.float64)
    kb = kx.block_kernel_matrix(spec, kp, xb)
    assert kb.shape == (2, 3, 4, 4)
    for p in range(3):
        kp_dense = kx.kernel_matrix(spec, kp, xb[p], xb[p])
        np.testing.assert_allclose(kb[:, p], kp_dense, rtol=1e-12)


def test_empty_spec_is_zero():
    spec = kx.KernelSpec(components=())
    kp = kx.init_kernel_params(spec, latent_dim=2, dtype=jnp.float64)
    x = jnp.asarray([[1.0], [2.0]])
    k = kx.kernel_matrix(spec, kp, x, x)
    assert k.shape == (2, 2, 2)
    assert np.all(np.asarray(k) == 0)


def test_cat_mod_kernel_hand():
    """Centred categorical kernel (kernel_spec.py:35-55): 1 if equal,
    -1/(num-1) otherwise."""
    comp = kx.KernelComponent(kind="cat_mod", rbf_col=-1, eq_cols=(), and_cols=(),
                              cat_mod=(0, 4))
    spec = kx.KernelSpec(components=(comp,))
    kp = params_with(spec, [1.0])
    x1 = jnp.asarray([[0.0], [1.0]])
    x2 = jnp.asarray([[0.0], [2.0]])
    k = np.asarray(kx.kernel_matrix(spec, kp, x1, x2))
    np.testing.assert_allclose(k, [[1.0, -1 / 3], [-1 / 3, -1 / 3]], rtol=1e-12)


def test_split_plus_join_equals_full_kernel_randomized():
    """Property: kernel0 + kernel1 from the split builder equals the single
    additive kernel from the full builder (generate_kernel vs
    generate_kernel_approx semantics, kernel_gen.py:9-197) on random specs."""
    rng = np.random.default_rng(42)
    for trial in range(10):
        q = 6
        id_cov = int(rng.integers(0, q))
        kw = dict(
            cat_kernel=sorted(rng.choice(q, rng.integers(0, 3), replace=False).tolist()),
            bin_kernel=sorted(rng.choice(q, rng.integers(0, 2), replace=False).tolist()),
            sqexp_kernel=sorted(rng.choice(q, rng.integers(0, 3), replace=False).tolist()),
            cat_int_kernel=[
                {"cont_covariate": int(rng.integers(0, q)),
                 "cat_covariate": int(rng.integers(0, q))}
                for _ in range(rng.integers(0, 3))
            ],
            bin_int_kernel=[
                {"cont_covariate": int(rng.integers(0, q)),
                 "bin_covariate": int(rng.integers(0, q))}
                for _ in range(rng.integers(0, 2))
            ],
            covariate_missing_val=(
                [{"covariate": int(rng.integers(0, q)), "mask": int(rng.integers(0, q))}]
                if rng.uniform() < 0.5 else []
            ),
        )
        full = kx.build_kernel_spec(**kw)
        s0, s1 = kx.split_kernel_spec(id_covariate=id_cov, **kw)
        assert s0.num_components + s1.num_components == full.num_components
        # same multiset of components
        assert sorted(s0.components + s1.components) == sorted(full.components)
        # every kernel1 component involves the id covariate as an eq factor
        for comp in s1.components:
            assert id_cov in comp.eq_cols
        # numerically: K_full == K0 + K1 with matching per-component params
        if full.num_components == 0:
            continue
        x = jnp.asarray(
            np.stack([rng.integers(0, 3, 12).astype(float) for _ in range(q)], 1)
        )
        kp_full = kx.init_kernel_params(full, latent_dim=2, dtype=jnp.float64)
        # split params follow the split component order; rebuild by matching
        order0 = [full.components.index(c) for c in s0.components]
        order1 = [full.components.index(c) for c in s1.components]
        kp0 = kx.KernelParams(kp_full.raw_scale[:, order0], kp_full.raw_lengthscale[:, order0])
        kp1 = kx.KernelParams(kp_full.raw_scale[:, order1], kp_full.raw_lengthscale[:, order1])
        k_full = kx.kernel_matrix(full, kp_full, x, x)
        k_sum = kx.kernel_matrix(s0, kp0, x, x) + kx.kernel_matrix(s1, kp1, x, x)
        np.testing.assert_allclose(np.asarray(k_full), np.asarray(k_sum), rtol=1e-12)
