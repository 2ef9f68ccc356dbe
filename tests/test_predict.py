"""GP posterior prediction vs a dense numpy oracle.

Oracle: Z_pred = (Q0(X,x) + K1(X,x)) Σ⁻¹ μ with Σ = Q0(x,x) + B,
B = blockdiag(K1) + σ²I — plain dense algebra, no Woodbury, no blocking.
The implementation (lvae_tpu/ops/predict.py) must agree on ragged cohorts
including query subjects that have no training data (utils.py:115-211).
"""

import jax.numpy as jnp
import numpy as np

from lvae_tpu.ops import kernels as kx
from lvae_tpu.ops.predict import predict_latents

EPS = 1e-6


def build_cohort(rng, subjects, t_range):
    rows = []
    for s in subjects:
        t_len = rng.integers(*t_range)
        for t in range(t_len):
            rows.append([float(t), float(rng.integers(0, 2)), float(s), float(rng.integers(0, 3))])
    return np.asarray(rows, dtype=np.float64)


def test_predict_matches_dense_oracle():
    rng = np.random.default_rng(10)
    train_x = build_cohort(rng, [0, 1, 2, 3, 4], (2, 5))
    # queries: known subjects at new times + an unseen subject 9
    test_x = build_cohort(rng, [1, 3, 9], (2, 4))
    n, n_test = train_x.shape[0], test_x.shape[0]
    L, M = 3, 6

    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2],
        sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2},
                        {"cont_covariate": 0, "cat_covariate": 3}],
        id_covariate=2,
    )
    kp0 = kx.init_kernel_params(spec0, latent_dim=L, dtype=jnp.float64)
    kp1 = kx.init_kernel_params(spec1, latent_dim=L, dtype=jnp.float64)
    kp0 = kp0._replace(raw_scale=kp0.raw_scale + 0.2 * rng.normal(size=kp0.raw_scale.shape))
    kp1 = kp1._replace(raw_scale=kp1.raw_scale + 0.2 * rng.normal(size=kp1.raw_scale.shape))
    noise = jnp.asarray(0.6 + rng.uniform(0, 0.4, size=L))
    z = jnp.asarray(train_x[rng.choice(n, M, replace=False)] + 0.01 * rng.normal(size=(M, 4)))
    mu = rng.normal(size=(n, L))

    got = predict_latents(
        spec0, spec1, kp0, kp1, noise,
        train_x, mu, test_x, z, id_covariate=2, eps=EPS,
    )
    assert got.shape == (n_test, L)

    tx = jnp.asarray(train_x)
    qx = jnp.asarray(test_x)
    k0 = np.asarray(kx.kernel_matrix(spec0, kp0, tx, tx))
    k1 = np.asarray(kx.kernel_matrix(spec1, kp1, tx, tx))
    k0xz = np.asarray(kx.kernel_matrix(spec0, kp0, tx, z))
    k0zz = np.asarray(kx.kernel_matrix(spec0, kp0, z, z)) + EPS * np.eye(M)
    k0Xz = np.asarray(kx.kernel_matrix(spec0, kp0, qx, z))
    k1Xx = np.asarray(kx.kernel_matrix(spec1, kp1, qx, tx))

    for l in range(L):
        q0 = k0xz[l] @ np.linalg.solve(k0zz[l], k0xz[l].T)
        sigma = q0 + k1[l] + float(noise[l]) * np.eye(n)
        q0_Xx = k0Xz[l] @ np.linalg.solve(k0zz[l], k0xz[l].T)
        want = (q0_Xx + k1Xx[l]) @ np.linalg.solve(sigma, mu[:, l])
        np.testing.assert_allclose(got[:, l], want, rtol=1e-6, atol=1e-6)


def test_predict_unseen_subject_uses_only_shared_term():
    """A subject with no training data gets the shared (population) mean."""
    rng = np.random.default_rng(11)
    train_x = build_cohort(rng, [0, 1], (3, 4))
    test_x = build_cohort(rng, [7], (2, 3))  # unseen
    L, M = 2, 4
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2], sqexp_kernel=[0], id_covariate=2
    )
    kp0 = kx.init_kernel_params(spec0, latent_dim=L, dtype=jnp.float64)
    kp1 = kx.init_kernel_params(spec1, latent_dim=L, dtype=jnp.float64)
    noise = jnp.asarray([0.8, 1.1])
    z = jnp.asarray(train_x[: M])
    mu = rng.normal(size=(train_x.shape[0], L))
    got = predict_latents(spec0, spec1, kp0, kp1, noise, train_x, mu, test_x, z, 2, EPS)

    tx, qx = jnp.asarray(train_x), jnp.asarray(test_x)
    k1Xx = np.asarray(kx.kernel_matrix(spec1, kp1, qx, tx))
    assert np.abs(k1Xx).max() == 0.0  # id kernel vanishes for unseen subject
    assert np.all(np.isfinite(got))


def test_extend_path_equals_full_recompute_f64():
    """Serving split (precompute_predict_basis + gp_predict_extend) is the
    same posterior mean as the full recompute, regrouped: in f64, with the
    plain-eps jitter, the two paths must agree to near machine precision
    across kernel specs (incl. bin + missing-mask components)."""
    from lvae_tpu.data.blocks import build_subject_blocks
    from lvae_tpu.ops.predict import (
        gp_predict_extend,
        precompute_predict_basis,
        predict_latents,
    )

    specs = [
        dict(cat_kernel=[2], sqexp_kernel=[0],
             cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}]),
        dict(cat_kernel=[2], bin_kernel=[1], sqexp_kernel=[0],
             bin_int_kernel=[{"cont_covariate": 0, "bin_covariate": 2}]),
        dict(cat_kernel=[2], sqexp_kernel=[0],
             covariate_missing_val=[{"covariate": 1, "mask": 3}]),
    ]
    for si, kw in enumerate(specs):
        rng = np.random.default_rng(40 + si)
        basis_x = build_cohort(rng, [0, 1, 2, 3], (2, 5))
        L, M = 3, 5
        spec0, spec1 = kx.split_kernel_spec(id_covariate=2, **kw)
        kp0 = kx.init_kernel_params(spec0, latent_dim=L, dtype=jnp.float64)
        kp1 = kx.init_kernel_params(spec1, latent_dim=L, dtype=jnp.float64)
        kp0 = kp0._replace(
            raw_scale=kp0.raw_scale + 0.2 * rng.normal(size=kp0.raw_scale.shape))
        kp1 = kp1._replace(
            raw_scale=kp1.raw_scale + 0.2 * rng.normal(size=kp1.raw_scale.shape))
        noise = jnp.asarray(0.6 + rng.uniform(0, 0.4, size=L))
        n = basis_x.shape[0]
        z = jnp.asarray(
            basis_x[rng.choice(n, M, replace=False)]
            + 0.01 * rng.normal(size=(M, 4))
        )
        basis_mu = rng.normal(size=(n, L))

        t_obs, n_q = 4, 3
        obs_x = build_cohort(rng, [99], (t_obs, t_obs + 1))[:t_obs]
        obs_mu = rng.normal(size=(t_obs, L))
        query_x = build_cohort(rng, [99], (n_q, n_q + 1))[:n_q]
        query_x[:, 0] += 10.0  # future times

        # full path: observations concatenated into the regression basis
        # (LVAEPredictor.predict_latent_trajectory's construction)
        full = predict_latents(
            spec0, spec1, kp0, kp1, noise,
            np.concatenate([obs_x, basis_x]),
            np.concatenate([obs_mu, basis_mu]),
            query_x, z, id_covariate=2, eps=EPS,
        )

        blocks = build_subject_blocks(basis_x, 2)
        xb = jnp.asarray(basis_x[blocks.index] * blocks.mask[..., None])
        mu_b = jnp.asarray(basis_mu[blocks.index] * blocks.mask[..., None])
        basis = precompute_predict_basis(
            spec0, spec1, kp0, kp1, noise, xb,
            jnp.asarray(blocks.mask, jnp.float64), mu_b, z, eps=EPS,
        )
        ones_t = jnp.ones((t_obs,), jnp.float64)
        ones_q = jnp.ones((n_q,), jnp.float64)
        fast = gp_predict_extend(
            spec0, spec1, kp0, kp1, noise, basis,
            jnp.asarray(obs_x), ones_t, jnp.asarray(obs_mu),
            jnp.asarray(query_x), ones_q, z,
        )
        np.testing.assert_allclose(np.asarray(fast), full, rtol=1e-9, atol=1e-9)


def test_extend_batch_equals_full_recompute():
    """K new subjects in ONE request (gp_predict_extend_batch) == full
    recompute with the K subjects appended to the cohort, at 1e-6, for
    K in {2, 8} — incl. a ragged new-subject band and one data-free subject
    (VERDICT r2 item 5's done criterion)."""
    from lvae_tpu.data.blocks import build_subject_blocks
    from lvae_tpu.ops.predict import (
        gp_predict_extend_batch,
        precompute_predict_basis,
        predict_latents,
    )

    for k_new in (2, 8):
        rng = np.random.default_rng(60 + k_new)
        basis_x = build_cohort(rng, [0, 1, 2, 3, 4], (2, 5))
        L, M = 3, 6
        spec0, spec1 = kx.split_kernel_spec(
            cat_kernel=[2], sqexp_kernel=[0],
            cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
            id_covariate=2,
        )
        kp0 = kx.init_kernel_params(spec0, latent_dim=L, dtype=jnp.float64)
        kp1 = kx.init_kernel_params(spec1, latent_dim=L, dtype=jnp.float64)
        kp0 = kp0._replace(
            raw_scale=kp0.raw_scale + 0.2 * rng.normal(size=kp0.raw_scale.shape))
        kp1 = kp1._replace(
            raw_scale=kp1.raw_scale + 0.2 * rng.normal(size=kp1.raw_scale.shape))
        noise = jnp.asarray(0.6 + rng.uniform(0, 0.4, size=L))
        n = basis_x.shape[0]
        z = jnp.asarray(
            basis_x[rng.choice(n, M, replace=False)]
            + 0.01 * rng.normal(size=(M, 4))
        )
        basis_mu = rng.normal(size=(n, L))

        t_pad, n_q = 4, 3
        # K new subjects, ragged true lengths (2..t_pad), last one data-free
        x_new = np.zeros((k_new, t_pad, 4))
        mask_new = np.zeros((k_new, t_pad))
        mu_new = np.zeros((k_new, t_pad, L))
        Xq = np.zeros((k_new, n_q, 4))
        flat_obs_x, flat_obs_mu = [], []
        for j in range(k_new):
            sid = 100 + j
            tl = 0 if j == k_new - 1 else int(rng.integers(2, t_pad + 1))
            xo = build_cohort(rng, [sid], (t_pad, t_pad + 1))[:tl]
            mo = rng.normal(size=(tl, L))
            x_new[j, :tl] = xo
            mask_new[j, :tl] = 1.0
            mu_new[j, :tl] = mo
            flat_obs_x.append(xo)
            flat_obs_mu.append(mo)
            q = build_cohort(rng, [sid], (n_q, n_q + 1))[:n_q]
            q[:, 0] += 10.0  # future times
            Xq[j] = q
        flat_obs_x = np.concatenate(flat_obs_x) if flat_obs_x else np.zeros((0, 4))
        flat_obs_mu = np.concatenate(flat_obs_mu) if flat_obs_mu else np.zeros((0, L))

        # full path: all K subjects' observations join the regression basis
        full = predict_latents(
            spec0, spec1, kp0, kp1, noise,
            np.concatenate([flat_obs_x, basis_x]),
            np.concatenate([flat_obs_mu, basis_mu]),
            Xq.reshape(k_new * n_q, 4), z, id_covariate=2, eps=EPS,
        ).reshape(k_new, n_q, L)

        blocks = build_subject_blocks(basis_x, 2)
        xb = jnp.asarray(basis_x[blocks.index] * blocks.mask[..., None])
        mu_b = jnp.asarray(basis_mu[blocks.index] * blocks.mask[..., None])
        basis = precompute_predict_basis(
            spec0, spec1, kp0, kp1, noise, xb,
            jnp.asarray(blocks.mask, jnp.float64), mu_b, z, eps=EPS,
        )
        fast = gp_predict_extend_batch(
            spec0, spec1, kp0, kp1, noise, basis,
            jnp.asarray(x_new), jnp.asarray(mask_new), jnp.asarray(mu_new),
            jnp.asarray(Xq), jnp.ones((k_new, n_q), jnp.float64), z,
        )
        np.testing.assert_allclose(
            np.asarray(fast), full, rtol=1e-6, atol=1e-9
        )


def test_extend_basis_matches_full_refold():
    """Basis refresh (extend_predict_basis): folding K new TRAINING subjects
    into an existing basis == precompute_predict_basis on the union cohort
    at 1e-6 (VERDICT r3 item 7's done criterion), incl. a ragged new band —
    and a subsequent serving request through the refreshed basis matches the
    request through the refolded one."""
    from lvae_tpu.data.blocks import build_subject_blocks
    from lvae_tpu.ops.predict import (
        extend_predict_basis,
        gp_predict_extend_batch,
        precompute_predict_basis,
    )

    rng = np.random.default_rng(77)
    basis_x = build_cohort(rng, [0, 1, 2, 3], (2, 5))
    L, M = 3, 6
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    kp0 = kx.init_kernel_params(spec0, latent_dim=L, dtype=jnp.float64)
    kp1 = kx.init_kernel_params(spec1, latent_dim=L, dtype=jnp.float64)
    kp0 = kp0._replace(
        raw_scale=kp0.raw_scale + 0.2 * rng.normal(size=kp0.raw_scale.shape))
    kp1 = kp1._replace(
        raw_scale=kp1.raw_scale + 0.2 * rng.normal(size=kp1.raw_scale.shape))
    noise = jnp.asarray(0.6 + rng.uniform(0, 0.4, size=L))
    n = basis_x.shape[0]
    z = jnp.asarray(
        basis_x[rng.choice(n, M, replace=False)]
        + 0.01 * rng.normal(size=(M, 4))
    )
    basis_mu = rng.normal(size=(n, L))

    def fold(x, mu):
        blocks = build_subject_blocks(x, 2)
        xb = jnp.asarray(x[blocks.index] * blocks.mask[..., None])
        mu_b = jnp.asarray(mu[blocks.index] * blocks.mask[..., None])
        return precompute_predict_basis(
            spec0, spec1, kp0, kp1, noise, xb,
            jnp.asarray(blocks.mask, jnp.float64), mu_b, z, eps=EPS,
        )

    base = fold(basis_x, basis_mu)

    # two new training subjects, ragged (3 and 2 real rows in a T=3 pad)
    t_pad = 3
    x_new = np.zeros((2, t_pad, 4))
    mask_new = np.zeros((2, t_pad))
    mu_new = np.zeros((2, t_pad, L))
    flat_x, flat_mu = [], []
    for j, tl in enumerate((3, 2)):
        xo = build_cohort(rng, [200 + j], (t_pad, t_pad + 1))[:tl]
        mo = rng.normal(size=(tl, L))
        x_new[j, :tl] = xo
        mask_new[j, :tl] = 1.0
        mu_new[j, :tl] = mo
        flat_x.append(xo)
        flat_mu.append(mo)

    grown = extend_predict_basis(
        spec0, spec1, kp0, kp1, noise, base,
        jnp.asarray(x_new), jnp.asarray(mask_new), jnp.asarray(mu_new), z,
    )
    refold = fold(
        np.concatenate([basis_x] + flat_x),
        np.concatenate([basis_mu] + flat_mu),
    )
    np.testing.assert_allclose(
        np.asarray(grown.h_nojit), np.asarray(refold.h_nojit),
        rtol=1e-6, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(grown.c), np.asarray(refold.c), rtol=1e-6, atol=1e-9
    )

    # a serving request through the refreshed basis == through the refold
    t_obs, n_q = 3, 2
    xo = build_cohort(rng, [300], (t_obs, t_obs + 1))[:t_obs]
    mo = rng.normal(size=(t_obs, L))
    q = build_cohort(rng, [300], (n_q, n_q + 1))[:n_q]
    q[:, 0] += 10.0
    args = (
        jnp.asarray(xo)[None], jnp.ones((1, t_obs), jnp.float64),
        jnp.asarray(mo)[None], jnp.asarray(q)[None],
        jnp.ones((1, n_q), jnp.float64), z,
    )
    via_grown = gp_predict_extend_batch(
        spec0, spec1, kp0, kp1, noise, grown, *args
    )
    via_refold = gp_predict_extend_batch(
        spec0, spec1, kp0, kp1, noise, refold, *args
    )
    np.testing.assert_allclose(
        np.asarray(via_grown), np.asarray(via_refold), rtol=1e-6, atol=1e-9
    )
