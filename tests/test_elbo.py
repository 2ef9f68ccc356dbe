"""Property tests: the sparse block-structured bounds vs dense numpy oracles.

The oracle formulas use plain dense linear algebra (no Woodbury, no
block-diagonal shortcuts): with Q0 = K0xz K0zz⁻¹ K0zx and B = blockdiag(K1_p)
+ σ²I, the model covariance is Σ = Q0 + B and

  elbo  = -½ N log 2π - ½(log|Σ| + yᵀΣ⁻¹y) - ½ tr(B⁻¹(K0 - Q0))
  dubo  = ½ (tr(Σ⁻¹D) + μᵀΣ⁻¹μ - N + log|Σ| - log|D| + tr(B⁻¹(K0 - Q0)))

which the implementation computes through per-subject T×T Cholesky and M×M
inducing solves (elbo_functions.py:36-142). Any disagreement flags either the
masking/padding machinery or the Woodbury algebra.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvae_tpu.ops import elbo as eb
from lvae_tpu.ops import kernels as kx

EPS = 1e-6


def make_problem(rng, P=4, T=3, L=3, M=5, ragged=False):
    """Small longitudinal problem. Covariates: [time, binary, id, category]."""
    t_lens = rng.integers(2, T + 1, size=P) if ragged else np.full(P, T)
    rows = []
    for p in range(P):
        for t in range(t_lens[p]):
            rows.append([t * 1.0, rng.integers(0, 2), float(p), float(rng.integers(0, 3))])
    x = np.asarray(rows, dtype=np.float64)
    n = x.shape[0]

    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2, 3],
        bin_kernel=[1],
        sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    kp0 = kx.init_kernel_params(spec0, latent_dim=L, dtype=jnp.float64)
    kp1 = kx.init_kernel_params(spec1, latent_dim=L, dtype=jnp.float64)
    # randomise hyperparams so the test isn't at the symmetric init point
    kp0 = kp0._replace(
        raw_scale=kp0.raw_scale + 0.3 * rng.normal(size=kp0.raw_scale.shape),
        raw_lengthscale=kp0.raw_lengthscale + 0.3 * rng.normal(size=kp0.raw_lengthscale.shape),
    )
    kp1 = kp1._replace(
        raw_scale=kp1.raw_scale + 0.3 * rng.normal(size=kp1.raw_scale.shape),
        raw_lengthscale=kp1.raw_lengthscale + 0.3 * rng.normal(size=kp1.raw_lengthscale.shape),
    )
    noise = jnp.asarray(0.5 + rng.uniform(0.0, 0.5, size=L))
    z = jnp.asarray(x[rng.choice(n, size=M, replace=False)] + 0.01 * rng.normal(size=(M, 4)))

    mu = rng.normal(size=(n, L))
    log_var = rng.normal(size=(n, L)) * 0.3 - 1.0
    y = rng.normal(size=(n, L))

    # padded block layout
    t_max = int(t_lens.max())
    xb = np.zeros((P, t_max, 4))
    mask = np.zeros((P, t_max))
    mu_b = np.zeros((P, t_max, L))
    lv_b = np.zeros((P, t_max, L))
    y_b = np.zeros((P, t_max, L))
    ofs = 0
    for p in range(P):
        tl = t_lens[p]
        xb[p, :tl] = x[ofs : ofs + tl]
        mask[p, :tl] = 1.0
        mu_b[p, :tl] = mu[ofs : ofs + tl]
        lv_b[p, :tl] = log_var[ofs : ofs + tl]
        y_b[p, :tl] = y[ofs : ofs + tl]
        ofs += tl

    return dict(
        x=x, t_lens=t_lens, spec0=spec0, spec1=spec1, kp0=kp0, kp1=kp1,
        noise=noise, z=z, mu=mu, log_var=log_var, y=y,
        xb=jnp.asarray(xb), mask=jnp.asarray(mask), mu_b=jnp.asarray(mu_b),
        lv_b=jnp.asarray(lv_b), y_b=jnp.asarray(y_b), L=L, M=M, P=P,
    )


def dense_pieces(pr, l):
    """Dense per-latent-dim matrices for the oracle."""
    x, z = pr["x"], pr["z"]
    k0 = np.asarray(kx.kernel_matrix(pr["spec0"], pr["kp0"], jnp.asarray(x), jnp.asarray(x)))[l]
    k1 = np.asarray(kx.kernel_matrix(pr["spec1"], pr["kp1"], jnp.asarray(x), jnp.asarray(x)))[l]
    k0xz = np.asarray(kx.kernel_matrix(pr["spec0"], pr["kp0"], jnp.asarray(x), z))[l]
    k0zz = np.asarray(kx.kernel_matrix(pr["spec0"], pr["kp0"], z, z))[l] + EPS * np.eye(pr["M"])
    sigma_noise = float(pr["noise"][l])

    # B: block-diagonal restriction of K1 + σ²I (K1 is exactly block-diagonal
    # because every kernel1 component contains the id equality factor)
    n = x.shape[0]
    b = np.zeros((n, n))
    ofs = 0
    for tl in pr["t_lens"]:
        sl = slice(ofs, ofs + tl)
        b[sl, sl] = k1[sl, sl]
        ofs += tl
    assert np.allclose(b, k1), "kernel1 must be block-diagonal over subjects"
    b = b + sigma_noise * np.eye(n)

    q0 = k0xz @ np.linalg.solve(k0zz, k0xz.T)
    sigma = q0 + b
    return k0, k1, k0xz, k0zz, b, q0, sigma


def block_trace_term(pr, l):
    k0, _, k0xz, k0zz, b, q0, _ = dense_pieces(pr, l)
    ib = np.linalg.inv(b)
    # B⁻¹ is block-diagonal → only block entries of K0/Q0 contribute
    return np.trace(ib @ k0) - np.trace(ib @ q0)


@pytest.mark.parametrize("ragged", [False, True])
def test_gp_elbo_matches_dense_oracle(ragged):
    rng = np.random.default_rng(1)
    pr = make_problem(rng, ragged=ragged)
    ops = eb.gp_block_operators(
        pr["spec0"], pr["spec1"], pr["kp0"], pr["kp1"], pr["noise"],
        pr["xb"], pr["z"], pr["mask"], eps=EPS,
    )
    got = np.asarray(eb.gp_elbo(ops, pr["y_b"]))
    n = pr["x"].shape[0]
    for l in range(pr["L"]):
        _, _, _, _, _, _, sigma = dense_pieces(pr, l)
        y = pr["y"][:, l]
        sign, logdet = np.linalg.slogdet(sigma)
        want = (
            -0.5 * n * np.log(2 * np.pi)
            - 0.5 * (logdet + y @ np.linalg.solve(sigma, y))
            - 0.5 * block_trace_term(pr, l)
        )
        np.testing.assert_allclose(got[l], want, rtol=1e-8)


@pytest.mark.parametrize("ragged", [False, True])
def test_dubo_matches_dense_oracle(ragged):
    rng = np.random.default_rng(2)
    pr = make_problem(rng, ragged=ragged)
    ops = eb.gp_block_operators(
        pr["spec0"], pr["spec1"], pr["kp0"], pr["kp1"], pr["noise"],
        pr["xb"], pr["z"], pr["mask"], eps=EPS,
    )
    got = np.asarray(eb.dubo(ops, pr["mu_b"], pr["lv_b"]))
    n = pr["x"].shape[0]
    for l in range(pr["L"]):
        _, _, _, _, _, _, sigma = dense_pieces(pr, l)
        mu = pr["mu"][:, l]
        v = np.exp(pr["log_var"][:, l])
        isig = np.linalg.inv(sigma)
        sign, logdet = np.linalg.slogdet(sigma)
        want = 0.5 * (
            np.trace(isig * v[None, :])  # tr(Σ⁻¹ D), D diagonal
            + mu @ isig @ mu
            - n
            + logdet
            - np.sum(pr["log_var"][:, l])
            + block_trace_term(pr, l)
        )
        np.testing.assert_allclose(got[l], want, rtol=1e-8)


def test_dubo_gradients_finite_on_ragged_blocks():
    """d dubo/d log_var must be finite at padded slots (regression: the
    sqrt(v) factor has an infinite derivative at v == 0, and without the
    double-where the padded slots' NaN cotangent chains through
    exp(log_var)·mask as inf·0 — VI phase-2 on a ragged joint cohort
    NaN'd its first Adam step through exactly this path)."""
    rng = np.random.default_rng(2)
    pr = make_problem(rng, ragged=True)
    assert not np.asarray(pr["mask"]).all(), "problem must be ragged"
    ops = eb.gp_block_operators(
        pr["spec0"], pr["spec1"], pr["kp0"], pr["kp1"], pr["noise"],
        pr["xb"], pr["z"], pr["mask"], eps=EPS,
    )

    def total(args):
        mu_b, lv_b = args
        return jnp.sum(eb.dubo(ops, mu_b, lv_b))

    val, (g_mu, g_lv) = jax.value_and_grad(total)((pr["mu_b"], pr["lv_b"]))
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g_mu)).all()
    assert np.isfinite(np.asarray(g_lv)).all()


def test_dubo_upper_bounds_kl_closed():
    """DUBO ≥ exact KL against the full GP prior (it is an upper bound)."""
    rng = np.random.default_rng(3)
    pr = make_problem(rng, ragged=False)
    ops = eb.gp_block_operators(
        pr["spec0"], pr["spec1"], pr["kp0"], pr["kp1"], pr["noise"],
        pr["xb"], pr["z"], pr["mask"], eps=EPS,
    )
    dubo_vals = np.asarray(eb.dubo(ops, pr["mu_b"], pr["lv_b"]))
    x = jnp.asarray(pr["x"])
    k0 = kx.kernel_matrix(pr["spec0"], pr["kp0"], x, x)
    k1 = kx.kernel_matrix(pr["spec1"], pr["kp1"], x, x)
    n = x.shape[0]
    for l in range(pr["L"]):
        k_full = k0[l] + k1[l] + pr["noise"][l] * jnp.eye(n, dtype=jnp.float64)
        kl = float(eb.kl_closed(k_full, jnp.asarray(pr["mu"][:, l]), jnp.asarray(pr["log_var"][:, l])))
        assert dubo_vals[l] >= kl - 1e-6


@pytest.mark.parametrize("ragged", [False, True])
def test_minibatch_kld_matches_dense_oracle(ragged):
    rng = np.random.default_rng(4)
    pr = make_problem(rng, ragged=ragged)
    L, M = pr["L"], pr["M"]
    m = jnp.asarray(rng.normal(size=(L, M, 1)))
    h_half = rng.normal(size=(L, M, M)) / np.sqrt(M)
    H = jnp.asarray(h_half @ np.swapaxes(h_half, -1, -2) + 0.5 * np.eye(M))

    ops = eb.gp_block_operators(
        pr["spec0"], pr["spec1"], pr["kp0"], pr["kp1"], pr["noise"],
        pr["xb"], pr["z"], pr["mask"], eps=EPS,
    )
    n = pr["x"].shape[0]
    p_tot, p_batch = 10.0, float(pr["P"])
    got, _ = eb.minibatch_kld(
        ops, m, H, pr["mu_b"], pr["lv_b"], P_tot=p_tot, P_batch=p_batch, N_tot=25.0
    )

    # dense oracle (elbo_functions.py:188-204 with dense algebra)
    total_abcdef = 0.0
    kld_qu_pu = 0.0
    for l in range(L):
        k0, _, k0xz, k0zz, b, q0, _ = dense_pieces(pr, l)
        ib = np.linalg.inv(b)
        ik0zz = np.linalg.inv(k0zz)
        m_l = np.asarray(m)[l, :, 0]
        h_l = np.asarray(H)[l]
        mu_l = pr["mu"][:, l]
        v_l = np.exp(pr["log_var"][:, l])
        r = k0xz @ ik0zz @ m_l - mu_l
        a = r @ ib @ r
        b_term = np.sum(np.diag(ib) * v_l)
        c = np.linalg.slogdet(b)[1]
        d = np.trace(ib @ k0) - np.trace(ib @ q0)
        e = np.trace(ik0zz @ h_l @ ik0zz @ (k0xz.T @ ib @ k0xz))
        f = np.sum(pr["log_var"][:, l])
        total_abcdef += a + b_term + c + d + e - f
        kld_qu_pu += 0.5 * (
            np.trace(ik0zz @ h_l)
            + m_l @ ik0zz @ m_l
            - M
            + np.linalg.slogdet(k0zz)[1]
            - np.linalg.slogdet(h_l)[1]
        )
    want = p_tot / p_batch * 0.5 * total_abcdef + kld_qu_pu - L * 25.0 / 2.0
    np.testing.assert_allclose(float(got), want, rtol=1e-8)


def test_natural_gradients_match_autodiff():
    """grad_m / grad_H (elbo_functions.py:207-214) equal autodiff of the bound
    with P_tot == P_batch."""
    rng = np.random.default_rng(5)
    pr = make_problem(rng, ragged=False)
    L, M = pr["L"], pr["M"]
    m = jnp.asarray(rng.normal(size=(L, M, 1)))
    h_half = rng.normal(size=(L, M, M)) / np.sqrt(M)
    H = jnp.asarray(h_half @ np.swapaxes(h_half, -1, -2) + 0.5 * np.eye(M))

    def kld_fn(m_, H_):
        ops = eb.gp_block_operators(
            pr["spec0"], pr["spec1"], pr["kp0"], pr["kp1"], pr["noise"],
            pr["xb"], pr["z"], pr["mask"], eps=EPS,
        )
        val, _ = eb.minibatch_kld(
            ops, m_, H_, pr["mu_b"], pr["lv_b"],
            P_tot=float(pr["P"]), P_batch=float(pr["P"]), N_tot=float(pr["x"].shape[0]),
        )
        return val

    ops = eb.gp_block_operators(
        pr["spec0"], pr["spec1"], pr["kp0"], pr["kp1"], pr["noise"],
        pr["xb"], pr["z"], pr["mask"], eps=EPS,
    )
    _, ng = eb.minibatch_kld(
        ops, m, H, pr["mu_b"], pr["lv_b"],
        P_tot=float(pr["P"]), P_batch=float(pr["P"]), N_tot=float(pr["x"].shape[0]),
        natural_gradient=True,
    )
    auto_m = jax.grad(kld_fn, argnums=0)(m, H)
    auto_h = jax.grad(kld_fn, argnums=1)(m, H)
    np.testing.assert_allclose(np.asarray(ng.grad_m), np.asarray(auto_m), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ng.grad_H), np.asarray(auto_h), rtol=1e-6, atol=1e-8)


def test_natural_gradient_update_stays_psd():
    rng = np.random.default_rng(6)
    pr = make_problem(rng, ragged=False)
    L, M = pr["L"], pr["M"]
    m = jnp.asarray(rng.normal(size=(L, M, 1)))
    h_half = rng.normal(size=(L, M, M)) / np.sqrt(M)
    H = jnp.asarray(h_half @ np.swapaxes(h_half, -1, -2) + 0.5 * np.eye(M))
    ops = eb.gp_block_operators(
        pr["spec0"], pr["spec1"], pr["kp0"], pr["kp1"], pr["noise"],
        pr["xb"], pr["z"], pr["mask"], eps=EPS,
    )
    _, ng = eb.minibatch_kld(
        ops, m, H, pr["mu_b"], pr["lv_b"],
        P_tot=float(pr["P"]), P_batch=float(pr["P"]), N_tot=float(pr["x"].shape[0]),
        natural_gradient=True,
    )
    m2, h2 = eb.natural_gradient_update(m, H, ng, lr=0.01)
    eigs = np.linalg.eigvalsh(np.asarray(h2))
    assert np.all(eigs > 0), "H must remain PSD after the natural-gradient step"
    assert np.all(np.isfinite(np.asarray(m2)))


def test_fixed_t_equals_ragged_path_when_lengths_equal():
    """Masked path with full mask must equal the unmasked fixed-T path."""
    rng = np.random.default_rng(7)
    pr = make_problem(rng, ragged=False)
    ops_masked = eb.gp_block_operators(
        pr["spec0"], pr["spec1"], pr["kp0"], pr["kp1"], pr["noise"],
        pr["xb"], pr["z"], pr["mask"], eps=EPS,
    )
    ops_plain = eb.gp_block_operators(
        pr["spec0"], pr["spec1"], pr["kp0"], pr["kp1"], pr["noise"],
        pr["xb"], pr["z"], None, eps=EPS,
    )
    a = np.asarray(eb.dubo(ops_masked, pr["mu_b"], pr["lv_b"]))
    b = np.asarray(eb.dubo(ops_plain, pr["mu_b"], pr["lv_b"]))
    np.testing.assert_allclose(a, b, rtol=1e-10)


@pytest.mark.parametrize("natural_gradient", [False, True])
def test_stacked_mm_chol_equals_separate(natural_gradient):
    """The stacked K0zz+H factorisation (one cholesky_and_inverse call,
    ops/elbo.use_stacked_mm_chol) must reproduce the separate-call path:
    same bound, same natural gradients, same autodiff gradients."""
    rng = np.random.default_rng(11)
    pr = make_problem(rng, ragged=True)
    L, M = pr["L"], pr["M"]
    m = jnp.asarray(rng.normal(size=(L, M, 1)))
    h_half = rng.normal(size=(L, M, M)) / np.sqrt(M)
    H = jnp.asarray(h_half @ np.swapaxes(h_half, -1, -2) + 0.5 * np.eye(M))

    def kld_and_ng(kp0, kp1, H_, stacked: bool):
        ops = eb.gp_block_operators(
            pr["spec0"], pr["spec1"], kp0, kp1, pr["noise"],
            pr["xb"], pr["z"], pr["mask"], eps=EPS,
            extra_spd=H_ if stacked else None,
        )
        hf = (
            (ops.extra_chol, ops.extra_inv)
            if ops.extra_chol is not None
            else None
        )
        return eb.minibatch_kld(
            ops, m, H_, pr["mu_b"], pr["lv_b"],
            P_tot=10.0, P_batch=float(pr["P"]), N_tot=25.0,
            natural_gradient=natural_gradient, H_factor=hf,
        )

    got, ng_got = kld_and_ng(pr["kp0"], pr["kp1"], H, True)
    want, ng_want = kld_and_ng(pr["kp0"], pr["kp1"], H, False)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-12)
    if natural_gradient:
        np.testing.assert_allclose(
            np.asarray(ng_got.grad_m), np.asarray(ng_want.grad_m), rtol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(ng_got.grad_H), np.asarray(ng_want.grad_H), rtol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(ng_got.iH), np.asarray(ng_want.iH), rtol=1e-10
        )

    # autodiff gradients w.r.t. kernel params AND H agree between the paths
    for stacked in (True, False):
        g = jax.grad(
            lambda args: kld_and_ng(args[0], args[1], args[2], stacked)[0]
        )((pr["kp0"], pr["kp1"], H))
        if stacked:
            g_stacked = g
        else:
            g_sep = g
    for a, b in zip(jax.tree.leaves(g_stacked), jax.tree.leaves(g_sep)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12)


def test_stacked_mm_chol_shape_mismatch_falls_back():
    """An extra_spd whose shape differs from K0zz is factorised separately
    (no stacking) but still returned — the gate must not silently drop it."""
    rng = np.random.default_rng(12)
    pr = make_problem(rng, ragged=False)
    L, M = pr["L"], pr["M"]
    other = jnp.asarray(
        np.eye(M + 2)[None] * (1.0 + rng.uniform(size=(L, 1, 1)))
    )
    ops = eb.gp_block_operators(
        pr["spec0"], pr["spec1"], pr["kp0"], pr["kp1"], pr["noise"],
        pr["xb"], pr["z"], pr["mask"], eps=EPS, extra_spd=other,
    )
    assert ops.extra_chol is not None and ops.extra_chol.shape == other.shape
    want_l = np.linalg.cholesky(np.asarray(other))
    np.testing.assert_allclose(np.asarray(ops.extra_chol), want_l, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(ops.extra_inv), np.linalg.inv(np.asarray(other)), rtol=1e-8
    )
