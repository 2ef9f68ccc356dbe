"""Generate golden parity files by DRIVING THE REFERENCE CODE itself.

This script imports `/root/reference`'s own math modules (elbo_functions.py,
utils.py, validation.py, training.py's natural-gradient update loop) and runs
them in float64 on tiny fixed-seed cohorts, serialising inputs and outputs to
``tests/goldens/reference_goldens.npz``. ``tests/test_parity_reference.py``
then asserts that lvae_tpu reproduces every quantity from the *same inputs*.

gpytorch is not installable in this environment, so the kernel engine is the
reference's own dependency-free kernel stack ``GP_model.py`` (GP_model.py:7-236
— torch.nn only, the exact raw-parameter/softplus semantics of the GPyTorch
path), bridged to elbo_functions' GPyTorch-facing interface with two thin
adapters:

* ``_Eval`` wraps a kernel module so calls return an object with
  ``.evaluate()`` (GPyTorch LazyTensor protocol used at
  elbo_functions.py:171-174, utils.py:139-150);
* ``_NoiseCovar`` exposes ``likelihood.noise_covar.noise`` with the ``[L, 1]``
  shape GPyTorch's batched GaussianLikelihood carries
  (elbo_functions.py:174, utils.py:172).

No reference code is modified; ``torch.solve`` (removed in torch>=1.13) is
re-aliased to ``torch.linalg.solve`` with the legacy argument order before the
reference modules run.

Run:  python tools/make_reference_goldens.py
"""

from __future__ import annotations

import sys

import numpy as np
import torch

torch.set_default_dtype(torch.float64)
torch.manual_seed(0)

# torch.solve was removed upstream; reference code (elbo_functions.py:115,
# utils.py:184,191) uses the legacy signature solve(B, A) -> (X, LU).
# NB: modern torch still EXPOSES a callable torch.solve stub that raises
# "now removed" when called, so a callable() presence test cannot gate this
# — override unconditionally.
def _legacy_solve(b, a):
    return torch.linalg.solve(a, b), a


torch.solve = _legacy_solve

sys.path.insert(0, "/root/reference")

import GP_model as gm  # noqa: E402  (reference's dependency-free kernel stack)
import elbo_functions as ef  # noqa: E402
import utils as ru  # noqa: E402
import validation as rv  # noqa: E402


class _Lazy:
    def __init__(self, t):
        self._t = t

    def evaluate(self):
        return self._t


class _Eval(torch.nn.Module):
    """GPyTorch-call-protocol adapter over a GP_model kernel module.

    GPyTorch batched kernels broadcast ``batch_shape=[L]`` against inputs of
    shape ``[P, L, T, Q]`` (latent stacked at dim=1, elbo_functions.py:170);
    GP_model's per-dim parameters broadcast only with latent-first layouts.
    The adapter transposes to ``[L, P, T, Q]`` around the call so the
    reference math sees the layout GP_model was written for.
    """

    def __init__(self, kernel):
        super().__init__()
        self.kernel = kernel

    def forward(self, x1, x2):
        if x1.dim() == 4 and x2.dim() == 4:
            r = self.kernel(x1.transpose(0, 1), x2.transpose(0, 1))
            return _Lazy(r.transpose(0, 1))
        return _Lazy(self.kernel(x1, x2))


class _NoiseCovar:
    """`likelihood.noise_covar.noise` of shape [L, 1] (batched) or [1, 1]."""

    def __init__(self, lik):
        self._lik = lik

    @property
    def noise(self):
        return self._lik.noise.unsqueeze(-1)


def make_likelihood(noise_values):
    lik = gm.Likelihoods(len(noise_values), torch.tensor(1.0))
    with torch.no_grad():
        lik._log_noise.copy_(
            torch.log(torch.as_tensor(noise_values) - torch.exp(lik.min_log_noise))
        )
    lik.noise_covar = _NoiseCovar(lik)
    return lik


def _walk_set_params(additive, scales, lengthscales):
    """Assign per-component constrained scale/lengthscale values in builder order.

    ``additive`` is a GP_model AdditiveKernel of ScaleKernels; ``scales`` is
    [L, C]; ``lengthscales`` [L, C] (ignored entries for non-RBF components).
    """

    def find_rbf(k):
        if isinstance(k, gm.RbfKernel):
            return k
        if isinstance(k, gm.ProductKernel):
            return find_rbf(k.k1) or find_rbf(k.k2)
        if isinstance(k, gm.ScaleKernel):
            return find_rbf(k.kernel)
        return None

    for c, sk in enumerate(additive.kernels):
        assert isinstance(sk, gm.ScaleKernel)
        sk.scale = torch.as_tensor(scales[:, c])
        rbf = find_rbf(sk.kernel)
        if rbf is not None:
            rbf.lengthscale = torch.as_tensor(lengthscales[:, c])


def count_components(additive):
    return len(additive.kernels)


def has_rbf_flags(additive):
    def find_rbf(k):
        if isinstance(k, gm.RbfKernel):
            return True
        if isinstance(k, gm.ProductKernel):
            return find_rbf(k.k1) or find_rbf(k.k2)
        if isinstance(k, gm.ScaleKernel):
            return find_rbf(k.kernel)
        return False

    return [find_rbf(sk) for sk in additive.kernels]


def make_cohort(rng, subject_T, Q, id_covariate, t_start=0, extra_mask_col=False):
    """Subject-major covariate rows with the HealthMNIST column layout.

    Columns: [time_age, disease_time, subject, gender, disease, location]
    (dataset_def.py:163 reorder), plus an optional 0/1 mask column for the
    covariate_missing_val machinery (kernel_gen.py:25-34).
    """
    rows = []
    for s, T in enumerate(subject_T):
        gender = float(rng.integers(0, 2))
        disease = float(rng.integers(0, 2))
        location = float(rng.integers(0, 3))
        for t in range(T):
            age = float(t_start + t) + float(rng.normal(0.0, 0.05))
            dtime = float(t) if disease > 0.5 else 0.0
            row = [age, dtime, float(s), gender, disease, location]
            if extra_mask_col:
                row.append(float(disease > 0.5))  # mask: disease_time observed
            rows.append(row)
    x = np.asarray(rows, dtype=np.float64)
    assert x.shape[1] == Q
    return x


def main():
    rng = np.random.default_rng(20240816)
    out = {}

    # ------------------------------------------------------------------ setup
    # Spec A: the shipped sample config (config/LVAE_config_sample.txt:40-45).
    L, M, Q, id_cov, eps = 4, 8, 6, 2, 1e-6
    specA = dict(
        cat_kernel=[2],
        bin_kernel=[],
        sqexp_kernel=[0],
        cat_int_kernel=[
            {"cont_covariate": 0, "cat_covariate": 2},
            {"cont_covariate": 0, "cat_covariate": 3},
            {"cont_covariate": 1, "cat_covariate": 4},
        ],
        bin_int_kernel=[],
        covariate_missing_val=[],
    )
    k0A, k1A = gm.generate_kernel_batched(
        L,
        specA["cat_kernel"],
        specA["bin_kernel"],
        specA["sqexp_kernel"],
        specA["cat_int_kernel"],
        specA["bin_int_kernel"],
        specA["covariate_missing_val"],
        id_cov,
    )
    c0, c1 = count_components(k0A), count_components(k1A)
    scales0 = rng.uniform(0.4, 2.2, size=(L, c0))
    scales1 = rng.uniform(0.4, 2.2, size=(L, c1))
    ls0 = rng.uniform(0.8, 3.5, size=(L, c0))
    ls1 = rng.uniform(0.8, 3.5, size=(L, c1))
    _walk_set_params(k0A, scales0, ls0)
    _walk_set_params(k1A, scales1, ls1)
    w0A, w1A = _Eval(k0A), _Eval(k1A)
    noise = rng.uniform(0.05, 0.4, size=(L,))
    lik = make_likelihood(noise)

    out.update(
        A_scales0=scales0, A_scales1=scales1, A_ls0=ls0, A_ls1=ls1,
        A_rbf0=np.asarray(has_rbf_flags(k0A)), A_rbf1=np.asarray(has_rbf_flags(k1A)),
        noise=noise, eps=np.float64(eps), id_covariate=np.int64(id_cov),
    )

    # Fixed-T cohort: P=6 subjects, T=5.
    P, T = 6, 5
    x_fix = make_cohort(rng, [T] * P, Q, id_cov)
    N = P * T
    mu = rng.normal(0.0, 1.0, size=(N, L))
    log_var = rng.normal(-1.0, 0.3, size=(N, L))
    m_var = rng.normal(0.0, 0.7, size=(L, M, 1))
    a = rng.normal(0.0, 0.4, size=(L, M, M))
    H_var = a @ a.transpose(0, 2, 1) + 0.5 * np.eye(M)
    # Inducing points: covariate rows in the training range (the reference
    # slices dataset rows, LVAE.py:199-204). Same z for every latent dim.
    z_rows = make_cohort(rng, [3, 3, 2], Q, id_cov)[:M]
    assert z_rows.shape[0] == M
    zt_list = np.broadcast_to(z_rows, (L, M, Q)).copy()

    out.update(
        x_fix=x_fix, mu=mu, log_var=log_var, m_var=m_var, H_var=H_var,
        z=z_rows, P=np.int64(P), T=np.int64(T),
    )

    tx = torch.as_tensor(x_fix)
    tmu = torch.as_tensor(mu)
    tlv = torch.as_tensor(log_var)
    tm = torch.as_tensor(m_var)
    tH = torch.as_tensor(H_var)
    tz_b = torch.as_tensor(zt_list)
    tz = torch.as_tensor(z_rows)

    # ------------------------------------------ minibatch KLD (fixed T, full)
    kld, gm_, gH = ef.minibatch_KLD_upper_bound(
        w0A, w1A, lik, L, tm, tH, tx, tmu, tlv, tz_b, P, P, T, True, eps
    )
    out.update(
        mb_kld=kld.detach().numpy(),
        mb_grad_m=gm_.detach().numpy(),
        mb_grad_H=gH.detach().numpy(),
    )

    # ------------------------------- minibatch KLD on a subject subset (P0<P)
    P_b = 4
    sel = x_fix[:, id_cov] < P_b
    kld_b, gm_b, gH_b = ef.minibatch_KLD_upper_bound(
        w0A, w1A, lik, L, tm, tH, tx[sel], tmu[sel], tlv[sel], tz_b, P, P_b, T,
        True, eps,
    )
    out.update(
        mbb_kld=kld_b.detach().numpy(),
        mbb_grad_m=gm_b.detach().numpy(),
        mbb_grad_H=gH_b.detach().numpy(),
        mbb_P_batch=np.int64(P_b),
    )

    # --------------------------------------------- varying-T (_iter) cohort
    subject_T = [3, 5, 2, 4, 5]
    x_var = make_cohort(rng, subject_T, Q, id_cov)
    Nv = x_var.shape[0]
    mu_v = rng.normal(0.0, 1.0, size=(Nv, L))
    lv_v = rng.normal(-1.0, 0.3, size=(Nv, L))
    txv = torch.as_tensor(x_var)
    kld_v, gm_v, gH_v = ef.minibatch_KLD_upper_bound_iter(
        w0A, w1A, lik, L, tm, tH, txv, torch.as_tensor(mu_v),
        torch.as_tensor(lv_v), tz_b, len(subject_T), len(subject_T), Nv, True,
        id_cov, eps,
    )
    out.update(
        x_var=x_var, mu_var=mu_v, log_var_var=lv_v,
        subject_T=np.asarray(subject_T, dtype=np.int64),
        it_kld=kld_v.detach().numpy(),
        it_grad_m=gm_v.detach().numpy(),
        it_grad_H=gH_v.detach().numpy(),
    )

    # ------------------------------------------------- validation DUBO (L-sum)
    vd = rv.validation_dubo(L, w0A, w1A, lik, tx, tmu, tlv, tz_b, P, T, eps)
    out["validation_dubo"] = vd.detach().numpy()

    # -------------------------------- per-dim elbo / DUBO / KL_closed goldens
    # The standard (non-Hensman) path drives per-dim single-output kernels
    # (LVAE.py:243-279). Reuse dim l's hyperparameters in a latent_dim=1 build.
    elbo_vals, dubo_vals, klc_vals = [], [], []
    y_sample = rng.normal(0.0, 1.0, size=(N, L))
    out["y_sample"] = y_sample
    for l in range(L):
        k0l, k1l = gm.generate_kernel_batched(
            1, specA["cat_kernel"], specA["bin_kernel"], specA["sqexp_kernel"],
            specA["cat_int_kernel"], specA["bin_int_kernel"],
            specA["covariate_missing_val"], id_cov,
        )
        _walk_set_params(k0l, scales0[l : l + 1], ls0[l : l + 1])
        _walk_set_params(k1l, scales1[l : l + 1], ls1[l : l + 1])
        likl = make_likelihood(noise[l : l + 1])
        w0l, w1l = _Eval(k0l), _Eval(k1l)
        el = ef.elbo(
            w0l, w1l, likl, tx, torch.as_tensor(y_sample[:, l]), tz, P, T, eps
        )
        db = ef.deviance_upper_bound(
            w0l, w1l, likl, tx, tmu[:, l], tlv[:, l], tz, P, T, eps
        )
        elbo_vals.append(el.item())
        dubo_vals.append(db.item())

        # KL_closed uses the *combined* kernel K0+K1 over all N rows
        # (LVAE.py:243-258 passes the un-split covar_module).
        kfull = gm.AdditiveKernel(list(k0l.kernels) + list(k1l.kernels))
        klc = ef.KL_closed(
            _Eval(kfull), tx, likl, torch.zeros(N), tmu[:, l], tlv[:, l]
        )
        klc_vals.append(klc.item())
    out["elbo_per_dim"] = np.asarray(elbo_vals)
    out["dubo_per_dim"] = np.asarray(dubo_vals)
    out["kl_closed_per_dim"] = np.asarray(klc_vals)

    # ------------------------------------------------ natural-gradient steps
    # The reference in-loop update (training.py:129-135) iterated 5 times with
    # encoder outputs held fixed — isolates the (m, H) dynamics.
    ng_lr = 0.05
    m_t, H_t = tm.clone(), tH.clone()
    ng_m_traj, ng_H_traj, ng_kld_traj = [], [], []
    for _ in range(5):
        kld_s, g_m, g_H = ef.minibatch_KLD_upper_bound(
            w0A, w1A, lik, L, m_t, H_t, tx, tmu, tlv, tz_b, P, P, T, True, eps
        )
        LH = torch.cholesky(H_t)
        iH = torch.cholesky_solve(torch.eye(M), LH)
        iH_new = iH + ng_lr * (g_H + g_H.transpose(-1, -2))
        LiH_new = torch.cholesky(iH_new)
        H_t = torch.cholesky_solve(torch.eye(M), LiH_new).detach()
        m_t = torch.matmul(
            H_t, torch.matmul(iH, m_t) - ng_lr * (g_m - 2 * torch.matmul(g_H, m_t))
        ).detach()
        ng_kld_traj.append(kld_s.item())
        ng_m_traj.append(m_t.numpy().copy())
        ng_H_traj.append(H_t.numpy().copy())
    out.update(
        ng_lr=np.float64(ng_lr),
        ng_kld_traj=np.asarray(ng_kld_traj),
        ng_m_traj=np.asarray(ng_m_traj),
        ng_H_traj=np.asarray(ng_H_traj),
    )

    # --------------------------------------------- batch_predict_varying_T
    # Queries: future timepoints of training subjects 0,1,3 + one unseen
    # subject (id 97 — gets only the shared term, utils.py:192-207).
    test_T = [3, 2, 4, 3]
    x_test = make_cohort(rng, test_T, Q, id_cov, t_start=6)
    ids = np.concatenate(
        [np.full(t, s) for t, s in zip(test_T, [0.0, 1.0, 3.0, 97.0])]
    )
    x_test[:, id_cov] = ids
    zp = ru.batch_predict_varying_T(
        L, w0A, w1A, lik, txv, torch.as_tensor(x_test),
        torch.as_tensor(mu_v), tz_b, id_cov, eps,
    )
    out.update(x_test=x_test, z_pred_varying=zp.detach().numpy())

    # Fixed-T cohort through the same predictor (covers batch_predict's math,
    # utils.py:213-296, which is the fixed-T special case).
    test_T2 = [2, 2]
    x_test2 = make_cohort(rng, test_T2, Q, id_cov, t_start=6)
    x_test2[:, id_cov] = np.concatenate([np.full(2, 0.0), np.full(2, 4.0)])
    zp2 = ru.batch_predict_varying_T(
        L, w0A, w1A, lik, tx, torch.as_tensor(x_test2), tmu, tz_b, id_cov, eps
    )
    out.update(x_test_fix=x_test2, z_pred_fix=zp2.detach().numpy())

    # ---------------------------------- batch_predict (fixed-T, utils.py:213)
    zp_bp = ru.batch_predict(
        L, w0A, w1A, lik, tx, torch.as_tensor(x_test2), tmu, tz_b, P, T,
        id_cov, eps,
    )
    out["z_pred_batch"] = zp_bp.detach().numpy()

    # -------------------------- predict (per-dim single kernel, utils.py:298)
    pred_per_dim = []
    for l in range(L):
        k0l, k1l = gm.generate_kernel_batched(
            1, specA["cat_kernel"], specA["bin_kernel"], specA["sqexp_kernel"],
            specA["cat_int_kernel"], specA["bin_int_kernel"],
            specA["covariate_missing_val"], id_cov,
        )
        _walk_set_params(k0l, scales0[l : l + 1], ls0[l : l + 1])
        _walk_set_params(k1l, scales1[l : l + 1], ls1[l : l + 1])
        likl = make_likelihood(noise[l : l + 1])
        zp_l = ru.predict(
            _Eval(k0l), _Eval(k1l), likl, tx, torch.as_tensor(x_test2),
            tmu[:, l], tz, P, T, id_cov, eps,
        )
        pred_per_dim.append(zp_l.detach().numpy())
    out["z_pred_per_dim"] = np.stack(pred_per_dim, axis=1)  # [Nq, L]

    # ------------------------------ Spec B: bin/bin-int + missing-value masks
    QB = 7
    specB = dict(
        cat_kernel=[2],
        bin_kernel=[4],
        sqexp_kernel=[0, 1],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        bin_int_kernel=[{"cont_covariate": 0, "bin_covariate": 4}],
        covariate_missing_val=[{"covariate": 1, "mask": 6}],
    )
    k0B, k1B = gm.generate_kernel_batched(
        L, specB["cat_kernel"], specB["bin_kernel"], specB["sqexp_kernel"],
        specB["cat_int_kernel"], specB["bin_int_kernel"],
        specB["covariate_missing_val"], id_cov,
    )
    c0B, c1B = count_components(k0B), count_components(k1B)
    B_scales0 = rng.uniform(0.4, 2.2, size=(L, c0B))
    B_scales1 = rng.uniform(0.4, 2.2, size=(L, c1B))
    B_ls0 = rng.uniform(0.8, 3.5, size=(L, c0B))
    B_ls1 = rng.uniform(0.8, 3.5, size=(L, c1B))
    _walk_set_params(k0B, B_scales0, B_ls0)
    _walk_set_params(k1B, B_scales1, B_ls1)
    w0B, w1B = _Eval(k0B), _Eval(k1B)
    xB = make_cohort(rng, [T] * P, QB, id_cov, extra_mask_col=True)
    zB = make_cohort(rng, [3, 3, 2], QB, id_cov, extra_mask_col=True)[:M]
    # Spec B's grad_H runs a double iK0zz sandwich; with near-duplicate z rows
    # K0zz's condition number (~3e5 even after jitter) squares away all the
    # comparable f64 digits. Spread the continuous z columns so the golden is
    # well-posed — parity is same-input/same-output regardless of z.
    zB[:, 0] += rng.normal(0.0, 0.6, size=M)
    zB[:, 1] += rng.uniform(0.0, 2.0, size=M)
    eps_B = 1e-4
    kldB, gmB, gHB = ef.minibatch_KLD_upper_bound(
        w0B, w1B, lik, L, tm, tH, torch.as_tensor(xB), tmu, tlv,
        torch.as_tensor(np.broadcast_to(zB, (L, M, QB)).copy()), P, P, T, True,
        eps_B,
    )
    out.update(
        B_scales0=B_scales0, B_scales1=B_scales1, B_ls0=B_ls0, B_ls1=B_ls1,
        B_rbf0=np.asarray(has_rbf_flags(k0B)), B_rbf1=np.asarray(has_rbf_flags(k1B)),
        x_B=xB, z_B=zB, eps_B=np.float64(eps_B),
        Bspec_kld=kldB.detach().numpy(),
        Bspec_grad_m=gmB.detach().numpy(),
        Bspec_grad_H=gHB.detach().numpy(),
    )

    # ----------------------- fuzz: random kernel structures through the
    # reference bound (one KLD+grads golden per spec; structures cover every
    # factor type and nesting the config grammar can express)
    fuzz_specs = [
        dict(cat_kernel=[2, 3], bin_kernel=[], sqexp_kernel=[0, 1],
             cat_int_kernel=[], bin_int_kernel=[], covariate_missing_val=[]),
        dict(cat_kernel=[2], bin_kernel=[3, 4], sqexp_kernel=[],
             cat_int_kernel=[{"cont_covariate": 1, "cat_covariate": 2}],
             bin_int_kernel=[], covariate_missing_val=[]),
        dict(cat_kernel=[2, 5], bin_kernel=[4], sqexp_kernel=[0],
             cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 5}],
             bin_int_kernel=[{"cont_covariate": 1, "bin_covariate": 3}],
             covariate_missing_val=[]),
        dict(cat_kernel=[2], bin_kernel=[], sqexp_kernel=[0, 1],
             cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2},
                             {"cont_covariate": 1, "cat_covariate": 2}],
             bin_int_kernel=[], covariate_missing_val=[]),
    ]
    n_fuzz = len(fuzz_specs)
    out["fuzz_n"] = np.int64(n_fuzz)
    for fi, fs in enumerate(fuzz_specs):
        k0f, k1f = gm.generate_kernel_batched(
            L, fs["cat_kernel"], fs["bin_kernel"], fs["sqexp_kernel"],
            fs["cat_int_kernel"], fs["bin_int_kernel"],
            fs["covariate_missing_val"], id_cov,
        )
        c0f, c1f = count_components(k0f), count_components(k1f)
        sc0 = rng.uniform(0.4, 2.2, size=(L, c0f))
        sc1 = rng.uniform(0.4, 2.2, size=(L, max(c1f, 1)))[:, :c1f]
        l0 = rng.uniform(0.8, 3.5, size=(L, c0f))
        l1 = rng.uniform(0.8, 3.5, size=(L, max(c1f, 1)))[:, :c1f]
        _walk_set_params(k0f, sc0, l0)
        if c1f:
            _walk_set_params(k1f, sc1, l1)
        kldf, gmf, gHf = ef.minibatch_KLD_upper_bound(
            _Eval(k0f), _Eval(k1f), lik, L, tm, tH, tx, tmu, tlv, tz_b,
            P, P, T, True, 1e-4,
        )
        out.update({
            f"fz{fi}_scales0": sc0, f"fz{fi}_scales1": sc1,
            f"fz{fi}_ls0": l0, f"fz{fi}_ls1": l1,
            f"fz{fi}_kld": kldf.detach().numpy(),
            f"fz{fi}_grad_m": gmf.detach().numpy(),
            f"fz{fi}_grad_H": gHf.detach().numpy(),
        })

    path = "tests/goldens/reference_goldens.npz"
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {len(out)} arrays")
    for k in sorted(out):
        v = np.asarray(out[k])
        print(f"  {k:22s} {v.shape} {v.dtype}")


if __name__ == "__main__":
    main()
