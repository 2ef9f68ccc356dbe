"""GP-state export to the reference's resume format (LVAE.py:353-370).

Validation criterion (VERDICT r2 item 6): the exported ``gp_model.pth`` +
``zt_list/m/H.pth`` must load back through the reference's OWN engine — the
golden generator's GP_model kernel stack driving
``elbo_functions.minibatch_KLD_upper_bound`` — and reproduce the lvae_tpu
KLD at 1e-6. This proves a GP trained here resumes in the reference, making
migration bidirectional (the VAE .pth path already goes both ways).
"""

import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from lvae_tpu.ops import elbo as eb  # noqa: E402
from lvae_tpu.ops import kernels as kx  # noqa: E402
from lvae_tpu.train import state as st  # noqa: E402
from lvae_tpu.utils.torch_compat import (  # noqa: E402
    load_reference_gp_state,
    save_reference_gp_state,
)

SPEC = dict(
    cat_kernel=[2],
    bin_kernel=[],
    sqexp_kernel=[0],
    cat_int_kernel=[
        {"cont_covariate": 0, "cat_covariate": 2},
        {"cont_covariate": 0, "cat_covariate": 3},
    ],
    bin_int_kernel=[],
    covariate_missing_val=[{"covariate": 0, "mask": 6}],
)
ID_COV, Q, L, M, EPS = 2, 7, 3, 6, 1e-6


@pytest.fixture
def golden_module():
    """Import the golden-generator engine, restoring torch's default dtype
    afterwards — the tool sets float64 globally at import (by design, for
    bit-stable goldens), which otherwise leaks into every torch test that
    runs later in the session (observed: test_torch_compat's float32 models
    built with double biases)."""
    prev = torch.get_default_dtype()
    spec = importlib.util.spec_from_file_location(
        "ref_goldens", "/root/repo/tools/make_reference_goldens.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    yield mod
    torch.set_default_dtype(prev)


def _problem(seed=0):
    rng = np.random.default_rng(seed)
    spec0, spec1 = kx.split_kernel_spec(id_covariate=ID_COV, **SPEC)
    c0, c1 = spec0.num_components, spec1.num_components
    scales0 = rng.uniform(0.4, 2.2, size=(L, c0))
    scales1 = rng.uniform(0.4, 2.2, size=(L, c1))
    ls0 = rng.uniform(0.8, 3.5, size=(L, c0))
    ls1 = rng.uniform(0.8, 3.5, size=(L, c1))
    noise = rng.uniform(0.1, 0.5, size=(L,))
    kp0 = kx.KernelParams(
        raw_scale=jnp.asarray(kx.unconstrain(scales0)),
        raw_lengthscale=jnp.asarray(kx.unconstrain(ls0)),
    )
    kp1 = kx.KernelParams(
        raw_scale=jnp.asarray(kx.unconstrain(scales1)),
        raw_lengthscale=jnp.asarray(kx.unconstrain(ls1)),
    )
    gp = st.GPParams(
        kp0=kp0, kp1=kp1, raw_noise=jnp.asarray(kx.unconstrain(noise))
    )
    m = rng.normal(0.0, 0.7, size=(L, M, 1))
    a = rng.normal(0.0, 0.4, size=(L, M, M))
    H = a @ a.transpose(0, 2, 1) + 0.5 * np.eye(M)
    return spec0, spec1, gp, noise, m, H, rng


def test_export_reproduces_kld_through_reference_engine(tmp_path, golden_module):
    mg = golden_module
    spec0, spec1, gp, noise, m, H, rng = _problem()

    P, T = 5, 4
    x = mg.make_cohort(rng, [T] * P, Q, ID_COV, extra_mask_col=True)
    z = mg.make_cohort(rng, [3, 3], Q, ID_COV, extra_mask_col=True)[:M]
    mu = rng.normal(0.0, 1.0, size=(P * T, L))
    log_var = rng.normal(-1.0, 0.3, size=(P * T, L))

    # ---- lvae_tpu KLD on this state
    ops = eb.gp_block_operators(
        spec0, spec1, gp.kp0, gp.kp1, jnp.asarray(noise),
        jnp.asarray(x).reshape(P, T, Q), jnp.asarray(z), eps=EPS,
    )
    kld_ours, ng = eb.minibatch_kld(
        ops, jnp.asarray(m), jnp.asarray(H),
        jnp.asarray(mu).reshape(P, T, L), jnp.asarray(log_var).reshape(P, T, L),
        P_tot=P, P_batch=P, N_tot=P * T, natural_gradient=True,
    )

    # ---- export, then rebuild the REFERENCE's kernel state from the files
    save_reference_gp_state(
        str(tmp_path), gp, z, m, H, latent_dim=L, id_covariate=ID_COV, **SPEC
    )
    for f in ("gp_model.pth", "zt_list.pth", "m.pth", "H.pth"):
        assert os.path.exists(tmp_path / f)

    sd = torch.load(tmp_path / "gp_model.pth", map_location="cpu")
    from lvae_tpu.utils.torch_compat import _component_key_paths, _softplus

    paths0, paths1 = _component_key_paths(id_covariate=ID_COV, **SPEC)

    def constrained(paths, offset):
        sc = np.zeros((L, len(paths)))
        ls = np.full((L, len(paths)), 2.5)
        for c, sub in enumerate(paths):
            i = offset + c
            sc[:, c] = _softplus(
                np.asarray(sd[f"covar_module.kernels.{i}.raw_outputscale"])
            )
            if sub is not None:
                ls[:, c] = _softplus(
                    np.asarray(sd[f"covar_module.kernels.{i}.{sub}"])
                ).reshape(L)
        return sc, ls

    sc0, l0 = constrained(paths0, 0)
    sc1, l1 = constrained(paths1, len(paths0))
    noise_back = (
        _softplus(np.asarray(sd["likelihood.noise_covar.raw_noise"])).reshape(L)
        + 1e-8
    )

    gm = mg.gm
    k0A, k1A = gm.generate_kernel_batched(
        L, SPEC["cat_kernel"], SPEC["bin_kernel"], SPEC["sqexp_kernel"],
        SPEC["cat_int_kernel"], SPEC["bin_int_kernel"],
        SPEC["covariate_missing_val"], ID_COV,
    )
    mg._walk_set_params(k0A, sc0, l0)
    mg._walk_set_params(k1A, sc1, l1)
    lik = mg.make_likelihood(noise_back)

    tz_b = torch.load(tmp_path / "zt_list.pth", map_location="cpu")
    tm = torch.load(tmp_path / "m.pth", map_location="cpu")
    tH = torch.load(tmp_path / "H.pth", map_location="cpu")
    assert tz_b.shape == (L, M, Q)

    kld_ref, gm_ref, gh_ref = mg.ef.minibatch_KLD_upper_bound(
        mg._Eval(k0A), mg._Eval(k1A), lik, L, tm, tH,
        torch.as_tensor(x), torch.as_tensor(mu), torch.as_tensor(log_var),
        tz_b, P, P, T, True, EPS,
    )
    np.testing.assert_allclose(
        float(kld_ours), float(kld_ref.detach()), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ng.grad_m), gm_ref.detach().numpy(), rtol=1e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(ng.grad_H), gh_ref.detach().numpy(), rtol=1e-5, atol=1e-8
    )


def test_export_import_roundtrip(tmp_path):
    spec0, spec1, gp, noise, m, H, _ = _problem(seed=1)
    z = np.random.default_rng(2).normal(size=(M, Q))
    save_reference_gp_state(
        str(tmp_path), gp, z, m, H, latent_dim=L, id_covariate=ID_COV, **SPEC
    )
    kp0, kp1, noise_b, z_b, m_b, H_b = load_reference_gp_state(
        str(tmp_path), latent_dim=L, id_covariate=ID_COV, **SPEC
    )
    np.testing.assert_allclose(
        np.asarray(kx.constrain(kp0.raw_scale)),
        np.asarray(kx.constrain(gp.kp0.raw_scale)), rtol=1e-10,
    )
    # lengthscales round-trip only where a component HAS an RBF factor —
    # non-RBF components carry unused entries the format rightly omits
    rbf1 = np.asarray(spec1.has_rbf)
    np.testing.assert_allclose(
        np.asarray(kx.constrain(kp1.raw_lengthscale))[:, rbf1],
        np.asarray(kx.constrain(gp.kp1.raw_lengthscale))[:, rbf1], rtol=1e-10,
    )
    rbf0 = np.asarray(spec0.has_rbf)
    np.testing.assert_allclose(
        np.asarray(kx.constrain(kp0.raw_lengthscale))[:, rbf0],
        np.asarray(kx.constrain(gp.kp0.raw_lengthscale))[:, rbf0], rtol=1e-10,
    )
    np.testing.assert_allclose(noise_b, noise, rtol=1e-10)
    np.testing.assert_allclose(z_b, z, rtol=0, atol=0)
    np.testing.assert_allclose(m_b, m, rtol=0)
    np.testing.assert_allclose(H_b, H, rtol=0)


def test_pipeline_writes_reference_gp_state(tmp_path):
    """The hensman pipeline's save_artifacts emits the four reference files."""
    from lvae_tpu.pipeline import LVAEPipeline
    from tests.test_pipeline import healthmnist_like, make_cfg

    cfg = make_cfg(
        str(tmp_path), epochs=1, run_validation=False, generate_images=False,
        run_tests=False,
    )
    pipeline = LVAEPipeline(cfg, {"train": healthmnist_like(p=4, t=5, seed=0)})
    pipeline.build_trainer()
    pipeline.train()
    pipeline.save_artifacts()
    for f in ("gp_model.pth", "zt_list.pth", "m.pth", "H.pth"):
        assert os.path.exists(os.path.join(str(tmp_path), f)), f
    kp0, kp1, noise_b, z_b, m_b, H_b = load_reference_gp_state(
        str(tmp_path), latent_dim=cfg.latent_dim,
        id_covariate=cfg.id_covariate, **cfg.kernel_spec_kwargs(),
    )
    assert m_b.shape[0] == cfg.latent_dim and H_b.shape[-1] == m_b.shape[1]
    assert np.isfinite(m_b).all() and np.isfinite(H_b).all()
