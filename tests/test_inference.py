"""Serving API: impute / predict_trajectory on a trained pipeline."""

import numpy as np

from lvae_tpu.inference import LVAEPredictor
from lvae_tpu.models import vae as mv
from lvae_tpu.pipeline import LVAEPipeline
from tests.test_pipeline import healthmnist_like, make_cfg


def test_predictor_end_to_end(tmp_path):
    cfg = make_cfg(str(tmp_path), epochs=2, run_validation=False,
                   generate_images=False, run_tests=False)
    ds = healthmnist_like(p=6, t=5, seed=0)
    pipeline = LVAEPipeline(cfg, {"train": ds})
    pipeline.build_trainer()
    pipeline.train()
    pred = LVAEPredictor.from_pipeline(pipeline)

    # imputation keeps observed pixels bit-exact and fills the rest
    frames = ds.data[:10]
    mask = ds.mask[:10]
    imputed = pred.impute(frames, mask)
    assert imputed.shape == frames.shape
    m = mask.reshape(frames.shape)
    np.testing.assert_array_equal(imputed * m, frames * m)
    assert np.isfinite(imputed).all()

    # trajectory prediction for a NEW subject: observe 3 frames, query 2 more
    new = healthmnist_like(p=1, t=5, seed=9)
    new.labels[:, 2] = 777.0  # unseen id
    out = pred.predict_trajectory(
        new.data[:3], new.labels[:3], new.labels[3:]
    )
    assert out.shape == (2,) + ds.data.shape[1:]
    assert np.isfinite(out).all()

    # unseen-subject queries with no observations → population mean, finite
    far = healthmnist_like(p=1, t=5, seed=12)
    far.labels[:, 2] = 888.0  # in neither the basis nor the observations
    out2 = pred.predict_trajectory(new.data[:3], new.labels[:3], far.labels[:4])
    assert np.isfinite(out2).all()


def test_predictor_from_checkpoint(tmp_path):
    import os

    from lvae_tpu.utils.checkpoint import save_checkpoint

    cfg = make_cfg(str(tmp_path), epochs=1, run_validation=False,
                   generate_images=False, run_tests=False)
    ds = healthmnist_like(p=6, t=5, seed=0)
    pipeline = LVAEPipeline(cfg, {"train": ds})
    trainer = pipeline.build_trainer()
    trainer.run_epoch()
    path = os.path.join(str(tmp_path), "final.ckpt")
    save_checkpoint(path, trainer.state)

    pred = LVAEPredictor.from_checkpoint(path, cfg, dataset=ds)
    z = pred.encode(ds.data[:4])
    assert z.shape == (4, cfg.latent_dim)


def test_aot_compiled_serving_matches_jit_path(tmp_path):
    """AOT bundle: fixed-batch executables, chunked arbitrary-N requests,
    results identical to the jit serving path."""
    cfg = make_cfg(str(tmp_path), epochs=1, run_validation=False,
                   generate_images=False, run_tests=False)
    ds = healthmnist_like(p=6, t=5, seed=0)
    pipeline = LVAEPipeline(cfg, {"train": ds})
    pipeline.build_trainer()
    pipeline.train()
    pred = LVAEPredictor.from_pipeline(pipeline)
    bundle = pred.aot_compile(batch_size=8)

    frames = ds.data[:13]  # not a multiple of the batch size
    mask = ds.mask[:13]
    mu_aot = bundle.encode(frames)
    mu_jit = pred.encode(frames)
    np.testing.assert_allclose(mu_aot, mu_jit, rtol=1e-6, atol=1e-6)

    imput_aot = bundle.impute(frames, mask)
    imput_jit = pred.impute(frames, mask)
    np.testing.assert_allclose(imput_aot, imput_jit, rtol=1e-6, atol=1e-6)

    dec_aot = bundle.decode(mu_aot[:5])
    dec_jit = pred.decode(mu_jit[:5])
    np.testing.assert_allclose(dec_aot, dec_jit, rtol=1e-6, atol=1e-6)


# decoded-pixel comparisons between two valid op orderings: under the
# FORCED bf16 arm (LVAE_MODEL_BF16=1) the decoder output is quantized to
# the bf16 grid (1 ulp at 0.5 = 2^-8 ≈ 0.0039), so the f32-calibrated
# 5e-4 tolerance must widen to a bf16-ulp-scale one
_PIX_TOL = 1e-2 if mv.use_bf16_model else 5e-4


def test_aot_trajectory_matches_full_recompute(tmp_path):
    """The low-rank serving path (precomputed basis + one-subject extension,
    ops/predict.py gp_predict_extend) equals the full-cohort recompute
    (gp_predict via LVAEPredictor.predict_trajectory) — the algebra
    shared = K0Xz H'inv c' is the same posterior mean, regrouped."""
    cfg = make_cfg(str(tmp_path), epochs=2, run_validation=False,
                   generate_images=False, run_tests=False)
    ds = healthmnist_like(p=6, t=5, seed=0)
    pipeline = LVAEPipeline(cfg, {"train": ds})
    pipeline.build_trainer()
    pipeline.train()
    pred = LVAEPredictor.from_pipeline(pipeline)

    new = healthmnist_like(p=1, t=5, seed=9)
    new.labels[:, 2] = 777.0  # unseen id
    obs_x, obs_lab = new.data[:3], new.labels[:3]
    query_lab = new.labels[3:]

    full = pred.predict_trajectory(obs_x, obs_lab, query_lab)
    bundle = pred.aot_compile(batch_size=8, t_obs=3, n_query=2)
    fast = bundle.predict_trajectory(obs_x, obs_lab, query_lab)
    assert fast.shape == full.shape
    np.testing.assert_allclose(fast, full, rtol=_PIX_TOL, atol=_PIX_TOL)

    # queries for a subject with no data anywhere: shared term only, and the
    # two paths still agree
    far = healthmnist_like(p=1, t=5, seed=11)
    far.labels[:, 2] = 888.0
    full2 = pred.predict_trajectory(obs_x, obs_lab, far.labels[3:])
    fast2 = bundle.predict_trajectory(obs_x, obs_lab, far.labels[3:])
    np.testing.assert_allclose(fast2, full2, rtol=_PIX_TOL, atol=_PIX_TOL)


def test_aot_batch_trajectories_match_full_recompute(tmp_path):
    """K=2 new subjects in one bundle request (predict_trajectories) equal
    the full-cohort recompute with BOTH subjects' observations in the basis;
    the K>1 bundle's single-subject entry (ghost-padded) still matches the
    K=1 result."""
    cfg = make_cfg(str(tmp_path), epochs=2, run_validation=False,
                   generate_images=False, run_tests=False)
    ds = healthmnist_like(p=6, t=5, seed=0)
    pipeline = LVAEPipeline(cfg, {"train": ds})
    pipeline.build_trainer()
    pipeline.train()
    pred = LVAEPredictor.from_pipeline(pipeline)

    subs = []
    for j, seed in enumerate((9, 13)):
        new = healthmnist_like(p=1, t=5, seed=seed)
        new.labels[:, 2] = 777.0 + j  # unseen ids
        subs.append(new)
    obs_x = np.stack([s.data[:3] for s in subs])  # [2, 3, ...]
    obs_lab = np.stack([s.labels[:3] for s in subs])
    query_lab = np.stack([s.labels[3:] for s in subs])  # [2, 2, Q]

    # full path: both subjects' observations join the regression basis
    all_obs_x = np.concatenate([s.data[:3] for s in subs])
    all_obs_lab = np.concatenate([s.labels[:3] for s in subs])
    full = pred.predict_trajectory(
        all_obs_x, all_obs_lab, query_lab.reshape(-1, query_lab.shape[-1])
    ).reshape(2, 2, *subs[0].data.shape[1:])

    bundle = pred.aot_compile(batch_size=8, t_obs=3, n_query=2, k_subjects=2)
    fast = bundle.predict_trajectories(obs_x, obs_lab, query_lab)
    assert fast.shape == full.shape
    np.testing.assert_allclose(fast, full, rtol=_PIX_TOL, atol=_PIX_TOL)

    # K>1 bundle serving a single-subject request: ghost-padded, equals the
    # K=1 bundle's answer
    b1 = pred.aot_compile(batch_size=8, t_obs=3, n_query=2, k_subjects=1)
    one = b1.predict_trajectory(subs[0].data[:3], subs[0].labels[:3],
                                subs[0].labels[3:])
    padded = bundle.predict_trajectory(subs[0].data[:3], subs[0].labels[:3],
                                       subs[0].labels[3:])
    np.testing.assert_allclose(padded, one, rtol=1e-5, atol=1e-5)

    # sibling bundle (for_k_subjects): shares the batch executables and the
    # folded basis, compiles ONLY the K-shaped trajectory executable — and
    # must answer exactly like a from-scratch K=2 bundle
    sib = b1.for_k_subjects(2)
    assert sib._basis is b1._basis and sib._encode is b1._encode
    np.testing.assert_allclose(
        sib.predict_trajectories(obs_x, obs_lab, query_lab), fast,
        rtol=1e-6, atol=1e-6,
    )


def test_refresh_basis_matches_grown_bundle(tmp_path):
    """Bundle lifecycle when the cohort GROWS (VERDICT r3 item 7): folding
    new training subjects in place (refresh_basis) equals building a fresh
    bundle on the grown cohort — basis operators AND a subsequent request —
    with no recompile of the request executable; duplicate ids are
    rejected."""
    import pytest

    cfg = make_cfg(str(tmp_path), epochs=2, run_validation=False,
                   generate_images=False, run_tests=False)
    ds = healthmnist_like(p=6, t=5, seed=0)
    pipeline = LVAEPipeline(cfg, {"train": ds})
    pipeline.build_trainer()
    pipeline.train()
    pred = LVAEPredictor.from_pipeline(pipeline)

    # two NEW training subjects to fold in
    grow = healthmnist_like(p=2, t=5, seed=21)
    grow.labels[:, 2] += 500.0  # ids not in the basis

    bundle = pred.aot_compile(batch_size=8, t_obs=3, n_query=2)
    traj_exec_before = bundle._traj
    bundle.refresh_basis(grow.data, grow.labels)
    assert bundle._traj is traj_exec_before  # no recompile

    # fresh bundle on the grown cohort: basis_mu must come from the same
    # encoder view (bundle.encode) the refresh used
    grown_pred = pred._replace(
        basis_labels=np.concatenate(
            [pred.basis_labels, grow.labels.astype(np.float32)]
        ),
        basis_mu=np.concatenate([pred.basis_mu, pred.encode(grow.data)]),
    )
    fresh = grown_pred.aot_compile(batch_size=8, t_obs=3, n_query=2)

    np.testing.assert_allclose(
        np.asarray(bundle._basis.h_nojit), np.asarray(fresh._basis.h_nojit),
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(bundle._basis.c), np.asarray(fresh._basis.c),
        rtol=2e-5, atol=2e-5,
    )

    # a request about a brand-new subject answers the same through both
    new = healthmnist_like(p=1, t=5, seed=9)
    new.labels[:, 2] = 777.0
    got = bundle.predict_trajectory(new.data[:3], new.labels[:3], new.labels[3:])
    want = fresh.predict_trajectory(new.data[:3], new.labels[:3], new.labels[3:])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    # folding an already-present subject id is an error (double-count)
    with pytest.raises(ValueError, match="double-count"):
        bundle.refresh_basis(grow.data, grow.labels)
