"""End-to-end training smoke tests on a tiny synthetic cohort (CPU).

These check what the reference checks by eye (printed losses,
training.py:142-143): losses are finite, decrease, the variational state
stays PSD, and both regimes (natural-gradient and Adam-on-(m,H)) run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvae_tpu.data.blocks import build_subject_blocks
from lvae_tpu.data.datasets import ArrayDataset
from lvae_tpu.models import vae as mv
from lvae_tpu.ops import kernels as kx
from lvae_tpu.train import hensman as th
from lvae_tpu.train import pretrain as tp
from lvae_tpu.train import state as st


def tiny_cohort(p=6, t=4, conv=False, seed=0):
    rng = np.random.default_rng(seed)
    n = p * t
    labels = np.stack(
        [
            np.tile(np.arange(t), p).astype(float),  # time
            np.repeat(rng.normal(size=p), t),  # cont covariate
            np.repeat(np.arange(p), t).astype(float),  # id
            np.repeat(rng.integers(0, 2, p), t).astype(float),  # gender
        ],
        axis=1,
    )
    if conv:
        data = rng.uniform(size=(n, 36, 36, 1)).astype(np.float32)
        mask = np.ones((n, 36 * 36), np.float32)
    else:
        data = rng.uniform(size=(n, 20)).astype(np.float32)
        mask = (rng.uniform(size=(n, 20)) > 0.25).astype(np.float32)
    return ArrayDataset(data=data, labels=labels, mask=mask)


def make_cfg(natural_gradient, p=6, t=4, latent_dim=3, loss_function="mse"):
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2],
        sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    return th.HensmanConfig(
        spec0=spec0,
        spec1=spec1,
        latent_dim=latent_dim,
        P_tot=p,
        N_tot=p * t,
        weight=0.5,
        loss_function=loss_function,
        natural_gradient=natural_gradient,
        natural_gradient_lr=0.01,
        constrain_scales=True,
        eps=1e-5,
        dropout=False,
    )


@pytest.mark.parametrize("natural_gradient", [True, False])
def test_hensman_training_decreases_loss(natural_gradient):
    ds = tiny_cohort()
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    cfg = make_cfg(natural_gradient)
    model = mv.SimpleVAE(latent_dim=cfg.latent_dim, num_dim=20)
    z = st.init_inducing_points(ds.labels, m_inducing=8, seed=0)
    trainer = th.HensmanTrainer(
        model, cfg, ds, blocks, z, subjects_per_batch=3, seed=0
    )
    first = trainer.run_epoch()
    for _ in range(12):
        last = trainer.run_epoch()
    assert np.isfinite(last.net)
    assert last.net < first.net, (first, last)
    if natural_gradient:
        eigs = np.linalg.eigvalsh(np.asarray(trainer.state.H_nat))
        assert eigs.min() > 0
    assert bool(st.tree_finite(trainer.state.trainables))


def test_hensman_nll_mode_runs():
    ds = tiny_cohort()
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    cfg = make_cfg(True, loss_function="nll")
    model = mv.SimpleVAE(latent_dim=cfg.latent_dim, num_dim=20)
    z = st.init_inducing_points(ds.labels, m_inducing=8, seed=0)
    trainer = th.HensmanTrainer(model, cfg, ds, blocks, z, subjects_per_batch=6)
    m = trainer.run_epoch()
    assert np.isfinite(m.net)


def test_hensman_ragged_cohort():
    """Varying-T path: drop some samples, batches stay static-shape."""
    ds = tiny_cohort(p=6, t=4)
    keep = np.ones(len(ds), bool)
    keep[[3, 7, 11, 22]] = False  # ragged subjects
    ds = ArrayDataset(ds.data[keep], ds.labels[keep], ds.mask[keep])
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    cfg = make_cfg(True, p=6)._replace(N_tot=int(keep.sum()))
    model = mv.SimpleVAE(latent_dim=cfg.latent_dim, num_dim=20)
    z = st.init_inducing_points(ds.labels, m_inducing=8, seed=0)
    trainer = th.HensmanTrainer(model, cfg, ds, blocks, z, subjects_per_batch=4)
    first = trainer.run_epoch()
    for _ in range(8):
        last = trainer.run_epoch()
    assert np.isfinite(last.net) and last.net < first.net


def test_pretrain_decreases_loss():
    ds = tiny_cohort(p=8, t=4)
    model = mv.SimpleVAE(latent_dim=3, num_dim=20)
    pre = tp.VAEPretrainer(model, ds, loss_function="mse", batch_size=16, dropout=False)
    first = pre.run_epoch()
    for _ in range(20):
        last = pre.run_epoch()
    assert np.isfinite(last.loss) and last.loss < first.loss


def test_pretrain_conv_smoke():
    ds = tiny_cohort(p=2, t=3, conv=True)
    model = mv.ConvVAE(latent_dim=4, num_dim=36 * 36, p=0.0)
    pre = tp.VAEPretrainer(model, ds, batch_size=6, dropout=False)
    m = pre.run_epoch()
    assert np.isfinite(m.loss)


@pytest.mark.parametrize("type_rnn", ["lstm", "gru"])
def test_hensman_rnn_encoder(type_rnn):
    """The RNN encoder family (flags at parse_model_args.py:46,59-62 — never
    implemented in the reference) trains under the Hensman regime."""
    from lvae_tpu.models.rnn import RNNVAE

    ds = tiny_cohort(p=6, t=4)
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    cfg = make_cfg(True)
    model = RNNVAE(latent_dim=cfg.latent_dim, num_dim=20, T=4,
                   hidden_dim=16, type_rnn=type_rnn)
    z = st.init_inducing_points(ds.labels, m_inducing=8, seed=0)
    trainer = th.HensmanTrainer(model, cfg, ds, blocks, z, subjects_per_batch=3)
    first = trainer.run_epoch()
    for _ in range(6):
        last = trainer.run_epoch()
    assert np.isfinite(last.net) and last.net < first.net


def test_vi_regime_two_phase():
    """Amortisation-free VI (training.py:602-764): train-set phase decreases
    the loss; prediction-set phase returns finite optimised moments."""
    from lvae_tpu.train.vi import VIConfig, VITrainer

    ds = tiny_cohort(p=6, t=4)
    pred = tiny_cohort(p=3, t=4, seed=5)
    pred.labels[:, 2] += 100  # disjoint subject ids
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    model = mv.SimpleVAE(latent_dim=3, num_dim=20)
    params = jax.jit(lambda k, x: model.init(k, x, deterministic=True))(
        jax.random.key(0), jnp.asarray(ds.data[:2])
    )
    gp = st.init_gp_params(spec0, spec1, 3, constrain_scales=True)
    z = st.init_inducing_points(ds.labels, m_inducing=8, seed=0)
    cfg = VIConfig(spec0=spec0, spec1=spec1, latent_dim=3, weight=0.5,
                   loss_function="mse", constrain_scales=True, eps=1e-5)
    trainer = VITrainer(model, cfg, ds, blocks, z, params, gp)
    hist = trainer.fit(15, log_every=0)
    assert hist[-1]["net"] < hist[0]["net"]
    mu_pred, lv_pred = trainer.optimize_prediction_set(pred, epochs=10, log_every=0)
    assert np.isfinite(mu_pred).all() and np.isfinite(lv_pred).all()
    assert mu_pred.shape == (len(pred), 3)


def test_vi_prediction_set_ragged_joint_cohort():
    """Phase 2 supports a RAGGED joint cohort (prediction subjects shorter
    than the trained ones) — the accuracy harness's honest protocol passes
    only the observed halves. Regression for the padded-slot NaN gradient
    (d sqrt(v)/d log_var = inf·0) that made every phase-2 step NaN."""
    from lvae_tpu.evaluation.encode import encode_dataset
    from lvae_tpu.train.vi import VIConfig, VITrainer

    ds = tiny_cohort(p=6, t=4)
    pred = tiny_cohort(p=3, t=2, seed=5)  # T=2 vs trained T=4 → ragged
    pred.labels[:, 2] += 100  # disjoint subject ids
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    model = mv.SimpleVAE(latent_dim=3, num_dim=20)
    params = jax.jit(lambda k, x: model.init(k, x, deterministic=True))(
        jax.random.key(0), jnp.asarray(ds.data[:2])
    )
    gp = st.init_gp_params(spec0, spec1, 3, constrain_scales=True)
    z = st.init_inducing_points(ds.labels, m_inducing=8, seed=0)
    cfg = VIConfig(spec0=spec0, spec1=spec1, latent_dim=3, weight=0.5,
                   loss_function="mse", constrain_scales=True, eps=1e-5)
    trainer = VITrainer(model, cfg, ds, blocks, z, params, gp)
    trainer.fit(5, log_every=0)
    mu0, _ = encode_dataset(model, trainer.state.vae, pred.data)
    mu_pred, lv_pred = trainer.optimize_prediction_set(
        pred, epochs=20, log_every=0
    )
    assert np.isfinite(mu_pred).all() and np.isfinite(lv_pred).all()
    assert mu_pred.shape == (len(pred), 3)
    # the optimiser must have actually moved the latents off the encoder
    # init (with the NaN bug, updates were NaN → either NaN output or, on
    # backends that flush the bad cotangent, frozen latents)
    assert float(np.abs(mu_pred - np.asarray(mu0)).max()) > 1e-5


def test_vy_fixed_freezes_observation_noise():
    """vy_fixed stops gradients on the observation noise (VAE.py:41-42)."""
    ds = tiny_cohort()
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    cfg = make_cfg(True, loss_function="nll")._replace(vy_fixed=True)
    model = mv.SimpleVAE(latent_dim=cfg.latent_dim, num_dim=20)
    z = st.init_inducing_points(ds.labels, m_inducing=8, seed=0)
    trainer = th.HensmanTrainer(model, cfg, ds, blocks, z, subjects_per_batch=3)
    before = np.asarray(trainer.state.trainables.vae["params"]["raw_log_vy"])
    trainer.run_epochs(3)
    after = np.asarray(trainer.state.trainables.vae["params"]["raw_log_vy"])
    np.testing.assert_array_equal(before, after)


def test_hensman_bf16_compute_model():
    """bf16 VAE compute with f32 GP algebra: finite and decreasing."""
    ds = tiny_cohort()
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    cfg = make_cfg(True)
    model = mv.SimpleVAE(latent_dim=cfg.latent_dim, num_dim=20, dtype=jnp.bfloat16)
    z = st.init_inducing_points(ds.labels, m_inducing=8, seed=0)
    trainer = th.HensmanTrainer(model, cfg, ds, blocks, z, subjects_per_batch=3)
    first = trainer.run_epoch()
    for _ in range(8):
        last = trainer.run_epoch()
    assert np.isfinite(last.net) and last.net < first.net
    # params remain f32 (param_dtype default)
    leaf = trainer.state.trainables.vae["params"]["fc1"]["kernel"]
    assert leaf.dtype == jnp.float32


def test_hensman_constrain_scales_freezes_noise():
    """constrain_scales=True pins noise to 1 with raw_noise at a fixed point,
    matching LVAE.py:186-188 (noise=1, raw_noise.requires_grad=False)."""
    ds = tiny_cohort()
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    cfg = make_cfg(True)  # constrain_scales=True in make_cfg
    assert cfg.constrain_scales
    model = mv.SimpleVAE(latent_dim=cfg.latent_dim, num_dim=20)
    z = st.init_inducing_points(ds.labels, m_inducing=8, seed=0)
    trainer = th.HensmanTrainer(model, cfg, ds, blocks, z, subjects_per_batch=3)
    raw0 = np.asarray(trainer.state.trainables.gp.raw_noise).copy()
    assert np.allclose(np.asarray(kx.constrain(raw0)), 1.0, atol=1e-6)
    for _ in range(5):
        trainer.run_epoch()
    raw5 = np.asarray(trainer.state.trainables.gp.raw_noise)
    assert np.array_equal(raw0, raw5), "raw_noise moved despite constrain_scales"


def test_learned_inducing_points():
    """learn_inducing=True: continuous covariate columns of z move (and help
    the bound), discrete columns stay exactly put (equality factors have
    piecewise-constant zero gradient), and the trainer's tdata view syncs."""
    ds = tiny_cohort(p=8, t=4)
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    cfg = make_cfg(True, p=8)._replace(learn_inducing=True, P_tot=8, N_tot=32)
    model = mv.SimpleVAE(latent_dim=cfg.latent_dim, num_dim=20)
    z0 = st.init_inducing_points(ds.labels, m_inducing=8, seed=0)
    trainer = th.HensmanTrainer(model, cfg, ds, blocks, z0, subjects_per_batch=4)
    for _ in range(8):
        m = trainer.run_epoch()
    assert np.isfinite(m.net)
    z_learned = np.asarray(trainer.state.trainables.z)
    # continuous column (0 = time) moved; id column (2) has zero gradient
    assert np.abs(z_learned[:, 0] - z0[:, 0]).max() > 1e-4
    np.testing.assert_array_equal(z_learned[:, 2], z0[:, 2])
    # tdata view synced for downstream prediction/serving consumers
    np.testing.assert_array_equal(np.asarray(trainer.tdata.z), z_learned)


def test_frozen_inducing_points_by_default():
    ds = tiny_cohort(p=6, t=4)
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    cfg = make_cfg(True)
    model = mv.SimpleVAE(latent_dim=cfg.latent_dim, num_dim=20)
    z0 = st.init_inducing_points(ds.labels, m_inducing=8, seed=0)
    trainer = th.HensmanTrainer(model, cfg, ds, blocks, z0, subjects_per_batch=3)
    trainer.run_epochs(3)
    assert trainer.state.trainables.z is None
    np.testing.assert_array_equal(np.asarray(trainer.tdata.z), z0)


@pytest.mark.parametrize("conv,t_buckets", [(False, 1), (True, 1), (False, 2)])
def test_epoch_pregather_matches_per_step_gathers(monkeypatch, conv, t_buckets):
    """use_epoch_pregather feeds the batch scan pre-gathered xs stacks; the
    trajectory must match the per-step jnp.take path: the gathered rows are
    the same values. Flat/bucketed paths are bit-identical; the conv path is
    allowed reassociation-level noise (XLA re-orders the image-loss
    reductions over the differently-laid-out batch). Covers flat + conv
    models and the bucketed ragged path."""
    def run(flag):
        monkeypatch.setattr(th, "use_epoch_pregather", flag)
        ds = tiny_cohort(p=6, t=4, conv=conv)
        labels = ds.labels
        if t_buckets > 1:
            # ragged: drop the tail rows of half the subjects
            keep = np.ones(len(labels), bool)
            for s in range(0, 6, 2):
                keep[(labels[:, 2] == s) & (labels[:, 0] >= 2)] = False
            ds = ArrayDataset(
                data=ds.data[keep], labels=labels[keep], mask=ds.mask[keep]
            )
        blocks = build_subject_blocks(ds.labels, id_covariate=2)
        cfg = make_cfg(True, p=6, t=4)._replace(N_tot=len(ds.labels))
        if conv:
            model = mv.ConvVAE(latent_dim=cfg.latent_dim)
        else:
            model = mv.SimpleVAE(latent_dim=cfg.latent_dim, num_dim=ds.data.shape[-1])
        z = st.init_inducing_points(ds.labels, m_inducing=8, seed=0)
        trainer = th.HensmanTrainer(
            model, cfg, ds, blocks, z, subjects_per_batch=3, seed=0,
            t_buckets=t_buckets,
        )
        ms = trainer.run_epochs(3)
        return ms, jax.tree.map(np.asarray, trainer.state.trainables)

    ms_a, tr_a = run(False)
    ms_b, tr_b = run(True)
    if conv:
        for a, b in zip(ms_a, ms_b):
            np.testing.assert_allclose(
                np.asarray(tuple(a)), np.asarray(tuple(b)), rtol=1e-4
            )
        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(x, y, rtol=1e-3, atol=1e-6),
            tr_a, tr_b,
        )
    else:
        for a, b in zip(ms_a, ms_b):
            assert a == b, (a, b)
        jax.tree.map(np.testing.assert_array_equal, tr_a, tr_b)


def test_pregather_auto_off_on_multi_device_mesh():
    """Mesh-traced epoch programs keep the per-step gathers (HLO partition
    proofs in tests/test_sharding.py rely on that trace)."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:2]).reshape(2, 1)
    mesh = Mesh(devs, ("data", "latent"))
    assert th._pregather_active(mesh) is False
    assert th._pregather_active(None) in (True, False)  # resolves, no crash


def test_overlapped_fit_matches_synced_fit(capsys):
    """fit(overlap=True) is a pure scheduling change: chunk k+1 dispatches
    before chunk k's metrics are read. History, prints and final state must
    be identical to the synced loop — the dispatch sequence is unchanged.
    Uses 7 epochs with chunk=3 to cover the ragged tail chunk."""
    def run(overlap):
        ds = tiny_cohort()
        blocks = build_subject_blocks(ds.labels, id_covariate=2)
        cfg = make_cfg(True)
        model = mv.SimpleVAE(latent_dim=cfg.latent_dim, num_dim=20)
        z = st.init_inducing_points(ds.labels, m_inducing=8, seed=0)
        trainer = th.HensmanTrainer(
            model, cfg, ds, blocks, z, subjects_per_batch=3, seed=0
        )
        hist = trainer.fit(7, log_every=1, chunk=3, overlap=overlap)
        return (
            list(hist),
            jax.tree.map(np.asarray, trainer.state.trainables),
            capsys.readouterr().out,
        )

    h_a, tr_a, out_a = run(False)
    h_b, tr_b, out_b = run(True)
    assert len(h_a) == len(h_b) == 7
    for a, b in zip(h_a, h_b):
        assert a == b, (a, b)
    jax.tree.map(np.testing.assert_array_equal, tr_a, tr_b)
    assert out_a == out_b  # per-epoch print order preserved


def test_overlapped_fit_callback_forces_synced_loop(monkeypatch):
    """A callback's contract is a state-current trainer at every chunk
    boundary — fit must keep the synced loop even when the overlap switch
    is globally on, and the callback must still see per-chunk boundaries."""
    monkeypatch.setattr(th, "use_overlapped_fit", True)
    ds = tiny_cohort()
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    cfg = make_cfg(True)
    model = mv.SimpleVAE(latent_dim=cfg.latent_dim, num_dim=20)
    z = st.init_inducing_points(ds.labels, m_inducing=8, seed=0)
    trainer = th.HensmanTrainer(
        model, cfg, ds, blocks, z, subjects_per_batch=3, seed=0
    )
    boundaries = []

    def cb(tr, done, last):
        # state must be materialisable right now (synced contract)
        assert bool(st.tree_finite(tr.state.trainables))
        boundaries.append(done)

    trainer.fit(6, log_every=0, callback=cb, chunk=3)
    assert boundaries == [3, 6]


def test_overlapped_fit_standard_and_vi_match_synced():
    """The overlapped schedule is shared by all three chunked trainers;
    StandardTrainer and VITrainer must produce identical histories and
    final state under fit(overlap=True) vs the synced loop (ragged tail
    chunk included)."""
    from lvae_tpu.train import standard as ts
    from lvae_tpu.train.vi import VIConfig, VITrainer
    from tests.test_gppvae import make_cfg as gp_make_cfg
    from tests.test_gppvae import tiny_cohort as gp_tiny_cohort

    def run_standard(overlap):
        p, t, num_dim = 4, 3, 12
        ds = gp_tiny_cohort(p=p, t=t, num_dim=num_dim)
        blocks = build_subject_blocks(ds.labels, id_covariate=2)
        cfg = gp_make_cfg("GPapprox_closed", p=p, t=t)
        model = mv.SimpleVAE(latent_dim=cfg.latent_dim, num_dim=num_dim,
                             dtype=jnp.float64)
        z = st.init_inducing_points(ds.labels, m_inducing=6, seed=0)
        trainer = ts.StandardTrainer(model, cfg, ds, blocks, z, seed=0,
                                     dtype=jnp.float64)
        hist = trainer.fit(5, log_every=0, chunk=2, overlap=overlap)
        return list(hist), jax.tree.map(np.asarray, trainer.state.trainables)

    h_a, tr_a = run_standard(False)
    h_b, tr_b = run_standard(True)
    assert len(h_a) == len(h_b) == 5
    assert h_a == h_b
    jax.tree.map(np.testing.assert_array_equal, tr_a, tr_b)

    def run_vi(overlap):
        ds = tiny_cohort(p=6, t=4)
        pred = tiny_cohort(p=3, t=4, seed=5)
        pred.labels[:, 2] += 100  # disjoint subject ids
        blocks = build_subject_blocks(ds.labels, id_covariate=2)
        spec0, spec1 = kx.split_kernel_spec(
            cat_kernel=[2], sqexp_kernel=[0],
            cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
            id_covariate=2,
        )
        model = mv.SimpleVAE(latent_dim=3, num_dim=20)
        params = jax.jit(lambda k, x: model.init(k, x, deterministic=True))(
            jax.random.key(0), jnp.asarray(ds.data[:2])
        )
        gp = st.init_gp_params(spec0, spec1, 3, constrain_scales=True)
        z = st.init_inducing_points(ds.labels, m_inducing=8, seed=0)
        cfg = VIConfig(spec0=spec0, spec1=spec1, latent_dim=3, weight=0.5,
                       loss_function="mse", constrain_scales=True, eps=1e-5)
        trainer = VITrainer(model, cfg, ds, blocks, z, params, gp)
        hist = trainer.fit(5, log_every=0, chunk=2, overlap=overlap)
        # phase 2 shares the module switch (no explicit param)
        import unittest.mock as um

        with um.patch.object(th, "use_overlapped_fit", overlap):
            mu_p, lv_p = trainer.optimize_prediction_set(
                pred, epochs=5, log_every=0, chunk=2
            )
        return list(hist), np.asarray(trainer.state.mu), mu_p, lv_p

    h_a, mu_a, mup_a, lvp_a = run_vi(False)
    h_b, mu_b, mup_b, lvp_b = run_vi(True)
    assert len(h_a) == len(h_b) == 5
    assert h_a == h_b
    np.testing.assert_array_equal(mu_a, mu_b)
    np.testing.assert_array_equal(mup_a, mup_b)
    np.testing.assert_array_equal(lvp_a, lvp_b)


def test_flat_gather_trajectory_identical():
    """The 2-D-view minibatch gather (train/hensman.use_flat_gather — the
    P=1000 layout fix, 'fast-path A/B round 10') gathers the SAME rows: the
    conv-model training trajectory matches the 4-D gather path exactly."""
    def run(flag, epochs=2):
        old = th.use_flat_gather
        th.use_flat_gather = flag
        try:
            ds = tiny_cohort(p=6, t=4, conv=True)
            blocks = build_subject_blocks(ds.labels, id_covariate=2)
            cfg = make_cfg(True)
            model = mv.ConvVAE(latent_dim=cfg.latent_dim, num_dim=36 * 36, p=0.0)
            z = st.init_inducing_points(ds.labels, m_inducing=8, seed=0)
            tr = th.HensmanTrainer(
                model, cfg, ds, blocks, z, subjects_per_batch=3, seed=0
            )
            nets = [tr.run_epoch().net for _ in range(epochs)]
            return nets, tr.state.trainables
        finally:
            th.use_flat_gather = old

    nets0, tr0 = run(False)
    nets1, tr1 = run(True)
    np.testing.assert_allclose(nets1, nets0, rtol=1e-6)
    import jax

    for a, b in zip(jax.tree.leaves(tr0), jax.tree.leaves(tr1)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7
        )


def test_pretrain_flat_gather_trajectory_identical():
    """Pre-training with the forced flat-view gather (the same layout fix
    as the Hensman trainer's, train/pretrain.py epochs_fn) trains the SAME
    trajectory as the 4-D gather path."""
    def run(flag, epochs=3):
        old = th.use_flat_gather
        th.use_flat_gather = flag
        try:
            ds = tiny_cohort(p=4, t=4, conv=True)
            model = mv.ConvVAE(latent_dim=3, num_dim=36 * 36, p=0.0)
            import lvae_tpu.train.pretrain as tp_

            pre = tp_.VAEPretrainer(
                model, ds, loss_function="mse", batch_size=8, dropout=False,
                seed=0,
            )
            return [pre.run_epoch().loss for _ in range(epochs)], pre.state.params
        finally:
            th.use_flat_gather = old

    l0, p0 = run(False)
    l1, p1 = run(True)
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    import jax

    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7
        )
