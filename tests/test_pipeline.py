"""End-to-end pipeline test: train → validate → test MSE → generate (CPU).

Drives the same flow as ``python LVAE.py --f=cfg`` (LVAE.py:27-434) on a tiny
in-memory Health MNIST cohort and checks the reference's artefacts appear:
result_error.csv, recon_complete.pdf, diagnostics.pkl, checkpoints.
"""

import os
import pickle

import numpy as np
import pytest

from lvae_tpu.config import LVAEConfig, parse_flag_lines
from lvae_tpu.data.datasets import ArrayDataset
from lvae_tpu.pipeline import LVAEPipeline


def healthmnist_like(p=6, t=5, seed=0):
    rng = np.random.default_rng(seed)
    n = p * t
    # covariates [time_age, disease_time, subject, gender, disease, location]
    labels = np.stack(
        [
            np.tile(np.arange(t), p).astype(float),
            np.repeat(rng.normal(size=p), t),
            np.repeat(np.arange(p), t).astype(float),
            np.repeat(rng.integers(0, 2, p), t).astype(float),
            np.repeat(rng.integers(0, 2, p), t).astype(float),
            np.repeat(rng.integers(0, 2, p), t).astype(float),
        ],
        axis=1,
    )
    data = rng.uniform(size=(n, 36, 36, 1)).astype(np.float32)
    mask = (rng.uniform(size=(n, 36 * 36)) > 0.25).astype(np.float32)
    return ArrayDataset(data=data, labels=labels, mask=mask)


@pytest.fixture(scope="module")
def result_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("results"))


def make_cfg(result_dir, **over):
    base = dict(
        dataset_type="HealthMNIST",
        type_nnet="conv",
        latent_dim=4,
        id_covariate=2,
        M=8,
        P=6,
        T=5,
        epochs=3,
        weight=0.15,
        num_dim=1296,
        type_KL="GPapprox_closed",
        subjects_per_batch=3,
        hensman=True,
        natural_gradient=True,
        constrain_scales=True,
        cat_kernel=[2],
        sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        loss_function="mse",
        run_tests=True,
        run_validation=True,
        generate_images=True,
        save_path=result_dir,
        results_path=result_dir,
        dropout=0.0,
        checkpoint_every=2,
        test_freq=2,
    )
    base.update(over)
    return LVAEConfig(**base)


def test_full_pipeline_hensman(result_dir):
    cfg = make_cfg(result_dir)
    datasets = {
        "train": healthmnist_like(seed=0),
        "validation": healthmnist_like(p=4, seed=1),
        "test": healthmnist_like(p=3, seed=2),
        "prediction": healthmnist_like(p=6, seed=0),  # same cohort as train
        "generation": healthmnist_like(p=3, seed=2),
    }
    pipeline = LVAEPipeline(cfg, datasets)
    result = pipeline.run()
    assert result is not None
    assert np.isfinite(result.vae_mse) and np.isfinite(result.gp_mse)
    # reference artefacts (model_test.py:82,143; LVAE.py:347; predict_HealthMNIST.py:140)
    assert os.path.exists(os.path.join(result_dir, "result_error.csv"))
    err = np.loadtxt(os.path.join(result_dir, "result_error.csv"))
    assert err.shape == (2,)
    assert os.path.exists(os.path.join(result_dir, "diagnostics.pkl"))
    with open(os.path.join(result_dir, "diagnostics.pkl"), "rb") as f:
        hist = pickle.load(f)
    assert len(hist) == cfg.epochs
    # plot_values.pkl = [train_x, mu, log_var, Z, label_id] (LVAE.py:350)
    with open(os.path.join(result_dir, "plot_values.pkl"), "rb") as f:
        train_x, mu, log_var, z_s, label_id = pickle.load(f)
    n = len(datasets["train"])
    assert train_x.shape[0] == n and mu.shape == (n, cfg.latent_dim)
    assert z_s.shape == mu.shape and np.isfinite(z_s).all()
    np.testing.assert_array_equal(label_id, np.arange(n))
    assert os.path.exists(os.path.join(result_dir, "model_final.ckpt"))
    assert os.path.exists(os.path.join(result_dir, "recon_complete.pdf"))
    assert os.path.exists(os.path.join(result_dir, "metrics.jsonl"))
    # best-model artefacts from the test_freq-cadence validation callback
    # (training.py:150, 200-204 -> predict_HealthMNIST.py:140)
    assert os.path.exists(os.path.join(result_dir, "model_best.ckpt"))
    assert os.path.exists(os.path.join(result_dir, "result_error_best.csv"))
    assert os.path.exists(os.path.join(result_dir, "recon_complete_best.pdf"))


def test_pipeline_standard_regime(result_dir):
    cfg = make_cfg(
        result_dir, hensman=False, natural_gradient=False, epochs=2,
        run_validation=False, generate_images=False, run_tests=False,
    )
    datasets = {"train": healthmnist_like(seed=0)}
    pipeline = LVAEPipeline(cfg, datasets)
    pipeline.build_trainer()
    hist = pipeline.train()
    assert np.isfinite(hist[-1].net)


def test_pipeline_closed_kl_regime(result_dir):
    cfg = make_cfg(
        result_dir, hensman=False, natural_gradient=False, type_KL="closed",
        epochs=2, run_validation=False, generate_images=False, run_tests=False,
        latent_dim=2,
    )
    datasets = {"train": healthmnist_like(p=4, seed=0)}
    pipeline = LVAEPipeline(cfg, datasets)
    pipeline.build_trainer()
    hist = pipeline.train()
    assert np.isfinite(hist[-1].net)


def test_checkpoint_roundtrip(result_dir, tmp_path):
    from lvae_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = make_cfg(str(tmp_path), epochs=1, run_validation=False,
                   generate_images=False, run_tests=False)
    pipeline = LVAEPipeline(cfg, {"train": healthmnist_like(seed=0)})
    trainer = pipeline.build_trainer()
    trainer.run_epoch()
    path = os.path.join(str(tmp_path), "s.ckpt")
    save_checkpoint(path, trainer.state)
    restored = load_checkpoint(path, like=trainer.state)
    import jax

    def raw(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            return np.asarray(jax.random.key_data(x))
        return np.asarray(x)

    for a, b in zip(jax.tree.leaves(trainer.state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(raw(a), raw(b))


def test_reference_flag_file_loads():
    cfg, unknown = parse_flag_lines(
        open("/root/reference/config/LVAE_config_sample.txt").read().splitlines(),
        LVAEConfig,
    )
    assert not unknown
    assert cfg.latent_dim == 32 and cfg.M == 60 and cfg.hensman
    assert cfg.cat_int_kernel[0] == {"cont_covariate": 0, "cat_covariate": 2}
    cfg.validate()


def test_pipeline_physionet_simple(tmp_path):
    """Physionet-style flow: SimpleVAE on flat readings with outcome-mask
    labels (dataset_def.py:8-44 + LVAE.py:69-70 dispatch)."""
    rng = np.random.default_rng(3)
    subj, t, d = 6, 4, 12
    n = subj * t
    q = 10
    labels = np.zeros((n, 2 * q))
    labels[:, 0] = np.tile(np.arange(t), subj)  # time
    labels[:, 2] = np.repeat(np.arange(subj), t)  # id covariate
    labels[:, 3] = np.repeat(rng.integers(0, 2, subj), t)
    ds = ArrayDataset(
        data=rng.normal(size=(n, d)).astype(np.float32),
        labels=labels,
        mask=rng.integers(0, 2, size=(n, d)).astype(np.float32),
    )
    cfg = make_cfg(
        str(tmp_path), dataset_type="Physionet", type_nnet="simple",
        num_dim=d, latent_dim=3, M=6, P=subj, T=t, epochs=2,
        subjects_per_batch=3, run_tests=False, run_validation=False,
        generate_images=False,
    )
    pipeline = LVAEPipeline(cfg, {"train": ds})
    pipeline.build_trainer()
    hist = pipeline.train()
    assert np.isfinite(hist[-1].net)


def test_pipeline_torch_pth_vae_seed(tmp_path):
    """model_params=*.pth loads a reference torch VAE checkpoint."""
    torch = pytest.importorskip("torch")
    from tests.test_torch_compat import TorchSimpleVAE

    tm = TorchSimpleVAE(num_dim=1296)
    # reference latent dim must match the config below
    tm.fc211 = torch.nn.Linear(30, 4)
    tm.fc221 = torch.nn.Linear(30, 4)
    pth = str(tmp_path / "model_params_vae.pth")
    torch.save(tm.state_dict(), pth)
    cfg = make_cfg(
        str(tmp_path), type_nnet="simple", epochs=1, run_tests=False,
        run_validation=False, generate_images=False, model_params=pth,
    )
    pipeline = LVAEPipeline(cfg, {"train": healthmnist_like(seed=0)})
    trainer = pipeline.build_trainer()
    got = np.asarray(trainer.state.trainables.vae["params"]["fc1"]["kernel"])
    np.testing.assert_allclose(
        got, tm.fc1.weight.detach().numpy().T, atol=1e-6
    )


def test_pipeline_ragged_cohort_with_tests(tmp_path):
    """varying_T end-to-end: ragged subjects through training AND the GP
    prediction/test path (the reference's minibatch_KLD_upper_bound_iter +
    batch_predict_varying_T flows)."""
    ds = healthmnist_like(p=6, t=5, seed=0)
    keep = np.ones(len(ds), bool)
    keep[[4, 9, 14, 27]] = False
    ragged = ArrayDataset(ds.data[keep], ds.labels[keep], ds.mask[keep])
    cfg = make_cfg(
        str(tmp_path), varying_T=True, epochs=2, run_validation=False,
        generate_images=False, run_tests=True, checkpoint_every=10,
    )
    datasets = {
        "train": ragged,
        "test": healthmnist_like(p=3, t=5, seed=2),
        "prediction": ragged,
    }
    pipeline = LVAEPipeline(cfg, datasets)
    result = pipeline.run()
    assert np.isfinite(result.vae_mse) and np.isfinite(result.gp_mse)


def test_pipeline_rotatedmnist_conv(tmp_path):
    """28x28 conv flow (RotatedMNIST family) — the reference's ConvVAE would
    crash here (hardcoded 36x36 fc1); ours is size-generic."""
    rng = np.random.default_rng(4)
    p, t = 4, 4
    n = p * t
    labels = np.stack(
        [np.tile(np.arange(t), p).astype(float),
         np.repeat(np.arange(p), t).astype(float)], axis=1,
    )
    ds = ArrayDataset(
        data=rng.uniform(size=(n, 28, 28, 1)).astype(np.float32),
        labels=labels,
        mask=np.ones((n, 784), np.float32),
    )
    cfg = make_cfg(
        str(tmp_path), dataset_type="RotatedMNIST", num_dim=784, latent_dim=3,
        M=6, P=p, T=t, epochs=2, subjects_per_batch=2, id_covariate=1,
        cat_kernel=[1], sqexp_kernel=[0], cat_int_kernel=[],
        run_tests=False, run_validation=False, generate_images=False,
    )
    pipeline = LVAEPipeline(cfg, {"train": ds})
    pipeline.build_trainer()
    hist = pipeline.train()
    assert np.isfinite(hist[-1].net)


def test_pipeline_gpapprox_validation(tmp_path):
    """type_KL='GPapprox': sample-based validation path (validation.py:137-145)."""
    cfg = make_cfg(
        str(tmp_path), type_KL="GPapprox", hensman=False,
        natural_gradient=False, epochs=2, run_tests=False,
        generate_images=False, run_validation=True,
    )
    datasets = {"train": healthmnist_like(seed=0),
                "validation": healthmnist_like(p=3, seed=1)}
    pipeline = LVAEPipeline(cfg, datasets)
    pipeline.build_trainer()
    pipeline.train()
    from lvae_tpu.evaluation.validate import validate

    vae_params, gp_params, noise = pipeline.current_params()
    res = validate(
        pipeline.model, vae_params, gp_params, noise, pipeline.spec0,
        pipeline.spec1, datasets["validation"], pipeline.trainer.tdata.z,
        cfg.id_covariate, cfg.weight, cfg.loss_function, cfg.latent_dim,
        cfg.eps, type_kl="GPapprox", num_samples=2,
    )
    assert np.isfinite(res.net)


def test_checkpoint_restore_survives_class_refactor(tmp_path):
    """A like=-templated restore must not depend on the classes that defined
    the saved pytree: leaves are matched by keypath (checkpoint.py format v2),
    so NamedTuple renames and field reorders don't orphan checkpoints."""
    from typing import NamedTuple

    import jax.numpy as jnp

    from lvae_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    class OldState(NamedTuple):
        alpha: object
        beta: object

    class RenamedReordered(NamedTuple):  # same field names, new class + order
        beta: object
        alpha: object

    state = OldState(alpha=jnp.arange(4.0), beta={"w": jnp.ones((2, 3))})
    path = str(tmp_path / "refactor.ckpt")
    save_checkpoint(path, state)

    template = RenamedReordered(
        beta={"w": jnp.zeros((2, 3))}, alpha=jnp.zeros(4)
    )
    restored = load_checkpoint(path, like=template)
    assert isinstance(restored, RenamedReordered)
    np.testing.assert_array_equal(np.asarray(restored.alpha), np.arange(4.0))
    np.testing.assert_array_equal(np.asarray(restored.beta["w"]), np.ones((2, 3)))


def test_checkpoint_orbax_roundtrip(tmp_path):
    """Orbax backend: sync + async save, restore onto a template (typed PRNG
    keys round-trip through key-data stripping)."""
    import jax
    import jax.numpy as jnp

    from lvae_tpu.utils.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
        wait_for_async_saves,
    )

    state = {
        "w": jnp.arange(6.0).reshape(2, 3),
        "opt": (jnp.ones(4), jnp.zeros((), jnp.int32)),
        "rng": jax.random.key(42),
    }
    path = str(tmp_path / "orbax_sync")
    save_checkpoint_orbax(path, state)
    like = jax.tree.map(jnp.zeros_like, state)
    restored = load_checkpoint_orbax(path, like)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(state["w"]))
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(restored["rng"])),
        np.asarray(jax.random.key_data(state["rng"])),
    )
    # same stream after restore
    a = jax.random.normal(restored["rng"], (3,))
    b = jax.random.normal(state["rng"], (3,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    apath = str(tmp_path / "orbax_async")
    save_checkpoint_orbax(apath, state, async_save=True)
    wait_for_async_saves()
    restored2 = load_checkpoint_orbax(apath, like)
    np.testing.assert_array_equal(np.asarray(restored2["w"]), np.asarray(state["w"]))


def test_auto_recover_from_nan_state(tmp_path):
    """Failure detection/recovery: poison the training state with NaNs; the
    next callback restores the rolling known-good snapshot (with a perturbed
    RNG stream) and training continues finite."""
    import jax
    import jax.numpy as jnp

    cfg = make_cfg(
        str(tmp_path), epochs=2, run_validation=False, generate_images=False,
        run_tests=False, auto_recover=True, checkpoint_every=1, test_freq=1,
    )
    ds = healthmnist_like(p=6, t=5, seed=0)
    pipeline = LVAEPipeline(cfg, {"train": ds})
    trainer = pipeline.build_trainer()
    pipeline.train()  # writes model_last.ckpt via the callback
    assert os.path.exists(os.path.join(str(tmp_path), "model_last.ckpt"))

    # poison the VAE params
    tr = trainer.state.trainables
    bad_vae = jax.tree.map(lambda a: a * jnp.nan, tr.vae)
    trainer.state = trainer.state._replace(trainables=tr._replace(vae=bad_vae))

    pipeline._epoch_callback(trainer, 1, trainer.history[-1])
    from lvae_tpu.train.state import tree_finite

    assert bool(tree_finite(trainer.state.trainables)), "state not recovered"
    assert pipeline.recoveries == 1
    m = trainer.run_epoch()
    assert np.isfinite(m.net)

    # a 4th consecutive failure raises
    pipeline.recoveries = 3
    trainer.state = trainer.state._replace(
        trainables=trainer.state.trainables._replace(vae=bad_vae)
    )
    with pytest.raises(FloatingPointError, match="giving up"):
        pipeline._epoch_callback(trainer, 2, trainer.history[-1])


def test_standard_regime_with_validation(tmp_path):
    """standard_training + validation: the reference NameErrors here
    (undefined standard_validate, training.py:596); the intended behaviour
    — validation-driven best-model tracking in the standard regime — works."""
    result_dir = str(tmp_path)  # own dir: the module-scoped one already
    # holds model_best.ckpt from the hensman test, which would make the
    # existence assertion below vacuous
    cfg = make_cfg(
        result_dir, hensman=False, natural_gradient=False, epochs=2,
        run_validation=True, generate_images=False, run_tests=False,
        test_freq=1, checkpoint_every=1,
    )
    datasets = {
        "train": healthmnist_like(seed=0),
        "validation": healthmnist_like(p=4, seed=1),
    }
    pipeline = LVAEPipeline(cfg, datasets)
    pipeline.build_trainer()
    pipeline.train()
    assert np.isfinite(pipeline.best["val"])
    assert os.path.exists(os.path.join(result_dir, "model_best.ckpt"))


def test_pipeline_orbax_backend_roundtrip(tmp_path):
    """--checkpoint_backend=orbax_async: final snapshot is an orbax
    directory, async writes are fenced, and a second pipeline resumes from
    it (cross-backend _load_ckpt detects the directory layout)."""
    import jax

    out = str(tmp_path / "run1")
    cfg = make_cfg(out, epochs=2, run_validation=False, generate_images=False,
                   run_tests=False, checkpoint_backend="orbax_async")
    ds = healthmnist_like(p=6, t=5, seed=0)
    pipeline = LVAEPipeline(cfg, {"train": ds})
    pipeline.build_trainer()
    pipeline.train()
    pipeline.save_artifacts()
    final = os.path.join(out, "model_final.ckpt")
    assert os.path.isdir(final)  # orbax layout, not a pickle file

    out2 = str(tmp_path / "run2")
    cfg2 = make_cfg(out2, epochs=1, run_validation=False,
                    generate_images=False, run_tests=False,
                    gp_model_folder=out)
    pipeline2 = LVAEPipeline(cfg2, {"train": ds})
    trainer2 = pipeline2.build_trainer()  # _try_resume loads the orbax dir
    a = jax.tree.leaves(pipeline.trainer.state.trainables)[0]
    b = jax.tree.leaves(trainer2.state.trainables)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # r3 review: SERVING must load the orbax directory artifact too (it
    # used to call the pickle-only loader and die with IsADirectoryError)
    from lvae_tpu.inference import LVAEPredictor

    pred = LVAEPredictor.from_checkpoint(final, cfg, dataset=ds)
    a_vae = jax.tree.leaves(pipeline.trainer.state.trainables.vae)[0]
    c = jax.tree.leaves(pred.vae_params)[0]
    np.testing.assert_array_equal(np.asarray(c), np.asarray(a_vae))
    with pytest.raises(FileNotFoundError):
        LVAEPredictor.from_checkpoint(
            os.path.join(out, "nope.ckpt"), cfg, dataset=ds
        )
