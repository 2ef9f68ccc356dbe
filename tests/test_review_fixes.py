"""Regression tests for the round-2 code-review findings.

Each test pins a behaviour that used to crash or silently misbehave:
closed-KL evaluation flows, nested ``--f`` flag files, the VI regime through
``LVAEPipeline.run()``, and the RNN encoder through pre-training/encoding.
"""

import os

import numpy as np
import pytest

from lvae_tpu.config import LVAEConfig, parse_flag_lines
from lvae_tpu.pipeline import LVAEPipeline
from tests.test_pipeline import healthmnist_like, make_cfg


def test_closed_kl_with_validation_tests_generation(tmp_path):
    """type_KL='closed' + validation/tests/generation used to trace-crash:
    the trainer got a joined spec0 and an EMPTY spec1, then validate()/
    recon_complete_gen() indexed kp1's size-0 param axis. The trainer now
    keeps the split (kp0, kp1) layout and joins only inside the closed-KL
    loss (training.py:499-513), so every downstream consumer works.
    (The reference itself crashes on this config — LVAE.py:392 calls .eval()
    on a bare list — this is the intended-behaviour repair.)"""
    out = str(tmp_path)
    cfg = make_cfg(
        out, hensman=False, natural_gradient=False, type_KL="closed",
        epochs=2, latent_dim=2, run_validation=True, run_tests=True,
        generate_images=True, test_freq=1, checkpoint_every=1,
    )
    datasets = {
        "train": healthmnist_like(p=4, seed=0),
        "validation": healthmnist_like(p=3, seed=1),
        "test": healthmnist_like(p=3, seed=2),
        "prediction": healthmnist_like(p=4, seed=0),
        "generation": healthmnist_like(p=3, seed=2),
    }
    pipeline = LVAEPipeline(cfg, datasets)
    result = pipeline.run()
    assert result is not None
    assert np.isfinite(result.vae_mse) and np.isfinite(result.gp_mse)
    assert np.isfinite(pipeline.best["val"])
    assert os.path.exists(os.path.join(out, "recon_complete.pdf"))


def test_nested_flag_file_does_not_clobber_explicit_flags(tmp_path):
    """A nested --f=file must merge only the sub-file's EXPLICIT flags —
    argparse's LoadFromFile replays lines in place (parse_model_args.py:9-15)
    and never resets untouched flags to defaults."""
    common = tmp_path / "common.txt"
    common.write_text("--M=33\n")
    cfg, unknown = parse_flag_lines(
        [f"--latent_dim=32", f"--f={common}", "--weight=5"], LVAEConfig
    )
    assert not unknown
    assert cfg.latent_dim == 32  # was clobbered back to the default 2
    assert cfg.M == 33
    assert cfg.weight == 5.0


def test_prediction_dataset_guard_fails_at_construction(tmp_path):
    """run_tests without a prediction cohort fails at construction, not in
    the best-model callback mid-training."""
    cfg = make_cfg(str(tmp_path), run_tests=True, run_validation=False,
                   generate_images=False)
    with pytest.raises(ValueError, match="prediction cohort"):
        LVAEPipeline(cfg, {"train": healthmnist_like(seed=0),
                           "test": healthmnist_like(p=3, seed=2)})
    # but a run_tests flag with NO test dataset stays a no-op (the reference
    # quietly skips the section) — construction must not demand a cohort
    # that would never be used
    LVAEPipeline(cfg, {"train": healthmnist_like(seed=0)})


def test_encode_decode_empty_inputs():
    """encode_dataset/decode_latents on empty input return correctly-shaped
    empties instead of ZeroDivisionError."""
    import jax
    import jax.numpy as jnp

    from lvae_tpu.evaluation.encode import decode_latents, encode_dataset
    from lvae_tpu.models.vae import SimpleVAE

    model = SimpleVAE(latent_dim=3, num_dim=20)
    params = jax.jit(lambda k, x: model.init(k, x, deterministic=True))(
        jax.random.key(0), jnp.zeros((2, 20))
    )
    mu, lv = encode_dataset(model, params, np.zeros((0, 20), np.float32))
    assert mu.shape == (0, 3) and lv.shape == (0, 3)
    out = decode_latents(model, params, np.zeros((0, 3), np.float32))
    assert out.shape[0] == 0 and out.shape[-1] == 20


def test_vi_regime_through_pipeline_run(tmp_path):
    """run() routes variational_inference_training to run_vi()
    (LVAE.py:289-301) instead of dead-ending in build_trainer()."""
    out = str(tmp_path)
    cfg = make_cfg(
        out, hensman=False, natural_gradient=False,
        variational_inference_training=True, epochs=5, latent_dim=2,
        run_validation=False, run_tests=False, generate_images=False,
    )
    train = healthmnist_like(p=4, seed=0)
    pred = healthmnist_like(p=3, seed=5)
    pred.labels[:, 2] += 100  # disjoint subject ids
    pipeline = LVAEPipeline(cfg, {"train": train, "prediction": pred})
    assert pipeline.prediction_dataset is not None  # loaded for VI
    pipeline.run_vi(pred_epochs=5)
    assert len(pipeline.trainer.history) == cfg.epochs
    assert np.isfinite(pipeline.trainer.history[-1]["net"])
    # VI artefacts (training.py:681-683, 748-749)
    assert os.path.exists(os.path.join(out, "model_vi.ckpt"))
    assert os.path.exists(os.path.join(out, "vi_prediction.ckpt"))
    # and the generic entry point reaches the same flow, resuming the saved
    # VI state (training.py:628-634)
    cfg2 = make_cfg(
        out, hensman=False, natural_gradient=False,
        variational_inference_training=True, epochs=2, latent_dim=2,
        run_validation=False, run_tests=False, generate_images=False,
        gp_model_folder=out,
    )
    pipeline2 = LVAEPipeline(cfg2, {"train": train})
    assert pipeline2.run() is None
    resumed = np.asarray(pipeline2.trainer.history[0]["net"])
    fresh = np.asarray(pipeline.trainer.history[0]["net"])
    assert resumed < fresh  # started from the optimised state, not scratch


def test_rnn_pretrain_and_encode_chunking():
    """VAEPretrainer + encode_dataset handle the RNN family: batches stay
    subject-major multiples of T, and indivisible cohorts fail loudly."""
    from lvae_tpu.evaluation.encode import encode_dataset
    from lvae_tpu.models.rnn import RNNVAE
    from lvae_tpu.train.pretrain import VAEPretrainer
    from tests.test_training import tiny_cohort

    t = 4
    ds = tiny_cohort(p=6, t=t)
    model = RNNVAE(latent_dim=3, num_dim=20, T=t, hidden_dim=8)
    # batch_size=10 is not a multiple of T=4 → rounded down to 8
    pre = VAEPretrainer(model, ds, batch_size=10, dropout=False)
    assert pre.batch_size == 8
    m = pre.run_epoch()
    assert np.isfinite(m.loss)

    # encode_dataset: chunk size forced to a multiple of T
    mu, lv = encode_dataset(model, pre.params, ds.data, batch_size=10)
    assert mu.shape == (len(ds), 3) and np.isfinite(mu).all()
    # matches the unchunked encode exactly (no fake-subject mixing)
    mu1, _ = encode_dataset(model, pre.params, ds.data, batch_size=len(ds))
    np.testing.assert_allclose(mu, mu1, rtol=1e-6)

    with pytest.raises(ValueError, match="divisible"):
        encode_dataset(model, pre.params, ds.data[: t * 2 + 1])

    from lvae_tpu.data.datasets import ArrayDataset

    bad = ArrayDataset(ds.data[:-1], ds.labels[:-1], ds.mask[:-1])
    with pytest.raises(ValueError, match="divisible"):
        VAEPretrainer(model, bad, dropout=False)


def test_rnn_cli_pretrain_forwards_args(tmp_path):
    """The pretrain CLI path builds the RNN from the flag file's T/
    hidden_dim/type_rnn (they used to be dropped → assertion failure)."""
    from lvae_tpu.config import VAEConfig

    cfg, _ = parse_flag_lines(
        ["--type_nnet=rnn", "--T=4", "--hidden_dim=8", "--type_rnn=gru",
         "--latent_dim=3", "--num_dim=20", "--epochs=1",
         f"--save_path={tmp_path}"],
        VAEConfig,
    )
    from lvae_tpu.models.vae import make_vae

    model = make_vae(
        cfg.type_nnet, cfg.latent_dim, cfg.num_dim,
        vy_init=cfg.vy_init, dropout=cfg.dropout,
        dropout_input=cfg.dropout_input,
        T=cfg.T or None, hidden_dim=cfg.hidden_dim, type_rnn=cfg.type_rnn,
    )
    assert model.T == 4 and model.hidden_dim == 8 and model.type_rnn == "gru"


def test_serving_encode_matches_chunked_and_empty_shapes(tmp_path):
    """CompiledServing.encode shares _chunked (was a line-for-line copy) and
    empty inputs return correctly-shaped outputs."""
    from lvae_tpu.inference import LVAEPredictor

    cfg = make_cfg(str(tmp_path), epochs=1, run_validation=False,
                   generate_images=False, run_tests=False)
    ds = healthmnist_like(p=6, t=5, seed=0)
    pipeline = LVAEPipeline(cfg, {"train": ds})
    pipeline.build_trainer()
    pipeline.train()
    pred = LVAEPredictor.from_pipeline(pipeline)
    bundle = pred.aot_compile(batch_size=8)

    frames = ds.data[:13]
    mu = bundle.encode(frames)
    np.testing.assert_allclose(mu, pred.encode(frames), rtol=1e-6, atol=1e-6)
    empty = bundle.encode(np.zeros((0,) + ds.data.shape[1:], np.float32))
    assert empty.shape == (0, cfg.latent_dim)
    empty_d = bundle.decode(np.zeros((0, cfg.latent_dim), np.float32))
    assert empty_d.shape[0] == 0


def test_bf16_model_encodings_upcast_to_f32():
    """encode_dataset upcasts bf16 moments so the GP posterior algebra
    (which rejects/degrades under bf16) never sees them."""
    import jax
    import jax.numpy as jnp

    from lvae_tpu.evaluation.encode import encode_dataset
    from lvae_tpu.models.vae import SimpleVAE

    model = SimpleVAE(latent_dim=3, num_dim=20, dtype=jnp.bfloat16)
    params = jax.jit(lambda k, x: model.init(k, x, deterministic=True))(
        jax.random.key(0), jnp.zeros((2, 20))
    )
    mu, lv = encode_dataset(model, params, np.zeros((8, 20), np.float32))
    assert mu.dtype == np.float32 and lv.dtype == np.float32


def test_rnn_aot_serving_rounds_batch_and_checks_rows(tmp_path):
    """The AOT bundle rounds its batch to a multiple of the RNN's T and
    rejects requests that would split a subject across the recurrence."""
    from lvae_tpu.inference import LVAEPredictor
    from tests.test_training import make_cfg as make_hcfg, tiny_cohort

    import jax
    import jax.numpy as jnp

    from lvae_tpu.data.blocks import build_subject_blocks
    from lvae_tpu.models.rnn import RNNVAE
    from lvae_tpu.train import hensman as th
    from lvae_tpu.train import state as st

    t = 4
    ds = tiny_cohort(p=6, t=t)
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    cfg = make_hcfg(True)
    model = RNNVAE(latent_dim=cfg.latent_dim, num_dim=20, T=t, hidden_dim=8)
    z = st.init_inducing_points(ds.labels, m_inducing=6, seed=0)
    trainer = th.HensmanTrainer(model, cfg, ds, blocks, z, subjects_per_batch=3)
    trainer.run_epoch()

    tr = trainer.state.trainables
    from lvae_tpu.evaluation.encode import encode_dataset

    mu, _ = encode_dataset(model, tr.vae, ds.data)
    pred = LVAEPredictor(
        model=model, vae_params=tr.vae, gp_params=tr.gp,
        noise=jnp.ones((cfg.latent_dim,)), spec0=cfg.spec0, spec1=cfg.spec1,
        z=jnp.asarray(trainer.tdata.z), id_covariate=2,
        basis_labels=np.asarray(ds.labels), basis_mu=mu,
    )
    bundle = pred.aot_compile(batch_size=10)  # not a multiple of T=4
    assert bundle.batch_size == 8  # rounded down to a T-multiple
    out = bundle.encode(ds.data)  # 24 rows = 6 whole subjects
    np.testing.assert_allclose(out, mu, rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="divisible"):
        bundle.encode(ds.data[: t * 2 + 1])


def test_rnn_trajectory_serving_requires_whole_subject(tmp_path):
    """aot_compile with t_obs != T on an RNN predictor fails loudly — k*T
    would silently split the observed sequence into k recurrences."""
    import jax
    import jax.numpy as jnp

    from lvae_tpu.data.blocks import build_subject_blocks
    from lvae_tpu.evaluation.encode import encode_dataset
    from lvae_tpu.inference import LVAEPredictor
    from lvae_tpu.models.rnn import RNNVAE
    from lvae_tpu.ops import kernels as kx
    from lvae_tpu.train import state as st
    from tests.test_training import tiny_cohort

    t = 4
    ds = tiny_cohort(p=4, t=t)
    model = RNNVAE(latent_dim=3, num_dim=20, T=t, hidden_dim=8)
    params = jax.jit(lambda k, x: model.init(k, x, deterministic=True))(
        jax.random.key(0), jnp.asarray(ds.data[:t])
    )
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    gp = st.init_gp_params(spec0, spec1, 3, constrain_scales=True)
    mu, _ = encode_dataset(model, params, ds.data)
    pred = LVAEPredictor(
        model=model, vae_params=params, gp_params=gp,
        noise=jnp.ones((3,)), spec0=spec0, spec1=spec1,
        z=jnp.asarray(st.init_inducing_points(ds.labels, 6, seed=0)),
        id_covariate=2, basis_labels=np.asarray(ds.labels), basis_mu=mu,
    )
    with pytest.raises(ValueError, match="whole subject"):
        pred.aot_compile(batch_size=8, t_obs=2 * t, n_query=2)
    bundle = pred.aot_compile(batch_size=8, t_obs=t, n_query=2)  # t_obs == T OK
    assert bundle.t_obs == t


# ---------------------------------------------------------------- round 3


def test_rnn_rejects_ragged_cohort():
    """r3 review: the recurrence has no validity masking, so a ragged
    cohort's padded slots would gather row 0's frames into real timesteps'
    moments. The trainer must refuse loudly instead of training wrong."""
    from lvae_tpu.data.blocks import build_subject_blocks
    from lvae_tpu.models.rnn import RNNVAE
    from lvae_tpu.train import state as st
    from lvae_tpu.train.hensman import HensmanTrainer
    from tests.test_training import make_cfg, tiny_cohort

    ds = tiny_cohort(p=4, t=4)
    labels = np.asarray(ds.labels).copy()
    # drop subject 3's last row -> ragged lengths {4, 3}
    keep = np.ones(len(labels), bool)
    keep[-1] = False
    from lvae_tpu.data.datasets import ArrayDataset

    ds = ArrayDataset(
        data=np.asarray(ds.data)[keep], labels=labels[keep],
        mask=np.asarray(ds.mask)[keep],
    )
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    model = RNNVAE(latent_dim=3, num_dim=20, T=4, hidden_dim=8)
    cfg = make_cfg(natural_gradient=True, p=4, t=4, latent_dim=3)
    z = st.init_inducing_points(ds.labels, 5, seed=0)
    with pytest.raises(ValueError, match="fixed-T cohort"):
        HensmanTrainer(model, cfg, ds, blocks, z, subjects_per_batch=2)


def test_mse_test_exact_honours_save_file_and_eps(tmp_path):
    """r3 review: the closed-regime test evaluator dropped save_file (best-
    epoch results clobbered result_error.csv) and silently ignored eps."""
    import jax
    import jax.numpy as jnp

    from lvae_tpu.evaluation.encode import encode_dataset
    from lvae_tpu.evaluation.testing import mse_test_exact
    from lvae_tpu.models import vae as mv
    from lvae_tpu.ops import kernels as kx
    from lvae_tpu.train import state as st
    from tests.test_training import tiny_cohort

    ds = tiny_cohort(p=3, t=4)
    model = mv.SimpleVAE(latent_dim=2, num_dim=20)
    params = jax.jit(lambda k, x: model.init(k, x, deterministic=True))(
        jax.random.key(0), jnp.asarray(ds.data[:2])
    )
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    gp = st.init_gp_params(spec0, spec1, 2, constrain_scales=True)
    spec_full, kp_full = kx.join_specs(spec0, spec1, gp.kp0, gp.kp1)
    mu, _ = encode_dataset(model, params, ds.data)
    res = mse_test_exact(
        model, params, kp_full, spec_full, jnp.ones((2,), jnp.float32), ds,
        np.asarray(ds.labels), mu, eps=1e-6,
        results_path=str(tmp_path), save_file="result_error_best.csv",
        verbose=False,
    )
    assert os.path.exists(tmp_path / "result_error_best.csv")
    assert not os.path.exists(tmp_path / "result_error.csv")
    vals = np.loadtxt(tmp_path / "result_error_best.csv")
    np.testing.assert_allclose(vals, [res.vae_mse, res.gp_mse], rtol=1e-6)


def test_metrics_jsonl_records_every_epoch(tmp_path):
    """r3 review: the chunked-dispatch callback logged one metrics.jsonl
    record per CHUNK; the stream must carry one record per EPOCH."""
    import json

    cfg = make_cfg(str(tmp_path), epochs=4, test_freq=2, checkpoint_every=2,
                   run_validation=False, generate_images=False,
                   run_tests=False)
    pipeline = LVAEPipeline(cfg, {"train": healthmnist_like(p=4, t=5, seed=0)})
    pipeline.build_trainer()
    pipeline.train()
    pipeline.metrics.flush()  # run() flushes at exit; train() buffers
    path = os.path.join(cfg.results_path or cfg.save_path, "metrics.jsonl")
    rows = [json.loads(l) for l in open(path)]
    steps = [r["step"] for r in rows]
    assert steps == [1, 2, 3, 4], steps


def test_custom_vjp_backward_keeps_highest_precision():
    """r3 review: custom_vjp backwards trace AFTER the caller's
    default_matmul_precision('highest') context exits; the bwd rules must
    re-enter it. Check the lowered backward HLO carries HIGHEST on dots."""
    import jax
    import jax.numpy as jnp

    from lvae_tpu.ops import linalg as la

    a = jnp.eye(4) * 2.0 + 0.1

    def f(x):
        with jax.default_matmul_precision("highest"):
            l, inv = la.cholesky_and_inverse(
                jnp.broadcast_to(x, (1, 4, 4))
            )
        return jnp.sum(inv) + jnp.sum(l)

    txt = jax.jit(jax.grad(f)).lower(a).as_text()
    dots = [ln for ln in txt.splitlines() if "dot_general" in ln]
    assert dots, "expected dot_general ops in the backward"
    bad = [ln for ln in dots if "HIGHEST" not in ln]
    assert not bad, f"default-precision dots in custom-vjp backward:\n" + "\n".join(bad)


def test_psd_from_factor_full_precision():
    """r3 corner review: the non-NG Hensman loss formed H = h h^T OUTSIDE
    any default_matmul_precision('highest') context — bf16 on TPU, feeding
    the jitter-free Cholesky in minibatch_kld. Pin the shared helper."""
    import jax
    import jax.numpy as jnp

    from lvae_tpu.train import state as st

    h = jnp.ones((2, 3, 3), jnp.float32)
    txt = jax.jit(st.psd_from_factor).lower(h).as_text()
    dots = [ln for ln in txt.splitlines() if "dot_general" in ln]
    assert dots, "expected a dot_general for h @ h^T"
    bad = [ln for ln in dots if "HIGHEST" not in ln]
    assert not bad, "psd_from_factor dot lost full precision:\n" + "\n".join(bad)


def test_standard_trainer_spec1_none_trains():
    """r3 corner review: StandardConfig.spec1 is Optional and init
    substituted an empty spec for GP params only — cfg.spec1 stayed None
    and the first jitted step died with a trace-time AttributeError."""
    import jax.numpy as jnp
    import numpy as np

    from lvae_tpu.data.blocks import build_subject_blocks
    from lvae_tpu.models import vae as mv
    from lvae_tpu.train import standard as ts
    from lvae_tpu.train import state as st
    from tests.test_gppvae import make_cfg, tiny_cohort

    p, t, num_dim = 4, 3, 12
    ds = tiny_cohort(p=p, t=t, num_dim=num_dim)
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    cfg = make_cfg("closed", p=p, t=t)._replace(spec1=None)
    model = mv.SimpleVAE(latent_dim=cfg.latent_dim, num_dim=num_dim,
                         dtype=jnp.float64)
    z = st.init_inducing_points(ds.labels, m_inducing=6, seed=0)
    trainer = ts.StandardTrainer(model, cfg, ds, blocks, z, seed=0,
                                 dtype=jnp.float64)
    assert trainer.cfg.spec1 is not None  # normalised at construction
    m = trainer.run_epoch()
    assert np.isfinite(float(m.net))


def test_from_pipeline_rejects_vi_regime():
    """r3 corner review: LVAEPredictor.from_pipeline on a VI pipeline died
    with a bare AttributeError ('VIState' has no 'trainables'); it must
    raise a clear unsupported-regime error instead."""
    import types

    import pytest

    from lvae_tpu.inference import LVAEPredictor

    vi_like = types.SimpleNamespace(
        trainer=types.SimpleNamespace(state=types.SimpleNamespace(mu=None))
    )
    with pytest.raises(TypeError, match="optimize_prediction_set"):
        LVAEPredictor.from_pipeline(vi_like)


def test_raw_log_vy_param_stays_f32_under_bf16():
    """r3 review: raw_log_vy was created in the COMPUTE dtype, so
    model_dtype=bfloat16 quantized the observation-noise parameter (and its
    Adam moments) to bf16 while every flax layer param stayed f32."""
    import jax
    import jax.numpy as jnp

    from lvae_tpu.models import vae as mv

    model = mv.SimpleVAE(latent_dim=3, num_dim=20, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), jnp.zeros((2, 20), jnp.bfloat16),
                        deterministic=True)
    assert params["params"]["raw_log_vy"].dtype == jnp.float32
    assert params["params"]["fc1"]["kernel"].dtype == jnp.float32


def test_checkpoint_every_cadence_without_auto_recover(tmp_path):
    """r3 review: without auto_recover the checkpoint_every flag wrote NO
    periodic checkpoint at all — a crash lost the whole run."""
    import os

    from lvae_tpu.pipeline import LVAEPipeline
    from tests.test_pipeline import healthmnist_like, make_cfg

    cfg = make_cfg(
        str(tmp_path), epochs=2, run_validation=False, generate_images=False,
        run_tests=False, auto_recover=False, checkpoint_every=1, test_freq=0,
    )
    pipeline = LVAEPipeline(cfg, {"train": healthmnist_like(p=6, t=5, seed=0)})
    pipeline.build_trainer()
    pipeline.train()
    assert os.path.exists(os.path.join(str(tmp_path), "model_last.ckpt"))


def test_test_freq_zero_disables_validation(tmp_path):
    """r3 review: test_freq=0 used to INVERT (validate+checkpoint on every
    chunk); it must disable the in-training cadence."""
    import os

    from lvae_tpu.pipeline import LVAEPipeline
    from tests.test_pipeline import healthmnist_like, make_cfg

    ds = healthmnist_like(p=6, t=5, seed=0)
    cfg = make_cfg(
        str(tmp_path), epochs=2, run_validation=True, generate_images=False,
        run_tests=False, test_freq=0, checkpoint_every=1,
    )
    pipeline = LVAEPipeline(cfg, {"train": ds, "validation": ds})
    pipeline.build_trainer()
    pipeline.train()
    assert not os.path.exists(os.path.join(str(tmp_path), "model_best.ckpt"))
    assert pipeline.best["epoch"] is None or pipeline.best["val"] == float("inf")


def test_auto_recover_rollback_replays_chunk(tmp_path):
    """r3 review: recovery used to roll the STATE back while fit()'s epoch
    counter kept advancing — the NaN'd chunk's epochs were silently dropped
    and its NaN metrics stayed in metrics.jsonl. Now the callback returns
    'rollback', fit replays the chunk, and the NaN metrics are discarded."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lvae_tpu.pipeline import LVAEPipeline
    from tests.test_pipeline import healthmnist_like, make_cfg

    cfg = make_cfg(
        str(tmp_path), epochs=2, run_validation=False, generate_images=False,
        run_tests=False, auto_recover=True, checkpoint_every=1, test_freq=1,
    )
    pipeline = LVAEPipeline(cfg, {"train": healthmnist_like(p=6, t=5, seed=0)})
    trainer = pipeline.build_trainer()
    pipeline.train()  # snapshot exists now
    n_hist = len(trainer.history)

    tr = trainer.state.trainables
    bad = trainer.state._replace(
        trainables=tr._replace(vae=jax.tree.map(lambda a: a * jnp.nan, tr.vae))
    )
    trainer.state = bad
    trainer.history.append(trainer.history[-1])  # the poisoned chunk's metric
    out = pipeline._epoch_callback(trainer, n_hist + 1, trainer.history[-1])
    assert out == "rollback"
    assert len(trainer.history) == n_hist, "NaN chunk's metrics not dropped"

    # fit-level: the rollback signal makes fit rewind and replay
    calls = []

    def cb(tr_, done, m):
        calls.append(done)
        if len(calls) == 1:
            return "rollback"

    trainer.fit(2, log_every=0, callback=cb, chunk=2)
    assert calls == [2, 2], calls  # chunk replayed after the rollback
    assert np.isfinite(float(trainer.history[-1].net))


def test_auto_model_dtype_scale_gate(monkeypatch):
    """VERDICT r4 item 2: '' model_dtype resolves via the scale-keyed gate —
    bf16 only above MODEL_BF16_MIN_ROWS on TPU, base dtype below; explicit
    forces win; f64 oracle dtypes are never quantized."""
    import jax.numpy as jnp

    from lvae_tpu.models import vae as mv

    monkeypatch.setattr(mv, "use_bf16_model", None)
    # CPU backend (tests force it): auto never picks bf16 regardless of rows
    assert mv.auto_model_dtype(4_000) == jnp.float32
    assert mv.auto_model_dtype(20_000) == jnp.float32
    # forced ON: bf16 for an f32 base even below the threshold...
    monkeypatch.setattr(mv, "use_bf16_model", True)
    assert mv.auto_model_dtype(100) == jnp.bfloat16
    # ...but never for the f64 oracle dtype
    assert mv.auto_model_dtype(100, jnp.float64) == jnp.float64
    # forced OFF beats any scale
    monkeypatch.setattr(mv, "use_bf16_model", False)
    assert mv.auto_model_dtype(10**6) == jnp.float32


def test_pipeline_model_dtype_pins_override_auto(tmp_path, monkeypatch):
    """An explicit config model_dtype pins the VAE compute dtype both ways,
    bypassing the auto gate (the gate's doc contract)."""
    import jax.numpy as jnp

    from lvae_tpu.models import vae as mv

    monkeypatch.setattr(mv, "use_bf16_model", True)  # auto would say bf16
    cfg = make_cfg(
        str(tmp_path), epochs=1, run_validation=False, generate_images=False,
        run_tests=False, model_dtype="float32",
    )
    p = LVAEPipeline(cfg, {"train": healthmnist_like(p=4, t=3, seed=0)})
    assert p.model.dtype == jnp.float32
    cfg2 = make_cfg(
        str(tmp_path), epochs=1, run_validation=False, generate_images=False,
        run_tests=False, model_dtype="bfloat16",
    )
    monkeypatch.setattr(mv, "use_bf16_model", False)  # auto would say f32
    p2 = LVAEPipeline(cfg2, {"train": healthmnist_like(p=4, t=3, seed=0)})
    assert p2.model.dtype == jnp.bfloat16
