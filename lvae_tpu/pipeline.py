"""End-to-end L-VAE pipeline: the programmatic equivalent of ``LVAE.py``.

Wires config → data → model → GP prior → training regime → artefacts →
validation → test MSE → image generation, mirroring LVAE.py:27-434 in
SidRama/Longitudinal-VAE with the TPU-native components of this package.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lvae_tpu.config import LVAEConfig
from lvae_tpu.data.blocks import build_subject_blocks
from lvae_tpu.data.datasets import load_dataset
from lvae_tpu.evaluation.encode import encode_dataset
from lvae_tpu.evaluation.generation import recon_complete_gen
from lvae_tpu.evaluation.testing import (
    join_specs,
    mse_test_exact,
    mse_test_gp_approx,
)
from lvae_tpu.evaluation.validate import validate
from lvae_tpu.models.vae import auto_model_dtype, make_vae
from lvae_tpu.ops import kernels as kx
from lvae_tpu.train import state as st
from lvae_tpu.train.hensman import HensmanConfig, HensmanTrainer
from lvae_tpu.train.standard import StandardConfig, StandardTrainer
from lvae_tpu.utils.checkpoint import save_checkpoint, try_load_checkpoint
from lvae_tpu.utils.metrics import MetricsLogger, device_memory_stats


def _dtype_of(cfg: LVAEConfig):
    return {"float32": jnp.float32, "float64": jnp.float64, "bfloat16": jnp.bfloat16}[
        cfg.dtype
    ]


class LVAEPipeline:
    """Build-and-run harness for one L-VAE experiment."""

    def __init__(self, cfg: LVAEConfig, datasets: Optional[dict] = None):
        cfg.validate()
        self.cfg = cfg
        self.dtype = _dtype_of(cfg)
        ds = datasets or {}

        def given_or(name, loader):
            # None-check, not truthiness: an explicitly passed (possibly
            # len==0) dataset must never be silently swapped for cfg paths
            got = ds.get(name)
            return got if got is not None else loader()

        self.dataset = given_or("train", lambda: load_dataset(cfg, "train"))
        if self.dataset is None:
            raise ValueError("No training dataset configured")
        # VI also consumes a prediction cohort when one is configured
        # (training.py:688-749) but runs fine without it
        want_pred = (
            cfg.run_tests or cfg.generate_images
            or cfg.variational_inference_training
        )
        self.prediction_dataset = given_or(
            "prediction",
            lambda: load_dataset(cfg, "prediction") if want_pred else None,
        )
        self.generation_dataset = given_or(
            "generation",
            lambda: load_dataset(cfg, "generation") if cfg.generate_images else None,
        )
        self.validation_dataset = given_or(
            "validation",
            lambda: load_dataset(cfg, "validation") if cfg.run_validation else None,
        )
        self.test_dataset = given_or(
            "test", lambda: load_dataset(cfg, "test") if cfg.run_tests else None
        )
        will_test = cfg.run_tests and self.test_dataset is not None
        will_gen = cfg.generate_images and self.generation_dataset is not None
        if (
            (will_test or will_gen)
            and self.prediction_dataset is None
            and not cfg.variational_inference_training
        ):
            # fail at construction, not mid-training in the best-model
            # callback: tests/generation regress on the prediction cohort
            # (LVAE.py:395-421 encodes prediction_dataset first). Flags set
            # without the matching test/generation dataset stay no-ops, as
            # before.
            raise ValueError(
                "run_tests/generate_images need a prediction cohort: pass "
                "datasets['prediction'] or set csv_file_prediction_data/"
                "prediction_mask_file"
            )
        print(f"Length of dataset:  {len(self.dataset)}")
        if not len(self.dataset):
            raise ValueError("Dataset is empty")

        self.num_dim = cfg.num_dim or self.dataset.num_dim
        self.q = self.dataset.num_covariates
        # '' = auto: scale-gated bf16 VAE compute (models/vae.auto_model_dtype
        # — bf16 above the measured row threshold on TPU, the GP dtype
        # below). An explicit model_dtype pins either way.
        model_dtype = (
            {"float32": jnp.float32, "float64": jnp.float64,
             "bfloat16": jnp.bfloat16}[cfg.model_dtype]
            if cfg.model_dtype
            else auto_model_dtype(len(self.dataset), self.dtype)
        )
        self.model = make_vae(
            cfg.type_nnet, cfg.latent_dim, self.num_dim,
            vy_init=cfg.vy_init, dropout=cfg.dropout,
            dropout_input=cfg.dropout_input, dtype=model_dtype,
            T=cfg.T or None, hidden_dim=cfg.hidden_dim, type_rnn=cfg.type_rnn,
        )
        self.spec0, self.spec1 = kx.split_kernel_spec(
            id_covariate=cfg.id_covariate, **cfg.kernel_spec_kwargs()
        )
        self.blocks = build_subject_blocks(self.dataset.labels, cfg.id_covariate)
        self.metrics = MetricsLogger(cfg.results_path or cfg.save_path)
        self.trainer = None
        self.best = {"val": np.inf, "epoch": 0}

    # ---------------------------------------------------------------- setup
    def _load_pretrained_vae(self, trainer) -> None:
        """LVAE.py:146-150: seed the VAE from a pre-training checkpoint.

        Accepts both this framework's ``.ckpt`` pytree snapshots and the
        reference's torch ``.pth`` state_dicts (converted via
        utils.torch_compat) so reference users can migrate trained VAEs.
        """
        like_vae = (
            trainer.state.trainables.vae
            if hasattr(getattr(trainer, "state", None), "trainables")
            else None
        )
        ckpt = self._pretrained_vae_params(like=like_vae)
        if ckpt is None:
            print("Did not load pre-trained values.")
            return
        try:
            if trainer is self.trainer and hasattr(trainer.state, "trainables"):
                tr = trainer.state.trainables._replace(vae=ckpt)
                trainer.state = trainer.state._replace(trainables=tr)
                print("Loaded pre-trained values.")
            else:
                # checkpoint was readable but NOT installed — saying
                # "loaded" here would fake a successful resume
                print(
                    "Did not load pre-trained values: trainer state has no "
                    "trainables (or is not the pipeline's trainer)."
                )
        except Exception as e:  # noqa: BLE001
            print(f"Did not load pre-trained values: {e}")

    def _pretrained_vae_params(self, like=None):
        """Load ``cfg.model_params`` as VAE params — ``.ckpt`` pytree or
        reference torch ``.pth`` state_dict — or return None."""
        path = self.cfg.model_params
        if not (path and os.path.exists(path)):
            return None
        if path.endswith(".pth"):
            try:
                from lvae_tpu.utils.torch_compat import load_torch_vae_checkpoint

                return load_torch_vae_checkpoint(
                    path, self.cfg.type_nnet, self.cfg.latent_dim
                )
            except Exception as e:  # noqa: BLE001
                print(f"torch checkpoint conversion failed: {e}")
                return None
        return self._load_ckpt(path, like=like)

    def build_trainer(self):
        cfg = self.cfg
        z = st.init_inducing_points(
            self.dataset.labels, cfg.M, seed=cfg.seed, dtype=np.float32
        )
        if cfg.hensman:
            hcfg = HensmanConfig(
                spec0=self.spec0, spec1=self.spec1, latent_dim=cfg.latent_dim,
                P_tot=self.blocks.num_subjects, N_tot=len(self.dataset),
                weight=cfg.weight, loss_function=cfg.loss_function,
                natural_gradient=cfg.natural_gradient,
                natural_gradient_lr=cfg.natural_gradient_lr,
                constrain_scales=cfg.constrain_scales, eps=cfg.eps,
                dropout=cfg.dropout > 0, vy_fixed=cfg.vy_fixed,
                learn_inducing=cfg.learn_inducing,
            )
            self.trainer = HensmanTrainer(
                self.model, hcfg, self.dataset, self.blocks, z,
                subjects_per_batch=cfg.subjects_per_batch,
                learning_rate=cfg.learning_rate, seed=cfg.seed, dtype=self.dtype,
                t_buckets=cfg.T_buckets,
            )
            if cfg.data_mesh * cfg.latent_mesh > 1:
                from lvae_tpu.parallel.mesh import (
                    ShardedHensmanTrainer,
                    make_mesh,
                )

                mesh = make_mesh(data=cfg.data_mesh, latent=cfg.latent_mesh)
                # the sharded wrapper re-places state/table on the mesh and
                # delegates everything else to the inner trainer
                self.trainer = ShardedHensmanTrainer(self.trainer, mesh)
        elif cfg.variational_inference_training:
            raise RuntimeError(
                "the VI regime has no amortised trainer; run() routes it "
                "through run_vi() (training.py:602-764)"
            )
        else:
            scfg = StandardConfig(
                spec0=self.spec0, spec1=self.spec1, latent_dim=cfg.latent_dim,
                P_tot=self.blocks.num_subjects, T=self.blocks.t_max,
                weight=cfg.weight, loss_function=cfg.loss_function,
                type_KL=cfg.type_KL, num_samples=cfg.num_samples,
                constrain_scales=cfg.constrain_scales, eps=cfg.eps,
                dropout=cfg.dropout > 0, vy_fixed=cfg.vy_fixed,
            )
            self.trainer = StandardTrainer(
                self.model, scfg, self.dataset, self.blocks, z,
                learning_rate=cfg.learning_rate, seed=cfg.seed, dtype=self.dtype,
                pseudo_minibatch=cfg.mini_batch,
            )
            if cfg.data_mesh * cfg.latent_mesh > 1:
                if cfg.mini_batch:
                    print(
                        "WARNING: --data_mesh/--latent_mesh are ignored with "
                        "mini_batch=True (the GPPVAE pseudo-minibatch regime "
                        "exists to bound memory); training single-device"
                    )
                else:
                    from lvae_tpu.parallel.mesh import (
                        ShardedStandardTrainer,
                        make_mesh,
                    )

                    mesh = make_mesh(data=cfg.data_mesh, latent=cfg.latent_mesh)
                    self.trainer = ShardedStandardTrainer(self.trainer, mesh)
        self._load_pretrained_vae(self.trainer)
        self._try_resume(self.trainer)
        return self.trainer

    # ------------------------------------------------- checkpoint backend
    def _save_ckpt(self, path: str, state, metadata=None) -> None:
        """Write through the configured backend (SURVEY §5 checkpoint/resume;
        the orbax backends add atomic directory commits and async save)."""
        if self.cfg.checkpoint_backend.startswith("orbax"):
            from lvae_tpu.utils.checkpoint import save_checkpoint_orbax

            save_checkpoint_orbax(
                path, state,
                async_save=self.cfg.checkpoint_backend == "orbax_async",
            )
        else:
            save_checkpoint(path, state, metadata=metadata)

    def _load_ckpt(self, path: str, like):
        """Load either backend's artifact — orbax snapshots are directories,
        pickle snapshots files — so runs can resume across backends."""
        if os.path.isdir(path):
            from lvae_tpu.utils.checkpoint import load_checkpoint_orbax

            try:
                return load_checkpoint_orbax(path, like)
            except Exception as e:  # noqa: BLE001 — corrupt → fresh start
                print(f"Checkpoint load failed ({path}): {e}")
                return None
        return try_load_checkpoint(path, like)

    def _try_resume(self, trainer) -> None:
        """LVAE.py:214-234 semantics: resume GP/variational/VAE state from a
        prior run's folder when one exists (full-state checkpoint here)."""
        folder = self.cfg.gp_model_folder
        if not folder:
            return
        for name in ("model_final.ckpt", "model_best.ckpt"):
            path = os.path.join(folder, name)
            state = (
                self._load_ckpt(path, like=trainer.state)
                if os.path.exists(path)
                else None
            )
            if state is not None:
                trainer.state = state
                print(f"Loaded GP models (resumed from {path})")
                return
        print("GP model loading failed!")

    # -------------------------------------------------------------- training
    def _epoch_callback(self, trainer, epoch, metrics):
        """Per-chunk housekeeping: metrics, NaN guard, validation cadence.

        Validation/best-model tracking fires every ``test_freq`` epochs — the
        reference hardcodes 25 (training.py:150) while *parsing* a
        ``test_freq`` flag it never reads (parse_model_args.py:73); honouring
        the flag is the intended behaviour, and our default is 25 to match
        the reference's actual cadence. ``train()`` sizes the dispatch chunk
        so callbacks land on every multiple of both ``checkpoint_every`` and
        ``test_freq``.
        """
        cfg = self.cfg
        # the callback fires once per dispatch CHUNK with the chunk's last
        # metrics; the machine-readable stream must still get one record per
        # EPOCH (like stdout and diagnostics.pkl) — drain the trainer's
        # history since the last callback instead of logging only the tail
        hist = getattr(trainer, "history", None) or []
        start = getattr(self, "_metrics_logged", 0)
        fresh = hist[start:]
        out = cfg.results_path or cfg.save_path
        last = os.path.join(out, "model_last.ckpt")
        if cfg.auto_recover:
            from lvae_tpu.train.state import tree_finite

            if not bool(tree_finite(trainer.state.trainables)):
                # recover BEFORE logging: the NaN'd chunk's epochs are
                # REPLAYED (fit rewinds on "rollback"), so its metrics must
                # not enter metrics.jsonl/diagnostics.pkl as real epochs
                self._recover(trainer, epoch, last)
                if fresh:
                    del trainer.history[start:]
                return "rollback"
        if fresh:
            base = epoch - len(fresh)
            for i, m in enumerate(fresh):
                self.metrics.log(
                    base + i + 1,
                    m._asdict() if hasattr(m, "_asdict") else dict(m),
                )
            self._metrics_logged = len(hist)
        else:
            self.metrics.log(
                epoch,
                metrics._asdict() if hasattr(metrics, "_asdict") else dict(metrics),
            )
        if cfg.auto_recover:
            # rolling known-good snapshot (doubles as crash-resume point);
            # finiteness was already checked above
            self._save_ckpt(last, trainer.state, metadata={"epoch": epoch})
        elif cfg.checkpoint_every > 0 and epoch % cfg.checkpoint_every == 0:
            # the flag's advertised cadence (a crash at epoch 900 of 1000
            # must not lose everything just because auto_recover is off)
            self._save_ckpt(last, trainer.state, metadata={"epoch": epoch})
        if cfg.debug_nans:
            from lvae_tpu.utils.debug import assert_state_finite

            assert_state_finite(trainer.state.trainables, where=f"epoch {epoch}")
        # NB: the final epoch validates too when the cadence lands on it —
        # the reference's in-training loop does (training.py:150) and the
        # best-model artefacts must be able to come from the last epoch.
        # run()'s post-training validate (LVAE.py:378-393) is a separate,
        # non-best-tracking report, as in the reference.
        if self.validation_dataset is None:
            return
        if cfg.test_freq <= 0 or epoch % cfg.test_freq != 0:
            # test_freq<=0 DISABLES the in-training cadence (it used to
            # invert: every chunk validated, generated and checkpointed)
            return
        vae_params, gp_params, noise = self.current_params()
        res = validate(
            self.model, vae_params, gp_params, noise, self.spec0, self.spec1,
            self.validation_dataset, trainer.tdata.z, cfg.id_covariate,
            cfg.weight, cfg.loss_function, cfg.latent_dim, cfg.eps,
            type_kl=cfg.type_KL, num_samples=cfg.num_samples,
        )
        if res.net < self.best["val"]:
            self.best = {"val": res.net, "epoch": epoch}
            print("Saving better model")
            out = cfg.results_path or cfg.save_path
            self._save_ckpt(
                os.path.join(out, "model_best.ckpt"), trainer.state,
                metadata={"epoch": epoch, "val": res.net},
            )
            run_tests = cfg.run_tests and self.test_dataset is not None
            gen = cfg.generate_images and self.generation_dataset is not None
            pred = self.encode_prediction_cohort() if (run_tests or gen) else None
            if run_tests:
                self._run_tests(save_file="result_error_best.csv", pred=pred)
            if gen:
                # best-model artefact (training.py:200-204 →
                # predict_HealthMNIST.py:140: recon_complete_best.pdf)
                prediction_x, prediction_mu = pred
                recon_complete_gen(
                    self.generation_dataset, self.model, vae_params, gp_params,
                    noise, self.spec0, self.spec1, prediction_x, prediction_mu,
                    trainer.tdata.z, cfg.id_covariate,
                    cfg.results_path or cfg.save_path, epoch=epoch, eps=cfg.eps,
                )

    def _recover(self, trainer, epoch, last_path: str) -> None:
        """Failure recovery: non-finite training state → reload the rolling
        known-good snapshot and perturb the RNG stream so the replayed
        stretch takes a different sample path. Gives up after 3 attempts.

        (The reference would silently continue with NaN losses; the
        natural-gradient update already self-contains single-step blowups —
        ops/elbo.py natural_gradient_update — this handles the rest.)
        """
        self.recoveries = getattr(self, "recoveries", 0) + 1
        if self.recoveries > 3:
            raise FloatingPointError(
                f"state non-finite at epoch {epoch}; giving up after "
                f"{self.recoveries - 1} recoveries"
            )
        from lvae_tpu.utils.checkpoint import wait_for_async_saves

        wait_for_async_saves()  # the rolling snapshot may still be in flight
        state = self._load_ckpt(last_path, like=trainer.state)
        if state is None:
            raise FloatingPointError(
                f"state non-finite at epoch {epoch} and no recovery "
                f"checkpoint at {last_path}"
            )
        state = state._replace(rng=jax.random.fold_in(state.rng, self.recoveries))
        trainer.state = state
        print(
            f"Recovered from non-finite state at epoch {epoch} "
            f"(attempt {self.recoveries}; resumed from {last_path})",
            flush=True,
        )

    def train(self):
        import math

        if self.trainer is None:
            self.build_trainer()
        start = time.perf_counter()
        fit_kwargs = dict(log_every=1, callback=self._epoch_callback)
        # the multi-epoch dispatch chunk must divide both cadences so the
        # callback observes every checkpoint AND every validation epoch
        chunk = max(1, int(self.cfg.checkpoint_every or 0))
        if self.cfg.test_freq and self.cfg.test_freq > 0:
            chunk = math.gcd(chunk, int(self.cfg.test_freq))
        if chunk == 1 and max(
            int(self.cfg.checkpoint_every or 0), int(self.cfg.test_freq or 0)
        ) > 1:
            print(
                "NOTE: coprime --checkpoint_every/--test_freq collapse the "
                "multi-epoch dispatch chunk to 1 (one device round trip per "
                "epoch — slow on a remote chip); align the cadences to keep "
                "multi-epoch dispatch"
            )
        fit_kwargs["chunk"] = chunk
        if self.cfg.profile:
            # jax.profiler trace (replaces the reference's wall-clock-only
            # timing, LVAE.py:304-337); view with tensorboard/xprof
            out = self.cfg.results_path or self.cfg.save_path
            with jax.profiler.trace(os.path.join(out, "profile")):
                self.trainer.fit(self.cfg.epochs, **fit_kwargs)
        else:
            self.trainer.fit(self.cfg.epochs, **fit_kwargs)
        dur = time.perf_counter() - start
        print(f"Duration of training: {dur:.2f} seconds")
        if self.cfg.memory_dbg:
            print(f"Device memory: {device_memory_stats()}")
        return self.trainer.history

    # --------------------------------------------------------------- params
    def current_params(self):
        tr = self.trainer.state.trainables
        noise = (
            jnp.ones_like(tr.gp.raw_noise)
            if self.cfg.constrain_scales
            else kx.constrain(tr.gp.raw_noise)
        )
        return tr.vae, tr.gp, noise

    def encode_prediction_cohort(self):
        ds = self.prediction_dataset
        vae_params, _, _ = self.current_params()
        mu, _ = encode_dataset(self.model, vae_params, ds.data)
        return ds.labels, mu

    # ------------------------------------------------------------ evaluation
    def _run_tests(self, save_file: str = "result_error.csv", pred=None):
        cfg = self.cfg
        vae_params, gp_params, noise = self.current_params()
        # callers with both run_tests and generate_images on pass the encoded
        # cohort in so the full encoder pass runs once per model snapshot
        prediction_x, prediction_mu = pred or self.encode_prediction_cohort()
        out = cfg.results_path or cfg.save_path
        if cfg.type_KL in ("GPapprox", "GPapprox_closed"):
            return mse_test_gp_approx(
                self.model, vae_params, gp_params, noise, self.spec0, self.spec1,
                self.test_dataset, prediction_x, prediction_mu,
                self.trainer.tdata.z, cfg.id_covariate, cfg.eps,
                results_path=out, save_file=save_file,
                # sharded trainer → mesh-parallel GP posterior too
                mesh=getattr(self.trainer, "mesh", None),
            )
        spec_full, kp_full = join_specs(
            self.spec0, self.spec1, gp_params.kp0, gp_params.kp1
        )
        return mse_test_exact(
            self.model, vae_params, kp_full, spec_full, noise,
            self.test_dataset, prediction_x, prediction_mu, cfg.eps,
            results_path=out, save_file=save_file,
        )

    def save_artifacts(self):
        """Final artefacts (LVAE.py:346-370): diagnostics + full checkpoint."""
        cfg = self.cfg
        out = cfg.save_path
        os.makedirs(out, exist_ok=True)
        hist = self.trainer.history
        if self.best["epoch"]:
            print("Best results in epoch: " + str(self.best["epoch"]))
        with open(os.path.join(out, "diagnostics.pkl"), "wb") as f:
            pickle.dump(hist, f)
        # plot_values.pkl = [train_x, mu, log_var, Z, label_id]
        # (LVAE.py:350). The reference stores mu/log_var left over from the
        # LAST CHUNK of the pre-training GP-init loop (LVAE.py:159-172) — a
        # scope accident; we save the final model's full-cohort encodings,
        # which is the plotting payload the artefact exists for.
        from lvae_tpu.models.vae import sample_latent

        vae_params, _, _ = self.current_params()
        mu, log_var = encode_dataset(self.model, vae_params, self.dataset.data)
        z_sample = np.asarray(
            jax.jit(sample_latent)(
                jax.random.key(cfg.seed), jnp.asarray(mu), jnp.asarray(log_var)
            )
        )
        with open(os.path.join(out, "plot_values.pkl"), "wb") as f:
            pickle.dump(
                [
                    np.asarray(self.dataset.labels),
                    mu,
                    log_var,
                    z_sample,
                    np.arange(len(self.dataset)),
                ],
                f,
            )
        self._save_ckpt(os.path.join(out, "model_final.ckpt"), self.trainer.state)
        if cfg.hensman:
            # LVAE.py:353-370: gp_model.pth + zt_list/m/H .pth so a GP
            # trained here resumes in the reference (bidirectional migration)
            try:
                from lvae_tpu.utils.torch_compat import save_reference_gp_state

                state = self.trainer.state
                tr = state.trainables
                if state.m_nat is not None:
                    m_out, h_out = state.m_nat, state.H_nat
                else:
                    m_out = tr.m
                    h_out = st.psd_from_factor(tr.h_factor)
                save_reference_gp_state(
                    out, tr.gp, np.asarray(self.trainer.tdata.z),
                    np.asarray(m_out), np.asarray(h_out),
                    latent_dim=cfg.latent_dim,
                    constrain_scales=cfg.constrain_scales,
                    id_covariate=cfg.id_covariate,
                    **cfg.kernel_spec_kwargs(),
                )
            except Exception as e:  # noqa: BLE001 — torch is optional here
                print(f"reference GP-state export skipped: {e}")
        if self.cfg.checkpoint_backend == "orbax_async":
            from lvae_tpu.utils.checkpoint import wait_for_async_saves

            wait_for_async_saves()
        self.metrics.flush()

    def run_vi(self, pred_epochs: int = 1000):
        """The VI regime end-to-end (LVAE.py:289-301 →
        training.py:602-764): optimise free per-point (mu, log_var) with the
        decoder + GP hyperparameters, then jointly infer the prediction
        cohort's latents (``pred_epochs`` steps, reference fixes 1000), then
        decode the generation grid."""
        import jax.numpy as jnp

        from lvae_tpu.train.vi import VIConfig, VITrainer

        cfg = self.cfg
        if cfg.run_tests or cfg.run_validation:
            # the reference's VI branch never reaches the test/validation
            # sections (LVAE.py:325-344 leaves `_` unbound → NameError);
            # the intended surface is train + prediction-set inference +
            # generation only
            print(
                "WARNING: run_tests/run_validation are not supported under "
                "variational_inference_training; ignoring"
            )
        vae_params = self._pretrained_vae_params()
        if vae_params is None:
            rows = int(getattr(self.model, "T", 0) or 0) or 2
            vae_params = jax.jit(
                lambda k, x: self.model.init(k, x, deterministic=True)
            )(jax.random.key(cfg.seed), jnp.asarray(self.dataset.data[:rows]))
            print("Did not load pre-trained values.")
        else:
            print("Loaded pre-trained values.")
        gp_params = st.init_gp_params(
            self.spec0, self.spec1, cfg.latent_dim,
            constrain_scales=cfg.constrain_scales,
        )
        z = st.init_inducing_points(self.dataset.labels, cfg.M, seed=cfg.seed)
        vicfg = VIConfig(
            spec0=self.spec0, spec1=self.spec1, latent_dim=cfg.latent_dim,
            weight=cfg.weight, loss_function=cfg.loss_function,
            constrain_scales=cfg.constrain_scales, eps=cfg.eps,
        )
        self.trainer = VITrainer(
            self.model, vicfg, self.dataset, self.blocks, z, vae_params,
            gp_params, learning_rate=cfg.learning_rate, seed=cfg.seed,
            dtype=self.dtype,
        )
        if cfg.data_mesh * cfg.latent_mesh > 1:
            from lvae_tpu.parallel.mesh import ShardedVITrainer, make_mesh

            mesh = make_mesh(data=cfg.data_mesh, latent=cfg.latent_mesh)
            self.trainer = ShardedVITrainer(self.trainer, mesh)
        # resume the optimised variational state (training.py:628-634 loads
        # mu.pth/log_var.pth from gp_model_folder; here one VIState snapshot)
        if cfg.gp_model_folder:
            path = os.path.join(cfg.gp_model_folder, "model_vi.ckpt")
            state = (
                self._load_ckpt(path, like=self.trainer.state)
                if os.path.exists(path)
                else None
            )
            if state is not None:
                self.trainer.state = state
                print(f"Loaded VI state (resumed from {path})")
        self.trainer.fit(cfg.epochs, log_every=1)
        os.makedirs(cfg.save_path, exist_ok=True)
        # final-vae_model.pth + mu.pth + log_var.pth (training.py:681-683):
        # the whole optimised VIState in one snapshot
        self._save_ckpt(
            os.path.join(cfg.save_path, "model_vi.ckpt"), self.trainer.state
        )
        if self.prediction_dataset is not None:
            trainer = self.trainer
            mu_pred, lv_pred = trainer.optimize_prediction_set(
                self.prediction_dataset, epochs=pred_epochs
            )
            # mu_pred.pth/log_var_pred.pth (training.py:748-749)
            self._save_ckpt(
                os.path.join(cfg.save_path, "vi_prediction.ckpt"),
                {"mu_pred": mu_pred, "log_var_pred": lv_pred},
            )
            if cfg.generate_images and self.generation_dataset is not None:
                # variational_complete_gen (predict_HealthMNIST.py:145-172):
                # decode GP-predicted latents from the jointly-optimised
                # cohort, in the trainer's own row order (single source)
                prediction_x, prediction_mu = trainer.joint_cohort(
                    self.prediction_dataset, mu_pred
                )
                noise = (
                    jnp.ones((cfg.latent_dim,))
                    if cfg.constrain_scales
                    else kx.constrain(trainer.state.gp.raw_noise)
                )
                recon_complete_gen(
                    self.generation_dataset, self.model, trainer.state.vae,
                    trainer.state.gp, noise, self.spec0, self.spec1,
                    prediction_x, prediction_mu, trainer.z_ind,
                    cfg.id_covariate, cfg.results_path or cfg.save_path,
                    epoch=cfg.epochs, eps=cfg.eps,
                )
        self.metrics.flush()
        return None

    def run(self):
        """Full experiment: train → save → validate → test → generate."""
        cfg = self.cfg
        if cfg.variational_inference_training:
            return self.run_vi()
        self.build_trainer()
        self.train()
        self.save_artifacts()
        if cfg.run_validation and self.validation_dataset is not None:
            vae_params, gp_params, noise = self.current_params()
            validate(
                self.model, vae_params, gp_params, noise, self.spec0, self.spec1,
                self.validation_dataset, self.trainer.tdata.z, cfg.id_covariate,
                cfg.weight, cfg.loss_function, cfg.latent_dim, cfg.eps,
                type_kl=cfg.type_KL, num_samples=cfg.num_samples,
            )
        result = None
        run_tests = cfg.run_tests and self.test_dataset is not None
        gen = cfg.generate_images and self.generation_dataset is not None
        pred = self.encode_prediction_cohort() if (run_tests or gen) else None
        if run_tests:
            result = self._run_tests(pred=pred)
        if gen:
            vae_params, gp_params, noise = self.current_params()
            prediction_x, prediction_mu = pred
            recon_complete_gen(
                self.generation_dataset, self.model, vae_params, gp_params,
                noise, self.spec0, self.spec1, prediction_x, prediction_mu,
                self.trainer.tdata.z, cfg.id_covariate,
                cfg.results_path or cfg.save_path, epoch=-1, eps=cfg.eps,
            )
        return result
