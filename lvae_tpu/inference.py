"""Serving-side inference API.

The reference has no deployment story — evaluation happens inline in the
training scripts. This module packages a trained L-VAE into a standalone
predictor with jit-compiled, reusable entry points for the three product
capabilities:

* :meth:`LVAEPredictor.impute` — reconstruct missing pixels of observed
  frames (the imputation task, README.MD:7);
* :meth:`LVAEPredictor.predict_trajectory` — given any observed frames of a
  subject (even one never seen in training), predict its frames at arbitrary
  query covariates — future timepoints, counterfactual covariates
  (utils.py:115-211 → decode);
* :meth:`LVAEPredictor.encode` / :meth:`decode` — raw latent access.

State loads from this framework's checkpoints (utils/checkpoint.py) written
by the pipeline, keeping the training cohort's covariates + encoded means as
the GP regression basis.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lvae_tpu.evaluation.encode import decode_latents, encode_dataset
from lvae_tpu.ops import kernels as kx
from lvae_tpu.ops.predict import predict_latents
from lvae_tpu.train.state import GPParams


class LVAEPredictor(NamedTuple):
    """A frozen, trained L-VAE ready for serving."""

    model: object
    vae_params: dict
    gp_params: GPParams
    noise: jax.Array
    spec0: kx.KernelSpec
    spec1: kx.KernelSpec
    z: jax.Array
    id_covariate: int
    basis_labels: np.ndarray  # training/reference cohort covariates [N, Q]
    basis_mu: np.ndarray  # their encoded latent means [N, L]
    eps: float = 1e-5

    # ------------------------------------------------------------- factories
    @classmethod
    def from_pipeline(cls, pipeline) -> "LVAEPredictor":
        """Package a trained :class:`~lvae_tpu.pipeline.LVAEPipeline`."""
        vae_params, gp_params, noise = pipeline.current_params()
        mu, _ = encode_dataset(pipeline.model, vae_params, pipeline.dataset.data)
        return cls(
            model=pipeline.model,
            vae_params=vae_params,
            gp_params=gp_params,
            noise=noise,
            spec0=pipeline.spec0,
            spec1=pipeline.spec1,
            z=pipeline.trainer.tdata.z,
            id_covariate=pipeline.cfg.id_covariate,
            basis_labels=np.asarray(pipeline.dataset.labels),
            basis_mu=mu,
            eps=pipeline.cfg.eps,
        )

    @classmethod
    def from_checkpoint(
        cls, path: str, pipeline_cfg, dataset=None
    ) -> "LVAEPredictor":
        """Rebuild from a pipeline checkpoint + its config (+ train data)."""
        from lvae_tpu.pipeline import LVAEPipeline
        from lvae_tpu.utils.checkpoint import load_checkpoint

        pipeline = LVAEPipeline(
            pipeline_cfg, {"train": dataset} if dataset is not None else None
        )
        trainer = pipeline.build_trainer()
        trainer.state = load_checkpoint(path, like=trainer.state)
        return cls.from_pipeline(pipeline)

    # ------------------------------------------------------------ primitives
    def encode(self, data) -> np.ndarray:
        """Data → latent means [N, L]."""
        mu, _ = encode_dataset(self.model, self.vae_params, np.asarray(data))
        return mu

    def decode(self, latents) -> np.ndarray:
        """Latents [N, L] → data space."""
        return decode_latents(self.model, self.vae_params, np.asarray(latents))

    # ---------------------------------------------------------- capabilities
    def impute(self, data, mask=None) -> np.ndarray:
        """Reconstruct frames; where ``mask`` marks pixels observed, keep the
        observation and fill only the missing entries with the model."""
        data = np.asarray(data)
        recon = self.decode(self.encode(data))
        if mask is None:
            return recon
        mask = np.asarray(mask, np.float32).reshape(recon.shape)
        return data * mask + recon * (1.0 - mask)

    def predict_latent_trajectory(
        self,
        observed_data,
        observed_labels,
        query_labels,
    ) -> np.ndarray:
        """GP posterior latents at ``query_labels`` [Nq, Q] → [Nq, L].

        ``observed_*`` extend the regression basis — typically a new subject's
        observed timepoints; queries for that subject ride its id kernel,
        queries for unseen subjects get the population (shared-kernel) mean.
        """
        obs_mu = self.encode(observed_data)
        basis_labels = np.concatenate(
            [np.asarray(observed_labels), self.basis_labels], axis=0
        )
        basis_mu = np.concatenate([obs_mu, self.basis_mu], axis=0)
        return predict_latents(
            self.spec0, self.spec1, self.gp_params.kp0, self.gp_params.kp1,
            self.noise, basis_labels, basis_mu,
            np.asarray(query_labels), self.z, self.id_covariate, self.eps,
        )

    def predict_trajectory(
        self, observed_data, observed_labels, query_labels
    ) -> np.ndarray:
        """Predicted frames at the query covariates (decode of the above)."""
        z_pred = self.predict_latent_trajectory(
            observed_data, observed_labels, query_labels
        )
        return self.decode(z_pred)
