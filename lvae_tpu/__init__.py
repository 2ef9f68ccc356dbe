"""lvae_tpu — a TPU-native JAX/XLA/Pallas framework for Longitudinal VAEs.

A ground-up rebuild of the capabilities of SidRama/Longitudinal-VAE
(Ramchandran et al., AISTATS 2021): a VAE whose latent code is regularised by a
multi-output additive Gaussian-process prior over auxiliary covariates, with
sparse inducing-point ELBOs, stochastic variational inference with natural
gradients, missing-data imputation, and future-timepoint prediction.

Unlike the PyTorch/GPyTorch reference, everything here is built TPU-first:

* kernels are pure functions over a declarative, hashable spec — one fused
  broadcast builds the ``[L, N, M]`` kernel stack for all latent dims at once
  (replacing GPyTorch lazy tensors / ``batch_shape``);
* ragged per-subject time series are padded subject blocks ``[P, T_max]`` with
  a validity mask folded into the kernels (replacing the reference's
  per-subject Python loop, ``elbo_functions.py:264-288``);
* the training step — including the closed-form natural-gradient update of the
  variational parameters (m, H) — is a single ``jit``-compiled program, with
  the epoch driven by ``lax.scan``;
* scaling is expressed over a ``jax.sharding.Mesh`` ('data', 'latent'): the
  subject axis is data-parallel (the KLD scalar terms are sums over subjects →
  ``psum``), latent GPs are model-parallel over the latent axis.
"""

__version__ = "0.1.0"

from lvae_tpu.config import LVAEConfig, VAEConfig, load_flag_file  # noqa: F401
