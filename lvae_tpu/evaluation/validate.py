"""Validation loss: reconstruction + batched DUBO GP term.

Rebuild of validation.py:70-175 in SidRama/Longitudinal-VAE: encode the
validation cohort, compute recon/NLL sums and the deviance upper bound of the
GP KL over all latent dims, combine per the loss function and report in the
reference's print format. (The reference hardcodes ``T=16`` at
validation.py:95 — a bug; we use the cohort's true block structure.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lvae_tpu.data.blocks import build_subject_blocks
from lvae_tpu.models import vae as mv
from lvae_tpu.ops import elbo as eb


class ValidationResult(NamedTuple):
    net: float
    gp: float
    nll: float
    recon: float


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 15, 16))
def _validate_jit(
    model, spec0, spec1, params, kp0, kp1, noise, data, labels, pixmask,
    block_idx, block_mask, z, eps, rng, type_kl="GPapprox_closed",
    num_samples=1,
):
    recon, mu, log_var = model.apply(params, data, rng=rng, deterministic=True)
    mse_i, nll_i = mv.vae_loss(params["params"]["raw_log_vy"], recon, data, pixmask)
    recon_sum = jnp.sum(mse_i)
    nll_sum = jnp.sum(nll_i)

    p, t = block_idx.shape
    latent = mu.shape[-1]
    xb = jnp.take(labels, block_idx.reshape(-1), axis=0).reshape(p, t, -1)
    xb = xb * block_mask[..., None]
    mu_b = jnp.take(mu, block_idx.reshape(-1), axis=0).reshape(p, t, latent)
    lv_b = jnp.take(log_var, block_idx.reshape(-1), axis=0).reshape(p, t, latent)
    ops = eb.gp_block_operators(spec0, spec1, kp0, kp1, noise, xb, z, block_mask, eps)
    # 'GPapprox' gets the sample-based bound (validation.py:137-145); every
    # other regime — including 'closed', where the reference's validation
    # call chain is unreachable (LVAE.py:392 calls .eval() on a bare list) —
    # gets the DUBO, the reference's default validation loss.
    if type_kl == "GPapprox":
        keys = jax.random.split(jax.random.fold_in(rng, 1), num_samples)

        def one(key):
            zb = mv.sample_latent(key, mu_b, lv_b)
            return -jnp.sum(eb.gp_elbo(ops, zb))

        gp_loss = jnp.mean(jax.vmap(one)(keys))
    else:
        gp_loss = jnp.sum(eb.dubo(ops, mu_b, lv_b))
    return recon_sum, nll_sum, gp_loss


def validate(
    model,
    params,
    gp_params,
    noise,
    spec0,
    spec1,
    dataset,
    z,
    id_covariate: int,
    weight: float,
    loss_function: str = "mse",
    latent_dim: int = None,
    eps: float = 1e-6,
    rng=None,
    verbose: bool = True,
    type_kl: str = "GPapprox_closed",
    num_samples: int = 1,
) -> ValidationResult:
    """Validation metrics; prints the reference's summary line."""
    if verbose:
        print("Testing the model with a validation set")
    blocks = build_subject_blocks(dataset.labels, id_covariate)
    dtype = jnp.asarray(noise).dtype
    if rng is None:
        rng = jax.random.key(0)
    recon_sum, nll_sum, gp_loss = _validate_jit(
        model, spec0, spec1, params, gp_params.kp0, gp_params.kp1,
        jnp.asarray(noise),
        jnp.asarray(dataset.data, dtype),
        jnp.asarray(dataset.labels, dtype),
        jnp.asarray(dataset.mask, dtype),
        jnp.asarray(blocks.index),
        jnp.asarray(blocks.mask, dtype),
        jnp.asarray(z, dtype),
        eps,
        rng,
        type_kl,
        num_samples,
    )
    recon_sum, nll_sum, gp_loss = float(recon_sum), float(nll_sum), float(gp_loss)
    latent = latent_dim or gp_params.kp0.raw_scale.shape[0]
    if loss_function == "mse":
        gp = gp_loss / latent
        net = weight * gp + recon_sum
    else:
        gp = gp_loss
        net = gp + nll_sum
    if verbose:
        print(
            "Validation set - Loss: %.3f  - GP loss: %.3f  - NLL loss: %.3f"
            "  - Recon Loss: %.3f" % (net, gp, nll_sum, recon_sum)
        )
    return ValidationResult(net=net, gp=gp, nll=nll_sum, recon=recon_sum)
