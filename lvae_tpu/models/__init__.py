"""Encoder/decoder model families."""

from lvae_tpu.models.vae import ConvVAE, SimpleVAE, make_vae, vae_loss  # noqa: F401
