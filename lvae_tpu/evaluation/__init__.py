"""Evaluation: dataset encoding, validation loss, test MSE, image generation."""

from lvae_tpu.evaluation.encode import encode_dataset  # noqa: F401
from lvae_tpu.evaluation.validate import validate  # noqa: F401
