"""Custom Pallas TPU kernels for the framework's hot ops."""

from lvae_tpu.kernels_pallas.cholesky import cholesky_inverse  # noqa: F401
