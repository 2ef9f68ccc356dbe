"""Inference-math ops: kernels, ELBO/KL bounds, GP posterior prediction."""

from lvae_tpu.ops.kernels import (  # noqa: F401
    KernelComponent,
    KernelParams,
    KernelSpec,
    constrain,
    init_kernel_params,
    kernel_matrix,
    split_kernel_spec,
    unconstrain,
)
