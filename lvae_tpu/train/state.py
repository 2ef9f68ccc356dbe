"""Training state pytrees and optimizer assembly.

The reference carries training state implicitly in torch module attributes and
an Adam over a hand-assembled param-group list (LVAE.py:174-292). Here all
state is one explicit pytree — jit/donate/checkpoint friendly — and the
optimizer is optax.adam over exactly the trainables the regime allows:
kernel hyperparams + likelihood noise + VAE params, plus (m, H) only when
natural gradients are off (LVAE.py:236-240).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lvae_tpu.ops import kernels as kx


class GPParams(NamedTuple):
    """Trainable GP-prior hyperparameters (one entry per latent dim)."""

    kp0: kx.KernelParams
    kp1: kx.KernelParams
    raw_noise: jax.Array  # [L]


class Trainables(NamedTuple):
    """Everything the Adam optimizer sees."""

    vae: Any  # flax params pytree
    gp: GPParams
    m: Optional[jax.Array]  # [L, M, 1] — only when not natural_gradient
    h_factor: Optional[jax.Array]  # [L, M, M] free factor (PSD_H = h h^T)
    # [M, Q] learnable inducing points (learn_inducing=True). The reference
    # *intended* to optimise them but left the optimiser lines commented out
    # (LVAE.py:208, 269); here it is an opt-in capability. Discrete covariate
    # columns receive exactly-zero gradients (equality factors are piecewise
    # constant), so only the continuous columns move — the natural behaviour.
    z: Optional[jax.Array] = None


class TrainData(NamedTuple):
    """Device-resident dataset + inducing points for a training run."""

    data: jax.Array  # [N, ...] images / readings
    labels: jax.Array  # [N, Q]
    pixmask: jax.Array  # [N, D]
    z: jax.Array  # [M, Q] inducing points (frozen, LVAE.py:199-208)


class HensmanState(NamedTuple):
    trainables: Trainables
    m_nat: Optional[jax.Array]  # [L, M, 1] when natural_gradient
    H_nat: Optional[jax.Array]  # [L, M, M] PSD when natural_gradient
    opt_state: Any
    rng: jax.Array
    step: jax.Array


def init_gp_params(
    spec0: kx.KernelSpec,
    spec1: kx.KernelSpec,
    latent_dim: int,
    noise_init: float = kx.DEFAULT_NOISE,
    constrain_scales: bool = False,
    dtype=jnp.float32,
) -> GPParams:
    """GP hyperparam init matching the reference defaults (LVAE.py:183-196)."""
    noise = 1.0 if constrain_scales else noise_init
    return GPParams(
        kp0=kx.init_kernel_params(spec0, latent_dim, dtype=dtype),
        kp1=kx.init_kernel_params(spec1, latent_dim, dtype=dtype),
        raw_noise=jnp.full((latent_dim,), kx.unconstrain(noise), dtype=dtype),
    )


def init_inducing_points(
    labels: np.ndarray, m_inducing: int, seed: int = 0, dtype=np.float32
) -> np.ndarray:
    """Inducing points = a random covariate subsample.

    The reference hardcodes dataset slices (LVAE.py:199-204, with the random
    choice commented out); we use the random version — the *intended*
    behaviour — with a fixed seed for reproducibility. Points are frozen.
    """
    rng = np.random.default_rng(seed)
    n = labels.shape[0]
    idx = rng.choice(n, size=min(m_inducing, n), replace=False)
    return np.asarray(labels[idx], dtype=dtype)


def init_variational(
    latent_dim: int, m_inducing: int, natural_gradient: bool, seed: int = 0,
    dtype=jnp.float32,
):
    """(m, H) init (LVAE.py:222-226): m ~ N(0,1); H ~ N(0,1)/10, made PSD
    (H H^T) when natural gradients are used."""
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(latent_dim, m_inducing, 1))
    h = rng.normal(size=(latent_dim, m_inducing, m_inducing)) / 10.0
    if natural_gradient:
        h = h @ np.swapaxes(h, -1, -2)
    return jnp.asarray(m, dtype), jnp.asarray(h, dtype)


def psd_from_factor(h_factor: jax.Array) -> jax.Array:
    """``H = h hᵀ`` at full matmul precision.

    GP-algebra invariant (CLAUDE.md): TPU's bf16 default can round the
    product off the PSD cone before the jitter-free Cholesky inside
    minibatch_kld consumes it. Single source for the non-natural-gradient
    Hensman loss and the reference GP-state export.
    """
    with jax.default_matmul_precision("highest"):
        return h_factor @ jnp.swapaxes(h_factor, -1, -2)


def make_optimizer(
    learning_rate: float = 1e-3, kind: str | None = None
) -> optax.GradientTransformation:
    """Adam over all trainables (LVAE.py:292). ``None`` leaves pass through.

    ``kind`` selects the implementation (default: ``$LVAE_OPT`` or
    ``'adam'``): ``adam`` = plain per-leaf optax.adam (fastest in the r2
    A/B: 184 µs/step isolated, 19.1 vs 19.9 ms real epoch); ``flatten`` =
    ``optax.flatten(optax.adam)`` (one flat vector op — was the r1 winner
    at 685 → 430 µs/step, no longer); ``fused`` = the one-pass Pallas flat
    kernel (kernels_pallas/adam.py — no win isolated, and the axon-TPU
    runtime rejects it inside the donated nested-scan epoch program).
    All three are the same math; A/B numbers live in benchmarks/README.md.
    """
    import os

    kind = kind or os.environ.get("LVAE_OPT", "adam")
    if kind == "adam":
        return optax.adam(learning_rate)
    if kind == "fused":
        from lvae_tpu.kernels_pallas.adam import fused_adam

        return fused_adam(learning_rate)
    assert kind == "flatten", f"unknown optimizer kind {kind!r}"
    return optax.flatten(optax.adam(learning_rate))


@jax.jit
def tree_finite(tree) -> jax.Array:
    """True iff every leaf is finite — cheap NaN guard for failure detection.

    Jitted into ONE dispatch: the eager form issued one ``isfinite`` + one
    ``all`` per leaf, and on the remote-attached TPU every eager op is a
    full relay round trip — the ``auto_recover`` chunk callback was paying
    seconds of latency for a boolean. ``jax.jit`` caches one program per
    pytree structure (trainables / debug-state trees), so steady-state cost
    is a single execute.
    """
    leaves = [jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(tree)]
    return jnp.all(jnp.stack(leaves))
