"""Batched Cholesky helpers used by the GP bounds.

All functions broadcast over arbitrary leading batch dims — the TPU-native
replacement for the reference's batched ``torch.cholesky`` /
``torch.cholesky_solve`` / ``torch.triangular_solve`` chains
(elbo_functions.py:58-78, 176-186). ``jnp.linalg.cholesky`` and
``jax.lax.linalg.triangular_solve`` map onto XLA's batched factorisations,
which tile onto the MXU for the [L, P, T, T] block stacks.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
import jax.numpy as jnp


def cholesky(a: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Lower-triangular Cholesky of a batched SPD matrix (optionally jittered)."""
    if jitter:
        n = a.shape[-1]
        a = a + jitter * jnp.eye(n, dtype=a.dtype)
    return jnp.linalg.cholesky(a)


def cho_solve(chol_l: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``A x = b`` given ``A = L L^T`` (batched, broadcasts ``b``)."""
    b = jnp.broadcast_to(b, chol_l.shape[:-2] + b.shape[-2:])
    y = jax.lax.linalg.triangular_solve(
        chol_l, b, left_side=True, lower=True, transpose_a=False
    )
    return jax.lax.linalg.triangular_solve(
        chol_l, y, left_side=True, lower=True, transpose_a=True
    )


def solve_triangular(chol_l: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``L y = b`` with ``L`` lower triangular (batched)."""
    b = jnp.broadcast_to(b, chol_l.shape[:-2] + b.shape[-2:])
    return jax.lax.linalg.triangular_solve(
        chol_l, b, left_side=True, lower=True, transpose_a=False
    )


def chol_inverse(chol_l: jax.Array) -> jax.Array:
    """Inverse of ``A`` from its Cholesky factor (batched)."""
    n = chol_l.shape[-1]
    eye = jnp.eye(n, dtype=chol_l.dtype)
    return cho_solve(chol_l, jnp.broadcast_to(eye, chol_l.shape))


def logdet_from_chol(chol_l: jax.Array, batch_dims: int = 0) -> jax.Array:
    """``log det A = 2 sum log diag L``, summed over all but ``batch_dims`` axes.

    Kept on ``jnp.diagonal`` deliberately: an eye-masked double-where form
    (which avoids the diagonal VJP's scatter-add) was A/B'd on-chip and ran
    SLOWER — it evaluates ``log`` on every matrix entry (~60× the
    transcendental work on the VPU) to save a sub-MB scatter. The big
    diagonal-scatter win lives in the [L,P,T,T] ``b_term`` of
    ops/elbo.minibatch_kld, which uses the eye-mask form.
    """
    d = jnp.diagonal(chol_l, axis1=-2, axis2=-1)
    axes = tuple(range(batch_dims, d.ndim))
    return 2.0 * jnp.sum(jnp.log(d), axis=axes)


def symmetrize(a: jax.Array) -> jax.Array:
    """0.5 (A + A^T) — the reference symmetrises W (elbo_functions.py:69, 123)."""
    return 0.5 * (a + jnp.swapaxes(a, -1, -2))


# Pallas lane-parallel batched Cholesky+inverse for the tiny SPD stacks
# (lvae_tpu/kernels_pallas/cholesky.py). Toggle for A/B tests and debugging.
use_pallas_cholesky: bool = True

# Trace-scope marker for multi-device mesh programs. XLA's SPMD partitioner
# has no sharding rule for bare Pallas custom calls, so inside this context
# every Pallas fast path without a declared partitioning rule (fused B-chain,
# kernel-matrix builder, block-pair builder, fused Adam) pins its XLA
# implementation — whose partitioning the compiled-HLO tests prove
# (tests/test_sharding.py). The batched Cholesky is the exception: it is
# self-partitioning (kernels_pallas/cholesky.py declares the batch-dims-
# passthrough rule via jax.experimental.custom_partitioning) and under this
# context swaps to that route, keeping the kernel on each device's local
# shard. The sharded trainer facades and ``sharded_gp_predict``
# (parallel/mesh.py) enter this context around every dispatch; the Pallas
# gates consult it at trace time. Trivial 1-device meshes keep the direct
# Pallas kernels (single-chip perf is unaffected). A ContextVar so a
# concurrent thread's single-device trace can't observe another trainer's
# suppression scope.
_pallas_suppress_depth = contextvars.ContextVar(
    "lvae_pallas_suppress_depth", default=0
)


@contextlib.contextmanager
def pallas_suppressed(active: bool = True):
    """Mark every op traced inside the block as part of a mesh program:
    non-partitionable Pallas paths pin their XLA implementations; the
    self-partitioning Cholesky swaps to its custom_partitioning route.

    Caveat (same numbers either way, perf only): the flag is read at trace
    time and is NOT part of ``jax.jit``'s cache key — a function first traced
    under suppression is reused XLA-only for later calls with identical
    avals+shardings. In practice mesh-placed arrays carry different shardings
    from single-device ones, so the traces don't collide; the Hensman AOT
    key covers the state explicitly (train/hensman.py _aot_key).
    """
    if not active:
        yield
        return
    token = _pallas_suppress_depth.set(_pallas_suppress_depth.get() + 1)
    try:
        yield
    finally:
        _pallas_suppress_depth.reset(token)


def pallas_suppress_active() -> bool:
    return _pallas_suppress_depth.get() > 0


def cholesky_and_inverse(a: jax.Array, jitter: float = 0.0):
    """(cholesky(A), A⁻¹) in one shot — the pair every GP bound consumes.

    Under :func:`pallas_suppressed` (a mesh-traced program),
    ``cholesky_inverse`` routes through its self-partitioning
    custom_partitioning wrapper (kernels_pallas/cholesky.py) so each device
    runs the kernel on its local batch shard; with
    ``use_partitioned_cholesky`` off it falls back to the XLA
    implementation instead."""
    if jitter:
        n = a.shape[-1]
        a = a + jitter * jnp.eye(n, dtype=a.dtype)
    if use_pallas_cholesky:
        from lvae_tpu.kernels_pallas.cholesky import cholesky_inverse

        return cholesky_inverse(a)
    l = cholesky(a)
    return l, chol_inverse(l)
