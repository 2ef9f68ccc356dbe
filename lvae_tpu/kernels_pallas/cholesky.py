"""Lane-parallel batched small-matrix Cholesky + inverse (Pallas TPU kernel).

The L-VAE GP bounds factorise stacks of tiny SPD matrices every step:
``B [L, P, T, T]`` (T ≈ 20) and ``H/K0zz/W [L, M, M]`` (M ≈ 60)
(elbo_functions.py:58-78, 176-186 in the reference). XLA's TPU Cholesky is a
blocked algorithm built for large matrices; on a stack of 640 20×20 matrices
it takes ~2 ms on a v5e — the single hottest op in the training step
(profiled: the whole VAE fwd+bwd is 0.9 ms).

This kernel flips the layout: the BATCH lives on the 128-wide lane axis and
the factorisation loop is fully unrolled over the (tiny, static) matrix
dimension. Every step is a dense [n, B_tile] VPU op — no per-matrix control
flow, no masking, no MXU. One pass emits both the Cholesky factor (for
log-dets) and the full inverse (for everything else), which the GP bounds
always need together.

Autodiff: a custom VJP built from the returned factor/inverse —
``L⁻¹ = Lᵀ A⁻¹`` makes the standard Cholesky pullback (Murray 2016,
arXiv:1602.07527) a couple of batched matmuls.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lvae_tpu.ops import linalg as la

_LANE = 128


def _chol_inv_kernel(a_ref, l_ref, inv_ref):
    """One grid step: factor + invert a [n, n, Bt] stack (batch on lanes)."""
    a = a_ref[:]  # [n, n, Bt]
    n, _, bt = a.shape

    # Mosaic lowers neither scatter nor dynamic_update_slice: in-place row /
    # column writes become one-hot masked accumulations (pure VPU ops).
    col_onehot = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    row_onehot = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)

    def upd_col(mat, j, col):
        return mat + col[:, None, :] * (col_onehot == j).astype(mat.dtype)

    def upd_row(mat, i, row):
        return mat + row[None] * (row_onehot == i).astype(mat.dtype)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n, bt), 0)

    # --- Cholesky (column Cholesky, unrolled; all ops are [n, Bt] or smaller)
    l = jnp.zeros_like(a)
    for j in range(n):
        if j:
            prefix = l[:, :j]  # [n, j, Bt] columns built so far
            lrow = l[j, :j]  # [j, Bt]
            acc = a[:, j] - jnp.sum(prefix * lrow[None], axis=1)
        else:
            acc = a[:, j]
        inv_d = jax.lax.rsqrt(acc[j])  # [Bt]
        col = acc * inv_d[None]  # [n, Bt]
        col = jnp.where(row_iota >= j, col, 0.0)  # zero strictly-upper part
        l = upd_col(l, j, col)
    l_ref[:] = l

    # --- M = L⁻¹ by forward substitution over rows (unrolled)
    m = jnp.zeros_like(a)
    for i in range(n):
        e_i = jnp.where(row_iota == i, 1.0, 0.0).astype(a.dtype)  # [n, Bt]
        if i:
            s = jnp.sum(l[i, :i][:, None] * m[:i], axis=0)  # [n, Bt]
        else:
            s = jnp.zeros_like(e_i)
        m = upd_row(m, i, (e_i - s) / l[i, i][None])

    # --- A⁻¹ = Mᵀ M, row by row to bound VMEM
    for i in range(n):
        inv_ref[i, :] = jnp.sum(m * m[:, i][:, None], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_inv_pallas(a2: jax.Array, interpret: bool = False):
    """a2: [B, n, n] (B a multiple of the lane tile) → (L, inv) same shape."""
    b, n, _ = a2.shape
    bt = _LANE
    a_t = jnp.transpose(a2, (1, 2, 0))  # [n, n, B] batch-on-lanes
    grid = (b // bt,)
    spec = pl.BlockSpec((n, n, bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    l_t, inv_t = pl.pallas_call(
        _chol_inv_kernel,
        grid=grid,
        in_specs=[spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, n, b), a2.dtype),
            jax.ShapeDtypeStruct((n, n, b), a2.dtype),
        ),
        interpret=interpret,
    )(a_t)
    return jnp.transpose(l_t, (2, 0, 1)), jnp.transpose(inv_t, (2, 0, 1))


def _use_pallas(a: jax.Array, max_n: int = 64) -> bool:
    # VMEM budget: the kernel holds ~5 [n, n, 128] f32 buffers (input, L, M
    # and the two outputs); n = 64 ≈ 10.5 MB of the ~16 MB VMEM. Larger
    # blocks fall back to XLA.
    if a.dtype != jnp.float32:
        return False
    if a.shape[-1] > max_n or a.shape[-1] < 2:
        return False
    if la.pallas_suppress_active() and not use_partitioned_cholesky:
        # mesh-traced program with the self-partitioning route disabled:
        # neither Shardy nor GSPMD can shard a bare Pallas custom call
        return False
    return jax.default_backend() == "tpu"


def _chol_inv_reference(a: jax.Array):
    l = jnp.linalg.cholesky(a)
    return l, la.chol_inverse(l)


def _chol_inv_direct(a: jax.Array, interpret: bool = False):
    """Flatten batch dims, pad to the lane tile, launch the kernel, unpad."""
    batch_shape = a.shape[:-2]
    n = a.shape[-1]
    b = 1
    for s in batch_shape:
        b *= s
    a2 = a.reshape(b, n, n)
    pad = (-b) % _LANE
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), (pad, n, n))
        a2 = jnp.concatenate([a2, eye], axis=0)
    l2, inv2 = _chol_inv_pallas(a2, interpret=interpret)
    if pad:
        l2, inv2 = l2[:b], inv2[:b]
    return l2.reshape(a.shape), inv2.reshape(a.shape)


# --- self-partitioning route for mesh-traced programs ------------------------
#
# Neither Shardy nor GSPMD has a sharding rule for a bare Pallas custom call,
# so a program traced for a multi-device mesh cannot contain the direct
# ``pallas_call`` above. But the op is embarrassingly parallel over its batch
# dims: ``jax.experimental.custom_partitioning`` lets us DECLARE that rule —
# batch dims pass through, the two matrix dims must be replicated — and hand
# the partitioner a per-shard lowering that launches the SAME kernel on each
# device's local ``[L/l, S/d, n, n]`` block. ``_chol_inv_impl`` selects this
# route exactly when a sharded facade's mesh guard is active
# (``ops.linalg.pallas_suppressed`` — the trace-scope marker for multi-device
# programs); single-chip traces keep the direct call, byte-identical to the
# pre-partitioned program. CPU-mesh equality + local-shard-shape proofs:
# tests/test_partitioned_cholesky.py.

use_partitioned_cholesky: bool = True
_partition_interpret: bool = False  # test hook: interpret-mode kernel per shard


def _replicate_tail_sharding(sharding, global_shape):
    """Operand/result sharding with matrix dims replicated and any batch dim
    whose global size does not divide its mesh-axis product dropped to
    replicated (a padded local shard would not be SPD — Cholesky of the pad
    garbage must never be reassembled positionally)."""
    from jax.sharding import NamedSharding, PartitionSpec

    ndim = len(global_shape)
    spec = tuple(sharding.spec) + (None,) * (ndim - len(sharding.spec))
    out = []
    for d, entry in enumerate(spec[:-2]):
        if entry is None:
            out.append(None)
            continue
        names = entry if isinstance(entry, tuple) else (entry,)
        prod = 1
        for name in names:
            prod *= sharding.mesh.shape[name]
        out.append(entry if global_shape[d] % prod == 0 else None)
    return NamedSharding(sharding.mesh, PartitionSpec(*out, None, None))


@functools.lru_cache(maxsize=None)
def _partitioned_chol_inv(ndim: int, interpret: bool):
    """custom_partitioning wrapper for rank-``ndim`` SPD stacks.

    The Shardy rule (einsum-like) marks every batch dim as a passthrough
    factor and the matrix dims as need-replication; the GSPMD fallbacks
    (infer/partition) derive the same placement from the operand sharding.
    The per-shard lower_fn is the direct kernel launch — lane padding inside
    ``_chol_inv_direct`` handles whatever local batch the mesh leaves."""
    from jax.experimental.custom_partitioning import custom_partitioning

    fn = custom_partitioning(lambda a: _chol_inv_direct(a, interpret))
    factors = tuple(f"b{i}" for i in range(ndim - 2)) + ("i", "j")
    mapping = " ".join(factors)
    rule = f"{mapping} -> {mapping}, {mapping}"

    def infer_sharding_from_operands(mesh, arg_shapes, shape):
        s = _replicate_tail_sharding(arg_shapes[0].sharding, arg_shapes[0].shape)
        return (s, s)

    def partition(mesh, arg_shapes, result_shape):
        s = _replicate_tail_sharding(arg_shapes[0].sharding, arg_shapes[0].shape)
        return mesh, (lambda a: _chol_inv_direct(a, interpret)), (s, s), (s,)

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=rule,
        need_replication_factors=("i", "j"),
    )
    return fn


@jax.custom_vjp
def cholesky_inverse(a: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(cholesky(a), a⁻¹) for a batched SPD stack ``[..., n, n]``.

    Uses the lane-parallel Pallas kernel on TPU for small n (the L-VAE block
    sizes), XLA elsewhere. Differentiable; both outputs share one VJP.
    """
    return _chol_inv_impl(a)


def _chol_inv_impl(a: jax.Array):
    if not _use_pallas(a):
        return _chol_inv_reference(a)
    if la.pallas_suppress_active():
        # mesh-traced program: route through the declared partitioning rule
        return _partitioned_chol_inv(a.ndim, _partition_interpret)(a)
    return _chol_inv_direct(a)


def _chol_inv_fwd(a):
    l, inv = _chol_inv_impl(a)
    return (l, inv), (l, inv)


def _phi(x):
    """tril with halved diagonal (the Cholesky pullback projector)."""
    return jnp.tril(x) - 0.5 * jnp.tril(jnp.triu(x))


def _chol_inv_bwd(res, cots):
    # custom_vjp backwards are traced AFTER the caller's
    # default_matmul_precision("highest") context (ops/elbo._full_precision)
    # has exited — the forward runs inside it, the bwd trace does not — so
    # the precision must be re-entered HERE or these matmuls silently run
    # at the TPU bf16 default, violating the GP-algebra invariant
    # (CLAUDE.md numerics; symptom class: NaN H after an NG step).
    with jax.default_matmul_precision("highest"):
        l, inv = res
        dl, dinv = cots
        lt = jnp.swapaxes(l, -1, -2)
        l_inv = lt @ inv  # L⁻¹ = Lᵀ A⁻¹  (A symmetric)
        l_inv_t = jnp.swapaxes(l_inv, -1, -2)
        da = jnp.zeros_like(l)
        if dinv is not None:
            # d(A⁻¹): Ā = −A⁻ᵀ Īnv A⁻ᵀ
            da = da - inv @ dinv @ inv
        if dl is not None:
            # Murray 2016: Ā = ½ L⁻ᵀ (Φ(Lᵀ L̄) + Φ(Lᵀ L̄)ᵀ) L⁻¹
            m = _phi(lt @ dl)
            da = da + 0.5 * (l_inv_t @ (m + jnp.swapaxes(m, -1, -2)) @ l_inv)
        return (da,)


cholesky_inverse.defvjp(_chol_inv_fwd, _chol_inv_bwd)


def cholesky_inverse_interpret(a: jax.Array):
    """Interpreter-mode entry for CPU tests of the kernel body."""
    return _chol_inv_direct(a.astype(jnp.float32), interpret=True)
