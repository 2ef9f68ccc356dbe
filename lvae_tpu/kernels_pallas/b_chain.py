"""Fused per-subject B-operator chain (Pallas TPU kernel).

One kernel computes, per (latent, subject) block, everything the GP bounds
need from the block-diagonal side of the sparse model (the reference builds
these as separate GPyTorch/torch ops, elbo_functions.py:54-74, 171-186):

    K0_blocks, K1_blocks  →  B = K1 + diag(mask·σ² + (1−mask))
                          →  chol(B), B⁻¹, log|B|, tr(B⁻¹ K0_blocks)

emitting only what downstream consumes — ``B⁻¹ [L,S,T,T]`` plus the two
scalars per (l,s) — so the K0/K1/B/chol(B) stacks never round-trip HBM and
~8 separate op executions per training step collapse into one. The layout is
batch-on-lanes ([T, T, 128] tiles over the flattened L·S axis), the same
recipe as kernels_pallas/cholesky.py; the kernel-build logic matches
kernels_pallas/kernel_matrix.py's block-pair builder.

Autodiff: custom VJP in plain jnp — d(B⁻¹) = −B⁻¹ Ḡ B⁻¹, d log|B| = B⁻¹,
d tr(B⁻¹K0) = (−B⁻¹K0B⁻¹ w.r.t. B, B⁻¹ w.r.t. K0) — then the shared
``block_param_grads`` maps the K-stack cotangents to (scale, 1/2ℓ²) params.

Default ON for the TPU backend (``ops.kernels.B_CHAIN_AUTO_DEFAULT``) by the
measured on-chip A/B — 13.79 vs 14.62 ms/epoch device on the flagship
Hensman config (benchmarks/README.md "fast-path A/B"); forced on
(interpreter) in tests/test_b_chain.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lvae_tpu.kernels_pallas.kernel_matrix import (
    block_param_grads,
    component_term,
    masked_block_stack,
)
from lvae_tpu.ops import kernels as kx

_LANE = 128
# VMEM: the fully-fused kernel holds ~5 [T, T, 128] f32 buffers (K0, K1/B,
# L, M, B⁻¹ out); T=64 ≈ 10.5 MB of the ~16 MB budget, T=90 measured 22.8 MB
# (compile-time OOM). Longer blocks (Physionet-like stays up to ~90 hourly
# timepoints) run the SPLIT path instead: the same kernel minus the trace
# side (B build → chol → B⁻¹ → log|B|; peak ~3 buffers, T=96 ≈ 14.2 MB)
# with K0 block build + tr(B⁻¹K0) left to XLA — one extra HBM pass over
# K0 (~10 MB/epoch at T=90), no second factorization. Lane-halving (64-wide
# blocks) is NOT a fix: VMEM tiles are (8,128), a 64-lane last dim pads to
# 128 and saves nothing. VERDICT r3 item 6; on-chip A/B in
# benchmarks/README.md "fast-path A/B round 8".
MAX_T_FULL_LANE = 64
# Split-path cap, MEASURED at 128 (VERDICT r4 item 6 — the r4 cap at 96
# was an unmeasured cliff): VMEM arithmetic says T=128 fits the raised
# 64 MB scoped budget (4 live [128,128,128] f32 buffers ≈ 33.6 MB vs
# T=90's measured 16.55 MB), and the on-chip A/B confirms the kernel wins
# 2.29× over the XLA chain at a T=128 long bucket (10.95 vs 25.04 ms/epoch,
# tools/ab_t90_bchain.py --t_long 128; Mosaic compile of the 3×128-unrolled
# body is ~135 s, one-time per cache). Equality+gradient proof at T=128:
# tests/test_b_chain.py::test_long_t_split_fusion_t128. T>128 still routes
# to the XLA chain — the measured cliff there is the 25.04 ms arm above,
# and the unrolled-body compile time grows with T; raise via
# LVAE_BCHAIN_TMAX only with a fresh A/B.
MAX_T = int(os.environ.get("LVAE_BCHAIN_TMAX", "128"))

# Batch-major output: emit B⁻¹ as [L·S, T, T] straight from the kernel (the
# lane→sublane transpose happens in VMEM) instead of [T, T, L·S] + an XLA
# relayout. The r3 hlo_stats trace puts the boundary copies of the
# lanes-major output at ~8.5 ms of the 329 ms flagship chunk (copy.481 +
# reshape.1024 + copy.454 — two DIFFERENT consumer layouts of the same
# symmetric stack). None → auto (B_CHAIN_BM_AUTO_DEFAULT, set by the on-chip
# A/B); True/False force. Env override LVAE_BCHAIN_BM=1/0/auto.
B_CHAIN_BM_AUTO_DEFAULT = False
use_batch_major_out = None
_bm_env = os.environ.get("LVAE_BCHAIN_BM", "").strip().lower()
if _bm_env in ("1", "true", "on"):
    use_batch_major_out = True
elif _bm_env in ("0", "false", "off"):
    use_batch_major_out = False
elif _bm_env not in ("", "auto", "none"):
    raise ValueError(
        f"LVAE_BCHAIN_BM={os.environ['LVAE_BCHAIN_BM']!r}: expected "
        "1/0/auto"
    )


def _batch_major_active() -> bool:
    if use_batch_major_out is None:
        return B_CHAIN_BM_AUTO_DEFAULT
    return use_batch_major_out


# Long-T (64 < T <= MAX_T) routing: run the split-fusion path (B-inverse
# kernel + XLA trace side), or fall back to the full XLA chain as before.
# Default set by the on-chip A/B (tools/ab_t90_bchain.py; recorded in
# benchmarks/README.md "fast-path A/B round 8"). None → auto; env
# LVAE_BCHAIN_T96=1/0/auto forces.
LONG_T_AUTO_DEFAULT = True
use_long_t_halves = None
_lt_env = os.environ.get("LVAE_BCHAIN_T96", "").strip().lower()
if _lt_env in ("1", "true", "on"):
    use_long_t_halves = True
elif _lt_env in ("0", "false", "off"):
    use_long_t_halves = False
elif _lt_env not in ("", "auto", "none"):
    raise ValueError(
        f"LVAE_BCHAIN_T96={os.environ['LVAE_BCHAIN_T96']!r}: expected 1/0/auto"
    )


def _long_t_active() -> bool:
    if use_long_t_halves is None:
        return LONG_T_AUTO_DEFAULT
    return use_long_t_halves


def _make_body(spec0, spec1: kx.KernelSpec, T: int,
               batch_major: bool = False):
    """Kernel body. With ``spec0=None`` the trace side (K0 build +
    tr(B⁻¹K0)) is omitted — the long-T split path (see ``_b_chain_pallas``)
    computes it in XLA so the kernel's peak VMEM drops from ~5 to ~3
    [T,T,128] buffers and T<=MAX_T fits the 16 MB budget."""
    with_trace = spec0 is not None

    def body(x_ref, m_ref, *refs):
        if with_trace:
            s0_ref, g0_ref, s1_ref, g1_ref, nz_ref, ib_ref, logdet_ref, tr_ref = refs
        else:
            s0_ref = g0_ref = tr_ref = None
            s1_ref, g1_ref, nz_ref, ib_ref, logdet_ref = refs
        x = x_ref[:]  # [Q, T, Bt] covariate value at time t, per batch lane
        m = m_ref[:]  # [T, Bt]
        bt = m.shape[1]
        mm = m[:, None, :] * m[None, :, :]  # [T, T, Bt]

        def accumulate(comps, s_ref, g_ref, init=None):
            acc = init if init is not None else jnp.zeros((T, T, bt), jnp.float32)
            for c, comp in enumerate(comps):
                acc = acc + component_term(
                    comp,
                    lambda col: x[col][:, None],  # value at t1: [T, 1, Bt]
                    lambda col: x[col][None, :],  # value at t2: [1, T, Bt]
                    mm,
                    s_ref[c][None, None, :],
                    g_ref[c][None, None, :],
                )
            return acc

        k0 = accumulate(spec0.components, s0_ref, g0_ref) if with_trace else None

        # B = diag(mask·σ² + (1−mask)) + K1 — unit pivots on padding
        # (ops/kernels.block_b_operator semantics). The diag term SEEDS the
        # K1 accumulator instead of adding to a finished K1 stack: a
        # separate K1 value kept a dead [T,T,128] buffer live through the
        # Cholesky loop, pushing the T=90 split kernel 560 KB over the
        # 16 MB VMEM limit (measured; benchmarks/README.md round 8).
        diagv = m * nz_ref[0][None, :] + (1.0 - m)  # [T, Bt]
        row3 = jax.lax.broadcasted_iota(jnp.int32, (T, T, 1), 0)
        col3 = jax.lax.broadcasted_iota(jnp.int32, (T, T, 1), 1)
        eye3 = (row3 == col3).astype(jnp.float32)
        b = accumulate(
            spec1.components, s1_ref, g1_ref,
            init=eye3 * diagv[:, None, :],
        )

        # --- column Cholesky, unrolled (kernels_pallas/cholesky.py recipe),
        # accumulating log|B| = Σ log pivot on the fly
        col_onehot = jax.lax.broadcasted_iota(jnp.int32, (1, T, 1), 1)
        row_onehot = jax.lax.broadcasted_iota(jnp.int32, (T, 1, 1), 0)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (T, bt), 0)

        def upd_col(mat, j, colv):
            return mat + colv[:, None, :] * (col_onehot == j).astype(mat.dtype)

        def upd_row(mat, i, rowv):
            return mat + rowv[None] * (row_onehot == i).astype(mat.dtype)

        l = jnp.zeros_like(b)
        logdet = jnp.zeros((bt,), jnp.float32)
        for j in range(T):
            if j:
                acc2 = b[:, j] - jnp.sum(l[:, :j] * l[j, :j][None], axis=1)
            else:
                acc2 = b[:, j]
            piv = acc2[j]  # [Bt]
            logdet = logdet + jnp.log(piv)
            inv_d = jax.lax.rsqrt(piv)
            colv = acc2 * inv_d[None]
            colv = jnp.where(row_iota >= j, colv, 0.0)
            l = upd_col(l, j, colv)

        # --- M = L⁻¹ by forward substitution
        mi = jnp.zeros_like(b)
        for i in range(T):
            e_i = jnp.where(row_iota == i, 1.0, 0.0).astype(b.dtype)
            if i:
                s = jnp.sum(l[i, :i][:, None] * mi[:i], axis=0)
            else:
                s = jnp.zeros_like(e_i)
            mi = upd_row(mi, i, (e_i - s) / l[i, i][None])

        # --- B⁻¹ = MᵀM row by row; fold tr(B⁻¹ K0) while rows are in hand
        tr = jnp.zeros((bt,), jnp.float32)
        for i in range(T):
            inv_row = jnp.sum(mi * mi[:, i][:, None], axis=0)  # [T, Bt]
            if batch_major:
                # emit [Bt, T, T] — the lane→sublane move happens here in
                # VMEM instead of as an XLA HBM relayout of the whole stack
                ib_ref[:, i, :] = jnp.swapaxes(inv_row, 0, 1)
            else:
                ib_ref[i, :] = inv_row
            if with_trace:
                tr = tr + jnp.sum(inv_row * k0[i], axis=0)
        logdet_ref[0] = logdet
        if with_trace:
            tr_ref[0] = tr

    return body


@functools.partial(
    jax.jit, static_argnames=("spec0", "spec1", "interpret", "batch_major")
)
def _b_chain_pallas(spec0, spec1, s0, g0, s1, g1, noise, xb, mask,
                    interpret=False, batch_major=False):
    """Constrained params + [S, T, Q] blocks → (iB [L,S,T,T], logdet [L],
    tr(B⁻¹K0) [L]), all f32."""
    s_dim, t_dim, q = xb.shape
    l = s0.shape[0]
    b = l * s_dim
    # long blocks: split path (B-inverse kernel + XLA trace side) — see the
    # MAX_T note above
    split = t_dim > MAX_T_FULL_LANE
    lane = _LANE
    pad = (-b) % lane
    bp = b + pad

    def lanes(a2):  # [..., B] → padded [..., Bp]
        if not pad:
            return a2
        widths = [(0, 0)] * (a2.ndim - 1) + [(0, pad)]
        return jnp.pad(a2, widths)

    # covariates/mask replicate over L (they don't depend on the latent dim)
    xf = jnp.swapaxes(xb.astype(jnp.float32), 0, 2)  # [Q, T, S]
    xr = lanes(jnp.broadcast_to(xf[:, :, None], (q, t_dim, l, s_dim))
               .reshape(q, t_dim, b))
    mf = jnp.swapaxes(mask.astype(jnp.float32), 0, 1)  # [T, S]
    mr = lanes(jnp.broadcast_to(mf[:, None], (t_dim, l, s_dim))
               .reshape(t_dim, b))

    def per_lane(p):  # [L, C] → [C, Bp] (scale of lane b = p[l(b), c])
        c = p.shape[1]
        return lanes(
            jnp.broadcast_to(
                jnp.swapaxes(p.astype(jnp.float32), 0, 1)[:, :, None],
                (c, l, s_dim),
            ).reshape(c, b)
        )

    nzr = lanes(jnp.broadcast_to(
        noise.astype(jnp.float32)[:, None], (l, s_dim)
    ).reshape(1, b))

    c0 = len(spec0.components)
    c1 = len(spec1.components)
    grid = (bp // lane,)
    if batch_major:
        ib_spec = pl.BlockSpec((lane, t_dim, t_dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        ib_shape = jax.ShapeDtypeStruct((bp, t_dim, t_dim), jnp.float32)
    else:
        ib_spec = pl.BlockSpec((t_dim, t_dim, lane), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)
        ib_shape = jax.ShapeDtypeStruct((t_dim, t_dim, bp), jnp.float32)

    def lanespec(rows):
        return pl.BlockSpec((rows, lane), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    common_in = [
        pl.BlockSpec((q, t_dim, lane), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        lanespec(t_dim),
    ]
    scalar_shape = jax.ShapeDtypeStruct((1, bp), jnp.float32)
    if split:
        # the compiler's DEFAULT scoped-VMEM budget is 16 MB; the split
        # kernel's measured peak at T=90 is 16.55 MB (4 live [T,T,128]
        # buffers). v5e cores have 128 MB of physical VMEM — raise the
        # scoped budget for this call instead of shrinking T
        ib_t, logdet = pl.pallas_call(
            _make_body(None, spec1, t_dim, batch_major=batch_major),
            grid=grid,
            in_specs=common_in + [lanespec(c1), lanespec(c1), lanespec(1)],
            out_specs=(ib_spec, lanespec(1)),
            out_shape=(ib_shape, scalar_shape),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(xr, mr, per_lane(s1), per_lane(g1), nzr)
        tr = None
    else:
        ib_t, logdet, tr = pl.pallas_call(
            _make_body(spec0, spec1, t_dim, batch_major=batch_major),
            grid=grid,
            in_specs=common_in + [
                lanespec(c0), lanespec(c0), lanespec(c1), lanespec(c1),
                lanespec(1),
            ],
            out_specs=(ib_spec, lanespec(1), lanespec(1)),
            out_shape=(ib_shape, scalar_shape, scalar_shape),
            interpret=interpret,
        )(xr, mr, per_lane(s0), per_lane(g0), per_lane(s1), per_lane(g1), nzr)

    if batch_major:
        # [Bp, T, T] → [L, S, T, T] is a pure reshape of the leading axis
        ib = ib_t[:b].reshape(l, s_dim, t_dim, t_dim)
    else:
        ib = jnp.transpose(ib_t[:, :, :b], (2, 0, 1)).reshape(
            l, s_dim, t_dim, t_dim
        )
    logdet_l = jnp.sum(logdet[0, :b].reshape(l, s_dim), axis=1)
    if split:
        # trace side in XLA: one K0-stack pass over HBM — same component
        # math as the kernel's accumulate (masked_block_stack is also the
        # backward's builder, so the two sides agree bit-for-bit)
        xf = xb.astype(jnp.float32)
        mf = mask.astype(jnp.float32)
        mm3 = mf[:, :, None] * mf[:, None, :]
        k0m = masked_block_stack(
            spec0, s0.astype(jnp.float32), g0.astype(jnp.float32), xf, mm3
        )
        tr_l = jnp.einsum("lstu,lstu->l", ib, k0m)
    else:
        tr_l = jnp.sum(tr[0, :b].reshape(l, s_dim), axis=1)
    return ib, logdet_l, tr_l


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


# --- self-partitioning route for mesh-traced programs ------------------------
#
# Same treatment as kernels_pallas/cholesky.py: the partitioner has no
# sharding rule for a bare Pallas custom call, but the chain is
# embarrassingly parallel over the latent dim L (kernel params / noise /
# every output) and the subject dim S (covariate blocks / mask / the B⁻¹
# stack) — EXCEPT that log|B| and tr(B⁻¹K0) sum over S, so the per-shard
# lowering finishes with a psum over the mesh axes that shard S.
# ``jax.experimental.custom_partitioning`` declares exactly that: L and S
# pass through, every other dim replicates, non-dividing placements drop to
# replicated. ``_b_chain_impl`` selects this route when a sharded facade's
# mesh guard is active (``ops.linalg.pallas_suppress_active``); single-chip
# traces keep the direct call. CPU-mesh equality + local-shard proofs:
# tests/test_partitioned_b_chain.py.

use_partitioned_b_chain: bool = True


def _entry_if_divides(sharding, dim: int, size: int):
    """The operand's spec entry for ``dim`` if its mesh-axis product divides
    ``size``, else None (replicated). Ghost-padding a local S shard would be
    harmless (fully-masked rows factor out of every output) but positional
    reassembly of the B⁻¹ stack would misplace rows — replicate instead."""
    spec = tuple(sharding.spec)
    entry = spec[dim] if dim < len(spec) else None
    if entry is None:
        return None
    names = entry if isinstance(entry, tuple) else (entry,)
    prod = 1
    for name in names:
        prod *= sharding.mesh.shape[name]
    return entry if size % prod == 0 else None


@functools.lru_cache(maxsize=None)
def _partitioned_b_chain(spec0, spec1, interpret: bool,
                         batch_major: bool = False):
    """custom_partitioning wrapper, cached per (specs, interpret).

    Shardy rule: L threads the params/noise and all three results, S threads
    the covariate blocks and the B⁻¹ stack; S is absent from log|B| and
    tr(B⁻¹K0) (a contraction — the per-shard lower_fn supplies the psum).
    The matrix/feature dims (t, q, the param counts c/d, and B⁻¹'s second
    matrix dim u) replicate."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def call(s0, g0, s1, g1, noise, xb, mask):
        return _b_chain_pallas(
            spec0, spec1, s0, g0, s1, g1, noise, xb, mask,
            interpret=interpret, batch_major=batch_major,
        )

    fn = custom_partitioning(call)

    def _names(entry):
        return set(entry if isinstance(entry, tuple) else (entry,))

    def _placements(arg_shapes):
        l_entry = _entry_if_divides(
            arg_shapes[0].sharding, 0, arg_shapes[0].shape[0]
        )
        s_entry = _entry_if_divides(
            arg_shapes[5].sharding, 0, arg_shapes[5].shape[0]
        )
        # L comes from the params' sharding, S from the covariates' — if one
        # mesh axis shards both, P(axis, axis, ...) on the B⁻¹ result would
        # be invalid; keep L (the bigger win: it threads every output) and
        # replicate S
        if l_entry is not None and s_entry is not None and (
            _names(l_entry) & _names(s_entry)
        ):
            s_entry = None
        return l_entry, s_entry

    def _result_shardings(mesh, l_entry, s_entry):
        return (
            NamedSharding(mesh, PartitionSpec(l_entry, s_entry, None, None)),
            NamedSharding(mesh, PartitionSpec(l_entry)),
            NamedSharding(mesh, PartitionSpec(l_entry)),
        )

    def infer_sharding_from_operands(mesh, arg_shapes, shape):
        return _result_shardings(mesh, *_placements(arg_shapes))

    def partition(mesh, arg_shapes, result_shape):
        l_entry, s_entry = _placements(arg_shapes)
        lp = NamedSharding(mesh, PartitionSpec(l_entry, None))
        arg_sh = (
            lp, lp, lp, lp,
            NamedSharding(mesh, PartitionSpec(l_entry)),
            NamedSharding(mesh, PartitionSpec(s_entry, None, None)),
            NamedSharding(mesh, PartitionSpec(s_entry, None)),
        )

        def lower_fn(s0, g0, s1, g1, noise, xb, mask):
            ib, logdet, tr = call(s0, g0, s1, g1, noise, xb, mask)
            if s_entry is not None:
                names = s_entry if isinstance(s_entry, tuple) else (s_entry,)
                logdet = jax.lax.psum(logdet, names)
                tr = jax.lax.psum(tr, names)
            return ib, logdet, tr

        return mesh, lower_fn, _result_shardings(mesh, l_entry, s_entry), arg_sh

    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule="l c, l c, l d, l d, l, s t q, s t -> l s t u, l, l",
        need_replication_factors=("c", "d", "t", "q", "u"),
    )
    return fn


def _b_chain_impl(spec0, spec1, s0, g0, s1, g1, noise, xb, mask):
    from lvae_tpu.ops import linalg as la

    if la.pallas_suppress_active() and use_partitioned_b_chain:
        # mesh-traced program: route through the declared partitioning rule
        return _partitioned_b_chain(
            spec0, spec1, _auto_interpret(), _batch_major_active()
        )(s0, g0, s1, g1, noise, xb, mask)
    return _b_chain_pallas(
        spec0, spec1, s0, g0, s1, g1, noise, xb, mask,
        interpret=_auto_interpret(), batch_major=_batch_major_active(),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_b_chain(spec0, spec1, s0, g0, s1, g1, noise, xb, mask):
    """(B⁻¹ [L,S,T,T], log|B| [L], tr(B⁻¹K0) [L]) from CONSTRAINED params.

    Differentiable in (s0, g0, s1, g1, noise); covariates/mask are data
    (inducing points and covariates are frozen in every reference regime,
    LVAE.py:199-208)."""
    return _b_chain_impl(spec0, spec1, s0, g0, s1, g1, noise, xb, mask)


def _b_chain_fwd(spec0, spec1, s0, g0, s1, g1, noise, xb, mask):
    out = _b_chain_impl(spec0, spec1, s0, g0, s1, g1, noise, xb, mask)
    ib, _, _ = out
    return out, (s0, g0, s1, g1, noise, xb, mask, ib)


def _b_chain_bwd(spec0, spec1, res, cots):
    # custom_vjp backwards trace outside the caller's _full_precision
    # context — re-enter it (the GP-algebra invariant, CLAUDE.md numerics)
    with jax.default_matmul_precision("highest"):
        return _b_chain_bwd_impl(spec0, spec1, res, cots)


def _b_chain_bwd_impl(spec0, spec1, res, cots):
    s0, g0, s1, g1, noise, xb, mask, ib = res
    d_ib, d_logdet, d_tr = cots
    xf = xb.astype(jnp.float32)
    mf = mask.astype(jnp.float32)
    mm3 = mf[:, :, None] * mf[:, None, :]  # [S, T, T]

    zero = jnp.zeros((), jnp.float32)
    if d_ib is None:
        d_ib = zero
    d_ib = jnp.broadcast_to(d_ib, ib.shape).astype(jnp.float32)
    l_dim = ib.shape[0]
    if d_logdet is None:
        d_logdet = jnp.zeros((l_dim,), jnp.float32)
    if d_tr is None:
        d_tr = jnp.zeros((l_dim,), jnp.float32)
    d_logdet = d_logdet.astype(jnp.float32)[:, None, None, None]
    d_tr = d_tr.astype(jnp.float32)[:, None, None, None]

    k0m = masked_block_stack(spec0, s0.astype(jnp.float32),
                             g0.astype(jnp.float32), xf, mm3)

    # dB: through B⁻¹ (−B⁻¹ Ḡ B⁻¹), log|B| (B⁻¹), tr(B⁻¹K0) (−B⁻¹K0B⁻¹).
    # The two sandwich chains share the B⁻¹·(·)·B⁻¹ form with scalar-per-l
    # weights, so they are factored into ONE sandwich over the elementwise
    # combination X = Ḡ + d_tr·K0: two batched matmuls instead of four (the
    # add fuses into the matmul producer). At the flagship T=20 these
    # 20-fill tiny-T batched dots are the P=1000 device budget's #1 class
    # (tools/device_budget.py, gp_xla 28.9 %); halving their MXU passes is
    # value-equal within f32 roundoff (sums reassociated: (B⁻¹X)B⁻¹ →
    # B⁻¹(XB⁻¹)). A rows/cols-concat variant was measured WORSE (the concat
    # copies cost more than the saved passes — see benchmarks/README.md).
    db = d_logdet * ib - ib @ ((d_ib + d_tr * k0m) @ ib)
    cot_k0 = d_tr * ib  # d tr(B⁻¹K0)/dK0 = B⁻¹
    cot_k1 = db  # B = K1_masked + diag(...)

    d_s0, d_g0 = block_param_grads(spec0, s0, g0, cot_k0, xf, mm3)
    d_s1, d_g1 = block_param_grads(spec1, s1, g1, cot_k1, xf, mm3)
    # diag term: dσ²[l] = Σ_{s,t} dB[l,s,t,t]·mask[s,t]
    d_noise = jnp.einsum(
        "lstt,st->l", db, mf
    ).astype(noise.dtype)
    return (
        d_s0, d_g0, d_s1, d_g1, d_noise,
        jnp.zeros_like(xb), jnp.zeros_like(mask),
    )


fused_b_chain.defvjp(_b_chain_fwd, _b_chain_bwd)


def b_chain_operators(spec0, spec1, kp0, kp1, noise, xb, mask):
    """Drop-in producing (iB, logdet_B [L], tr(B⁻¹K0) [L]) in xb's dtype from
    RAW kernel params — the fused replacement for block builds + B assembly +
    cholesky_and_inverse + logdet + the Nyström block trace, i.e. the
    reference's per-batch ``covar_module1(x_st) + noise`` → ``torch.cholesky``
    → ``torch.cholesky_solve`` → logdet → trace chain
    (elbo_functions.py:54-74 and 171-186)."""
    def cg(kp):
        scale = kx.constrain(kp.raw_scale)
        ls = kx.constrain(kp.raw_lengthscale)
        return scale, 0.5 / (ls * ls)

    s0, g0 = cg(kp0)
    s1, g1 = cg(kp1)
    ib, logdet_l, tr_l = fused_b_chain(
        spec0, spec1, s0, g0, s1, g1, noise, xb, mask
    )
    dtype = xb.dtype
    return ib.astype(dtype), logdet_l.astype(dtype), tr_l.astype(dtype)


def usable(spec0, spec1, kp0, xb, dtype) -> bool:
    """Shape/dtype gate (VMEM + layout constraints of the kernel); falls
    back to the XLA chain in ops/elbo.gp_block_operators otherwise (same
    math either way — elbo_functions.py:54-74)."""
    cap = MAX_T if _long_t_active() else MAX_T_FULL_LANE
    return (
        dtype == jnp.float32
        and kp0.raw_scale.ndim == 2
        and len(spec0.components) > 0
        and len(spec1.components) > 0
        and 2 <= xb.shape[1] <= cap
    )
