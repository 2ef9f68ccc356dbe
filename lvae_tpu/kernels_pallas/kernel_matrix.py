"""Fused additive-kernel-matrix construction (Pallas TPU kernel).

Builds the full ``K[L, N1, N2]`` stack of the additive multi-output kernel in
one tiled pass: per output tile, every component's discrete factors (equality
/ both-one / centred-categorical) and RBF term are computed in registers and
accumulated — no per-component ``[L, N1, N2]`` intermediates ever hit HBM,
and the covariate columns are read once per tile. This is the "kernel-matrix
construction as a Pallas kernel" deliverable (BASELINE.json north star); the
XLA path (ops/kernels.kernel_matrix) materialises one accumulator pass per
component.

Layout: ``x2`` is passed pre-transposed ``[Q, N2]`` so each column comparison
is a natural (sublane-column) × (lane-row) broadcast — no in-kernel
transposes. Grid tiles (latent, N1, N2).

Autodiff: custom VJP with analytic gradients for the (constrained) scale and
inverse-2ℓ² parameters, computed with plain jnp in the backward (the
covariates are frozen data in every training regime — LVAE.py:199-208 keeps
inducing points non-trainable — so their cotangents are zero by contract).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lvae_tpu.ops import kernels as kx

TILE_N1 = 128
TILE_N2 = 256


def component_term(comp, get1, get2, mm, sc, g):
    """One additive component's term, layout-agnostic (kernel_spec.py:9-69
    factor semantics: equality / both-one / centred-categorical / RBF).

    ``get1(col)``/``get2(col)`` return the col-th covariate broadcast to the
    row/column position of the output tile; ``mm`` is the (mask ⊗ mask)
    product in that same layout; ``sc``/``g`` the per-tile constrained scale
    and 1/(2ℓ²). Single source for every Pallas kernel body that evaluates
    components (the tiled matrix builder, the block-pair builder, and the
    fused B-chain) — the jnp path is ops/kernels._component_base."""
    d = mm
    for col in comp.eq_cols:
        d = d * (get1(col) == get2(col)).astype(jnp.float32)
    for col in comp.and_cols:
        d = d * ((get1(col) + get2(col)) == 2.0).astype(jnp.float32)
    if comp.cat_mod[0] >= 0:
        col, num = comp.cat_mod
        eq = get1(col) == get2(col)
        d = d * jnp.where(eq, 1.0, -1.0 / (num - 1)).astype(jnp.float32)
    if comp.rbf_col >= 0:
        diff = get1(comp.rbf_col) - get2(comp.rbf_col)
        return sc * jnp.exp(-(diff * diff) * g) * d
    return sc * d


def _make_kernel_body(spec: kx.KernelSpec):
    comps = spec.components

    def body(x1_ref, x2t_ref, scale_ref, g_ref, out_ref):
        li = pl.program_id(0)
        x1 = x1_ref[:]  # [TN1, Q]
        x2t = x2t_ref[:]  # [Q, TN2]
        tn1 = x1.shape[0]
        tn2 = x2t.shape[1]
        acc = jnp.zeros((tn1, tn2), jnp.float32)
        for c, comp in enumerate(comps):
            acc = acc + component_term(
                comp,
                lambda col: x1[:, col][:, None],
                lambda col: x2t[col][None, :],
                jnp.float32(1.0),
                scale_ref[li, c],
                g_ref[li, c],
            )
        out_ref[0] = acc

    return body


def _pad_to(x, mult, axis):
    pad = (-x.shape[axis]) % mult
    if not pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def _kernel_matrix_pallas(spec, scale, g, x1, x2, interpret=False):
    """scale/g: [L, C] constrained; x1 [N1, Q]; x2 [N2, Q] → K [L, N1, N2]."""
    l, c = scale.shape
    n1, q = x1.shape
    n2 = x2.shape[0]
    x1p = _pad_to(x1.astype(jnp.float32), TILE_N1, 0)
    x2t = _pad_to(jnp.swapaxes(x2.astype(jnp.float32), 0, 1), TILE_N2, 1)
    n1p, n2p = x1p.shape[0], x2t.shape[1]

    grid = (l, n1p // TILE_N1, n2p // TILE_N2)
    out = pl.pallas_call(
        _make_kernel_body(spec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N1, q), lambda li, i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, TILE_N2), lambda li, i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_N1, TILE_N2), lambda li, i, j: (li, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((l, n1p, n2p), jnp.float32),
        interpret=interpret,
    )(x1p, x2t, scale.astype(jnp.float32), g.astype(jnp.float32))
    return out[:, :n1, :n2]


def _component_bases(spec, x1, x2):
    """disc_c [C?, N1, N2] and sqdist_c — jnp, used by the backward pass."""
    bases = []
    for comp in spec.components:
        disc, sqd = kx._component_base(comp, x1, x2)
        bases.append((disc, sqd))
    return bases


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_kernel_matrix(
    spec: kx.KernelSpec, scale: jax.Array, g: jax.Array,
    x1: jax.Array, x2: jax.Array,
) -> jax.Array:
    """``K[L, N1, N2]`` from CONSTRAINED params (scale, g=1/(2ℓ²)).

    Differentiable in (scale, g); x1/x2 are data (zero cotangent by contract).
    """
    return _kernel_matrix_pallas(spec, scale, g, x1, x2)


def _fused_fwd(spec, scale, g, x1, x2):
    return _kernel_matrix_pallas(spec, scale, g, x1, x2), (scale, g, x1, x2)


def _fused_bwd(spec, res, cot):
    # traced after the caller's _full_precision context exits (custom_vjp
    # bwds trace during the backward sweep) — re-enter it so the einsum
    # contractions keep the GP-algebra precision invariant (CLAUDE.md)
    with jax.default_matmul_precision("highest"):
        return _fused_bwd_impl(spec, res, cot)


def _fused_bwd_impl(spec, res, cot):
    scale, g, x1, x2 = res
    x1f = x1.astype(jnp.float32)
    x2f = x2.astype(jnp.float32)
    d_scale = []
    d_g = []
    for c, (disc, sqd) in enumerate(_component_bases(spec, x1f, x2f)):
        base = disc if disc is not None else jnp.ones(
            (x1.shape[0], x2.shape[0]), jnp.float32
        )
        if sqd is not None:
            e = jnp.exp(-sqd[None] * g[:, c, None, None])  # [L, N1, N2]
            ke = base[None] * e
            d_scale.append(jnp.einsum("lnm,lnm->l", cot, ke))
            d_g.append(
                -jnp.einsum("lnm,lnm->l", cot, ke * sqd[None]) * scale[:, c]
            )
        else:
            d_scale.append(jnp.einsum("lnm,nm->l", cot, base))
            d_g.append(jnp.zeros(scale.shape[0], scale.dtype))
    return (
        jnp.stack(d_scale, axis=1).astype(scale.dtype),
        jnp.stack(d_g, axis=1).astype(g.dtype),
        jnp.zeros_like(x1),
        jnp.zeros_like(x2),
    )


fused_kernel_matrix.defvjp(_fused_fwd, _fused_bwd)


def kernel_matrix_pallas(
    spec: kx.KernelSpec,
    params: kx.KernelParams,
    x1: jax.Array,
    x2: jax.Array,
    mask1=None,
    mask2=None,
) -> jax.Array:
    """Drop-in for ops.kernels.kernel_matrix on TPU/f32 with [L] batching."""
    scale = kx.constrain(params.raw_scale)
    ls = kx.constrain(params.raw_lengthscale)
    g = 0.5 / (ls * ls)
    out = fused_kernel_matrix(spec, scale, g, x1, x2)
    dtype = x1.dtype
    out = out.astype(dtype)
    if mask1 is not None:
        out = out * mask1.astype(dtype)[:, None]
    if mask2 is not None:
        out = out * mask2.astype(dtype)[None, :]
    return out


# ---------------------------------------------------------------------------
# Lane-packed block-pair builder for the TRAINING hot shapes.
#
# The training step evaluates kernel0 and kernel1 on per-subject time blocks:
# [L, S, T, T] with T ≈ 20 — a layout whose trailing T-dim occupies 20 of 128
# lanes (~16% VPU occupancy, the dominant cost of the kernel build at the
# sample config). Here both stacks are computed in ONE Pallas pass at layout
# [L, S, T·T]: the fused (t1, t2) pair axis fills the lanes (T² = 400), the
# subject axis sits on sublanes, and both specs share the covariate loads.
# The only consumer-facing cost is the final lanes-T² → lanes-T reshape,
# which is included in every A/B measurement (benchmarks/README.md).
# ---------------------------------------------------------------------------


def _make_block_pair_body(spec0: kx.KernelSpec, spec1: kx.KernelSpec,
                          L: int, S: int, TT: int):
    def accumulate(comps, r1_ref, r2_ref, mm, s_ref, g_ref):
        acc = jnp.zeros((L, S, TT), jnp.float32)
        for c, comp in enumerate(comps):
            # mm [S, TT] broadcasts against the [L, 1, 1] params to [L, S, TT]
            acc = acc + component_term(
                comp,
                lambda col: r1_ref[col],
                lambda col: r2_ref[col],
                mm,
                s_ref[c][:, :, None],
                g_ref[c][:, :, None],
            )
        return acc

    def body(r1_ref, r2_ref, mm_ref, s0_ref, g0_ref, s1_ref, g1_ref,
             out0_ref, out1_ref):
        mm = mm_ref[:]  # [S, TT]
        out0_ref[:] = accumulate(spec0.components, r1_ref, r2_ref, mm, s0_ref, g0_ref)
        out1_ref[:] = accumulate(spec1.components, r1_ref, r2_ref, mm, s1_ref, g1_ref)

    return body


@functools.partial(jax.jit, static_argnames=("spec0", "spec1", "interpret"))
def _block_pair_pallas(spec0, spec1, s0, g0, s1, g1, xb, mask, interpret=False):
    """xb [S, T, Q], mask [S, T] → (K0_st, K1_st) each [L, S, T, T] f32."""
    s_dim, t_dim, q = xb.shape
    tt = t_dim * t_dim
    l = s0.shape[0]
    xt = jnp.swapaxes(xb.astype(jnp.float32), 0, 1)  # [T, S, Q]
    r1 = (
        jnp.broadcast_to(xt[:, None], (t_dim, t_dim, s_dim, q))
        .reshape(tt, s_dim, q).transpose(2, 1, 0)
    )  # [Q, S, TT] — covariate value at t1
    r2 = (
        jnp.broadcast_to(xt[None, :], (t_dim, t_dim, s_dim, q))
        .reshape(tt, s_dim, q).transpose(2, 1, 0)
    )  # value at t2
    mf = mask.astype(jnp.float32)
    mm = (mf[:, :, None] * mf[:, None, :]).reshape(s_dim, tt)

    def arrange(p):  # [L, C] → [C, L, 1] (VMEM-friendly per-component reads)
        return jnp.swapaxes(p.astype(jnp.float32), 0, 1)[:, :, None]

    out0, out1 = pl.pallas_call(
        _make_block_pair_body(spec0, spec1, l, s_dim, tt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((l, s_dim, tt), jnp.float32),
            jax.ShapeDtypeStruct((l, s_dim, tt), jnp.float32),
        ),
        interpret=interpret,
    )(r1, r2, mm, arrange(s0), arrange(g0), arrange(s1), arrange(g1))
    return (
        out0.reshape(l, s_dim, t_dim, t_dim),
        out1.reshape(l, s_dim, t_dim, t_dim),
    )


def _auto_interpret() -> bool:
    # compiled Mosaic on TPU; interpreter elsewhere (CPU tests)
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_block_pair(spec0, spec1, s0, g0, s1, g1, xb, mask):
    """(K0_st, K1_st) [L,S,T,T] from CONSTRAINED (scale, g=1/(2ℓ²)) params.

    Differentiable in the four parameter arrays; covariates/mask are data.
    """
    return _block_pair_pallas(
        spec0, spec1, s0, g0, s1, g1, xb, mask, interpret=_auto_interpret()
    )


def _block_pair_fwd(spec0, spec1, s0, g0, s1, g1, xb, mask):
    out = _block_pair_pallas(
        spec0, spec1, s0, g0, s1, g1, xb, mask, interpret=_auto_interpret()
    )
    return out, (s0, g0, s1, g1, xb, mask)


def _block_pair_bwd(spec0, spec1, res, cots):
    # same precision re-entry as _fused_bwd (traced outside _full_precision)
    with jax.default_matmul_precision("highest"):
        return _block_pair_bwd_impl(spec0, spec1, res, cots)


def block_param_grads(spec, scale, g, cot, xf, mm3):
    """(d scale, d g) of ``Σ cot ⊙ K_blocks(scale, g)`` for one spec —
    the analytic ScaleKernel/RbfKernel parameter gradients GPyTorch autodiffs
    in the reference (kernel_gen.py:199-310 batched kernels).

    ``cot [L, S, T, T]`` f32, ``xf [S, T, Q]`` f32, ``mm3 [S, T, T]`` the
    mask outer product. Shared by the block-pair and B-chain custom VJPs."""
    ds, dg = [], []
    for c, comp in enumerate(spec.components):
        disc, sqd = jax.vmap(lambda x: kx._component_base(comp, x, x))(xf)
        base = disc if disc is not None else jnp.ones_like(mm3)
        base = base * mm3
        if sqd is not None:
            e = jnp.exp(-sqd[None] * g[:, c, None, None, None])
            ke = base[None] * e
            ds.append(jnp.einsum("lstu,lstu->l", cot, ke))
            dg.append(
                -jnp.einsum("lstu,lstu->l", cot, ke * sqd[None]) * scale[:, c]
            )
        else:
            ds.append(jnp.einsum("lstu,stu->l", cot, base))
            dg.append(jnp.zeros(scale.shape[0], scale.dtype))
    return (
        jnp.stack(ds, axis=1).astype(scale.dtype),
        jnp.stack(dg, axis=1).astype(g.dtype),
    )


def masked_block_stack(spec, scale, g, xf, mm3):
    """``K_blocks [L, S, T, T]`` f32 from CONSTRAINED (scale, g) — the plain
    jnp evaluation the custom VJPs rebuild intermediates with (the masked
    per-subject ``covar_module(x_st)`` blocks of elbo_functions.py:60-62)."""
    s_dim, t_dim, _ = xf.shape
    l = scale.shape[0]
    acc = jnp.zeros((l, s_dim, t_dim, t_dim), jnp.float32)
    for c, comp in enumerate(spec.components):
        disc, sqd = jax.vmap(lambda x: kx._component_base(comp, x, x))(xf)
        base = disc if disc is not None else jnp.ones_like(mm3)
        base = base * mm3
        if sqd is not None:
            term = scale[:, c, None, None, None] * base[None] * jnp.exp(
                -sqd[None] * g[:, c, None, None, None]
            )
        else:
            term = scale[:, c, None, None, None] * base[None]
        acc = acc + term
    return acc


def _block_pair_bwd_impl(spec0, spec1, res, cots):
    s0, g0, s1, g1, xb, mask = res
    cot0, cot1 = cots
    xf = xb.astype(jnp.float32)
    mf = mask.astype(jnp.float32)
    mm3 = mf[:, :, None] * mf[:, None, :]  # [S, T, T]

    d_s0, d_g0 = block_param_grads(spec0, s0, g0, cot0.astype(jnp.float32), xf, mm3)
    d_s1, d_g1 = block_param_grads(spec1, s1, g1, cot1.astype(jnp.float32), xf, mm3)
    return d_s0, d_g0, d_s1, d_g1, jnp.zeros_like(xb), jnp.zeros_like(mask)


fused_block_pair.defvjp(_block_pair_fwd, _block_pair_bwd)


def block_kernel_pair_pallas(spec0, spec1, kp0, kp1, xb, mask):
    """Drop-in for the (block_kernel_matrix(spec0), block_kernel_matrix(spec1))
    pair in the training step; returns arrays in ``xb``'s dtype."""
    def cg(kp):
        scale = kx.constrain(kp.raw_scale)
        ls = kx.constrain(kp.raw_lengthscale)
        return scale, 0.5 / (ls * ls)

    s0, g0 = cg(kp0)
    s1, g1 = cg(kp1)
    k0, k1 = fused_block_pair(spec0, spec1, s0, g0, s1, g1, xb, mask)
    return k0.astype(xb.dtype), k1.astype(xb.dtype)
