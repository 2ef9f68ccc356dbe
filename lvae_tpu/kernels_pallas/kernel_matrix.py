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
            term = jnp.full((tn1, tn2), scale_ref[li, c], jnp.float32)
            if comp.rbf_col >= 0:
                diff = x1[:, comp.rbf_col][:, None] - x2t[comp.rbf_col][None, :]
                term = term * jnp.exp(-(diff * diff) * g_ref[li, c])
            for col in comp.eq_cols:
                eq = x1[:, col][:, None] == x2t[col][None, :]
                term = term * eq.astype(jnp.float32)
            for col in comp.and_cols:
                both = (x1[:, col][:, None] + x2t[col][None, :]) == 2.0
                term = term * both.astype(jnp.float32)
            if comp.cat_mod[0] >= 0:
                col, num = comp.cat_mod
                eq = x1[:, col][:, None] == x2t[col][None, :]
                term = term * jnp.where(eq, 1.0, -1.0 / (num - 1))
            acc = acc + term
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
