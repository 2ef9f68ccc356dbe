"""Fused flat Adam update (Pallas TPU kernel).

The trainer's optimizer step is ``optax.flatten(optax.adam(lr))`` over ~1M
parameters (train/state.py:make_optimizer — flattening already collapsed ~30
per-tensor updates into vector ops, 685 → 430 µs/step at the bench config).
The remaining 430 µs is still ~5× the pure-bandwidth cost of the update's
7 array passes: XLA emits the ravel, the Adam moment/update chain and the
unravel as separate loops over HBM.

This kernel performs the whole Adam math — both moment updates and the
parameter delta, with bias correction — in ONE pass over VMEM-resident
blocks: read (m, v, g), write (m', v', Δ). The first/second-moment buffers
live padded to the f32 tile so no re-layout happens per step; grads are
ravelled once (one fused concat) and the delta unravelled once.

Exposed as :func:`fused_adam`, a drop-in ``optax.GradientTransformation``
(same math as ``optax.adam``: mu/nu EMAs, bias correction, no eps_root).
Falls back to an identical-math jnp path off-TPU or for non-f32 pytrees
(the CPU x64 test suite), so checkpoint state structure only depends on the
backend the run was created on.

Rebuilds nothing in the reference (the reference uses torch.optim.Adam,
LVAE.py:292); this is TPU-native runtime work.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.flatten_util import ravel_pytree

from lvae_tpu.ops import linalg as la

_LANE = 128
_BLOCK_ROWS = 512  # [512, 128] f32 blocks = 256 KiB per operand in VMEM


class FusedAdamState(NamedTuple):
    count: jax.Array  # int32 scalar, number of steps taken
    mu: jax.Array  # first moment, flat (padded to the block tile on TPU)
    nu: jax.Array  # second moment, same layout


def _padded_len(n: int) -> int:
    # pad to a whole number of [block_rows, 128] blocks (block_rows ≤ 512,
    # shrunk for tiny pytrees so padding never exceeds one block)
    rows = max(8, -(-n // _LANE))
    block_rows = min(_BLOCK_ROWS, ((rows + 7) // 8) * 8)
    total_rows = -(-rows // block_rows) * block_rows
    return total_rows * _LANE


def _block_rows(npad: int) -> int:
    rows = npad // _LANE
    return min(_BLOCK_ROWS, rows)


def _adam_kernel(b1: float, b2: float, lr: float, eps: float,
                 c_ref, m_ref, v_ref, g_ref, mo_ref, vo_ref, d_ref):
    g = g_ref[:]
    m = b1 * m_ref[:] + (1.0 - b1) * g
    v = b2 * v_ref[:] + (1.0 - b2) * (g * g)
    mo_ref[:] = m
    vo_ref[:] = v
    # c_ref = [[1/(1-b1^t), 1/(1-b2^t)]] (SMEM)
    mhat = m * c_ref[0, 0]
    vhat = v * c_ref[0, 1]
    d_ref[:] = (-lr) * mhat / (jnp.sqrt(vhat) + eps)


@functools.partial(
    jax.jit, static_argnames=("b1", "b2", "lr", "eps", "interpret")
)
def _adam_pallas(m, v, g, c, *, b1, b2, lr, eps, interpret=False):
    """m, v, g: [npad] f32; c: [1, 2] f32 → (m', v', delta) each [npad]."""
    npad = m.shape[0]
    br = _block_rows(npad)
    rows = npad // _LANE
    grid = (rows // br,)
    vspec = pl.BlockSpec((br, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
    shape = jax.ShapeDtypeStruct((rows, _LANE), jnp.float32)
    mo, vo, d = pl.pallas_call(
        functools.partial(_adam_kernel, b1, b2, lr, eps),
        grid=grid,
        in_specs=[sspec, vspec, vspec, vspec],
        out_specs=(vspec, vspec, vspec),
        out_shape=(shape, shape, shape),
        # NOTE: no input_output_aliases — aliasing the operands crashes the
        # TPU runtime when the kernel sits inside a donated-carry scan (the
        # epoch program donates its state, train/hensman.py:200); XLA's
        # buffer reuse handles the in-place pattern without the hint.
        interpret=interpret,
    )(
        c,
        m.reshape(rows, _LANE),
        v.reshape(rows, _LANE),
        g.reshape(rows, _LANE),
    )
    return mo.reshape(npad), vo.reshape(npad), d.reshape(npad)


def fused_adam(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    interpret: bool = False,
) -> optax.GradientTransformation:
    """One-kernel flat Adam; drop-in for ``optax.flatten(optax.adam(lr))``.

    ``None`` leaves pass through (matching make_optimizer's masked wrapper
    usage). On non-TPU backends or non-f32 pytrees the identical math runs
    as a plain jnp chain on the unpadded flat vector.
    """

    def _fuse(dtype) -> bool:
        return bool(
            dtype == jnp.float32
            and (interpret or jax.default_backend() == "tpu")
        )

    def init(params):
        flat, _ = ravel_pytree(params)
        n = flat.size
        # mu and nu must be DISTINCT buffers: aliasing one array under two
        # pytree leaves is a duplicate-donation hazard inside the donated
        # epoch-scan carry (train/hensman.py:200)
        if _fuse(flat.dtype):
            mu = jnp.zeros((_padded_len(n),), jnp.float32)
            nu = jnp.zeros((_padded_len(n),), jnp.float32)
        else:
            mu = jnp.zeros((n,), flat.dtype)
            nu = jnp.zeros((n,), flat.dtype)
        return FusedAdamState(count=jnp.zeros((), jnp.int32), mu=mu, nu=nu)

    def update(grads, state, params=None):
        del params
        flat_g, unravel = ravel_pytree(grads)
        n = flat_g.size
        count = state.count + 1
        t = count.astype(flat_g.dtype)
        c1 = 1.0 / (1.0 - b1**t)
        c2 = 1.0 / (1.0 - b2**t)
        if _fuse(flat_g.dtype):
            npad = state.mu.shape[0]
            g = jnp.zeros((npad,), jnp.float32).at[:n].set(flat_g)
            if la.pallas_suppress_active():
                # mesh-traced program (ops/linalg.pallas_suppressed): keep
                # the init-decided padded layout but run the identical math
                # as plain XLA ops — GSPMD cannot partition the custom call.
                # Padded tail stays exact zeros (g is zero there, eps > 0).
                mo = b1 * state.mu + (1.0 - b1) * g
                vo = b2 * state.nu + (1.0 - b2) * (g * g)
                d = (-learning_rate) * (mo * c1) / (jnp.sqrt(vo * c2) + eps)
            else:
                c = jnp.stack([c1, c2]).reshape(1, 2).astype(jnp.float32)
                mo, vo, d = _adam_pallas(
                    state.mu, state.nu, g, c,
                    b1=b1, b2=b2, lr=learning_rate, eps=eps,
                    interpret=interpret,
                )
            delta = d[:n]
        else:
            mo = b1 * state.mu + (1.0 - b1) * flat_g
            vo = b2 * state.nu + (1.0 - b2) * (flat_g * flat_g)
            delta = (-learning_rate) * (mo * c1) / (jnp.sqrt(vo * c2) + eps)
        return unravel(delta), FusedAdamState(count=count, mu=mo, nu=vo)

    return optax.GradientTransformation(init, update)
