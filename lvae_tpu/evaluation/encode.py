"""Jitted dataset encoding/decoding.

Replaces the reference's DataLoader encode loops (LVAE.py:156-172,
training.py:156-166, 301-311): the dataset is device-resident, so a full
encode is a scan over fixed-size index chunks with tail padding. The flax
module (a frozen dataclass, hashable) is a static jit argument, so repeated
calls reuse the compiled program.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(0,))
def vae_forward(model, params, x, rng):
    """Jitted full VAE forward (encode→sample→decode), cached across calls.

    The evaluation entry points used to build a fresh ``jax.jit(lambda ...)``
    per call — the jit cache is keyed on the wrapper object, so every
    validation/test invocation re-traced (and on the remote chip could
    re-compile for minutes). The hashable flax module as a static argument
    makes repeat calls cache hits, like :func:`_encode_scan` below.
    """
    return model.apply(params, x, rng=rng, deterministic=True)


@functools.partial(jax.jit, static_argnums=(0,))
def _encode_scan(model, params, data, idx):
    def step(_, chunk):
        mu, log_var = model.apply(
            params,
            jnp.take(data, chunk, axis=0),
            deterministic=True,
            method=type(model).encode,
        )
        return None, (mu, log_var)

    _, (mus, lvs) = jax.lax.scan(step, None, idx)
    return mus, lvs


@functools.partial(jax.jit, static_argnums=(0,))
def _decode_scan(model, params, z_chunks):
    def step(_, zi):
        return None, model.apply(
            params, zi, deterministic=True, method=type(model).decode
        )

    _, out = jax.lax.scan(step, None, z_chunks)
    return out


def _chunk_indices(n: int, batch_size: int) -> np.ndarray:
    bs = min(batch_size, n)
    n_chunks = (n + bs - 1) // bs
    pad = n_chunks * bs - n
    idx = np.concatenate([np.arange(n), np.zeros(pad, np.int64)])
    return idx.reshape(n_chunks, bs)


def encode_dataset(
    model, params, data, batch_size: int = 1000
) -> Tuple[np.ndarray, np.ndarray]:
    """Encode every sample: ``(mu [N, L], log_var [N, L])``."""
    n = data.shape[0]
    if n == 0:
        empty = np.zeros((0, model.latent_dim), np.float32)
        return empty, empty.copy()
    t = getattr(model, "T", None)
    if t:
        # recurrent encoders consume whole subject sequences: chunks must be
        # a multiple of T (and the row-0 tail padding then forms complete
        # fake subjects that never mix into a real one's recurrence)
        if n % t:
            raise ValueError(
                f"RNN encoder needs subject-major data with N divisible by "
                f"T={t}; got N={n}"
            )
        batch_size = max(t, min(batch_size, n) // t * t)
    idx = _chunk_indices(n, batch_size)
    mus, lvs = _encode_scan(model, params, jnp.asarray(data), jnp.asarray(idx))
    latent = mus.shape[-1]
    # GP moments stay ≥ f32 (CLAUDE.md numerics invariant): a bf16 compute
    # model must not leak bf16 into the posterior algebra downstream
    # (jnp.linalg.cholesky rejects bf16; the jitter/NG math needs f32)
    if mus.dtype == jnp.bfloat16:
        mus, lvs = mus.astype(jnp.float32), lvs.astype(jnp.float32)
    mu = np.asarray(mus).reshape(-1, latent)[:n]
    lv = np.asarray(lvs).reshape(-1, latent)[:n]
    return mu, lv


def decode_latents(model, params, z, batch_size: int = 1000) -> np.ndarray:
    """Decode latents ``[N, L]`` to data space in fixed-size chunks."""
    z = np.asarray(z)
    n = z.shape[0]
    if n == 0:  # one zero row through the decoder fixes the output shape
        out = np.asarray(
            _decode_scan(model, params, jnp.zeros((1, 1, z.shape[1]), jnp.float32))
        )
        return out.reshape((1,) + out.shape[2:])[:0]
    idx = _chunk_indices(n, batch_size)  # shared pad/chunk rule with encode
    zp = z[idx.reshape(-1)].reshape(idx.shape + (z.shape[1],))
    out = np.asarray(_decode_scan(model, params, jnp.asarray(zp)))
    return out.reshape((idx.size,) + out.shape[2:])[:n]
