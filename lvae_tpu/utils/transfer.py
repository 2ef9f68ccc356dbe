"""Chunked host→device transfer for large cohort arrays.

The remote-attached TPU relay moves host data as ONE request per
``device_put``; a 20k-subject cohort's frame table (~2 GB f32) repeatedly
timed out as a single transfer (benchmarks/scaling.py stopped at P=10k,
VERDICT r4 item 8). Splitting the upload into bounded slices turns one
giant, timeout-prone request into a pipeline of small ones; the on-device
``jnp.concatenate`` then reassembles the array without another host trip.

No reference counterpart (the reference ships every batch host→device per
step, training.py:103-124); this is remote-TPU transfer engineering.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# Max bytes per upload request. 256 MB keeps each relay request well under
# the observed timeout horizon while large enough to amortise per-request
# overhead (~100 ms round trip, tools/chunk_sweep.py).
DEFAULT_CHUNK_MB = float(os.environ.get("LVAE_TRANSFER_CHUNK_MB", "256"))


def to_device_chunked(arr, dtype=None, chunk_mb: float | None = None):
    """``jnp.asarray(arr, dtype)`` that uploads big arrays in bounded slices.

    Arrays at or under the chunk budget (and anything already on device)
    take the direct path — identical behaviour to ``jnp.asarray``. Larger
    host arrays are sliced along axis 0, uploaded slice-by-slice, and
    concatenated on device. Values are identical; only the transfer
    granularity changes.
    """
    if isinstance(arr, jax.Array):
        return arr.astype(dtype) if dtype is not None else arr
    a = np.asarray(arr)
    budget = (chunk_mb if chunk_mb is not None else DEFAULT_CHUNK_MB) * 2**20
    if a.nbytes <= budget or a.ndim == 0 or a.shape[0] <= 1:
        return jnp.asarray(a, dtype)
    rows = max(1, int(budget // max(a.nbytes // a.shape[0], 1)))
    parts = [
        jax.device_put(np.ascontiguousarray(a[i : i + rows]))
        for i in range(0, a.shape[0], rows)
    ]
    out = jnp.concatenate(parts, axis=0)
    return out.astype(dtype) if dtype is not None else out
