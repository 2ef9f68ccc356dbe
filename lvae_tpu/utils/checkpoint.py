"""Checkpoint / resume.

The reference scatters ``torch.save`` calls over seven artefact files with
try/except-silenced loads (LVAE.py:146-150, 214-234, 351-370,
training.py:199-233). Here a checkpoint is ONE pytree snapshot — every leaf
converted to numpy and pickled together with a format version — so resume is
exact (optimizer state, RNG key and step included). Best-model snapshots are
the same mechanism under a different name.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1


def _pack_leaf(x):
    """numpy-ify a leaf; typed PRNG keys are stored as raw key data."""
    if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
        return {"__prng__": str(jax.random.key_impl(x)), "data": np.asarray(jax.random.key_data(x))}
    return np.asarray(x)


def _unpack_leaf(x, template=None):
    if isinstance(x, dict) and "__prng__" in x:
        return jax.random.wrap_key_data(jnp.asarray(x["data"]))
    return x


def save_checkpoint(path: str, state: Any, metadata: Optional[dict] = None) -> str:
    """Snapshot any pytree of arrays to ``path`` (atomic rename)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload = {
        "version": FORMAT_VERSION,
        "leaves": [_pack_leaf(x) for x in leaves],
        "treedef": treedef,
        "metadata": metadata or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, like: Optional[Any] = None) -> Any:
    """Restore a pytree snapshot. With ``like``, leaves are re-staged onto the
    template's structure (shape-checked); otherwise the pickled treedef is
    used (requires the defining classes to be importable)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("version") != FORMAT_VERSION:
        raise ValueError(f"Unsupported checkpoint version in {path}")
    leaves = [_unpack_leaf(x) for x in payload["leaves"]]
    if like is not None:
        t_leaves, treedef = jax.tree_util.tree_flatten(like)
        if len(t_leaves) != len(leaves):
            raise ValueError(
                f"Checkpoint leaf count {len(leaves)} != template {len(t_leaves)}"
            )
        for a, b in zip(leaves, t_leaves):
            if (
                hasattr(b, "shape")
                and hasattr(a, "shape")
                and tuple(a.shape) != tuple(b.shape)
            ):
                raise ValueError(f"Leaf shape mismatch: {a.shape} vs {b.shape}")
        return jax.tree_util.tree_unflatten(treedef, leaves)
    return jax.tree_util.tree_unflatten(payload["treedef"], leaves)


def try_load_checkpoint(path: str, like: Optional[Any] = None) -> Optional[Any]:
    """Load-if-present (the reference's try/except pattern, made explicit)."""
    if not os.path.exists(path):
        return None
    try:
        return load_checkpoint(path, like)
    except Exception as e:  # noqa: BLE001 — any corrupt checkpoint → fresh start
        print(f"Checkpoint load failed ({path}): {e}")
        return None
