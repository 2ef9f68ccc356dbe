"""Checkpoint / resume.

The reference scatters ``torch.save`` calls over seven artefact files with
try/except-silenced loads (LVAE.py:146-150, 214-234, 351-370,
training.py:199-233). Here a checkpoint is ONE pytree snapshot — every leaf
converted to numpy and pickled together with a format version — so resume is
exact (optimizer state, RNG key and step included). Best-model snapshots are
the same mechanism under a different name.

Format v2 makes restores refactor-proof: leaves are stored with their
keypath strings, and the pytree *structure* is pickled into a separate bytes
blob that is only deserialised when no ``like`` template is given. A
``like``-templated restore therefore never needs the original defining
classes (NamedTuple renames/moves don't orphan old checkpoints), and when
both sides carry keypaths the leaves are matched BY NAME, tolerating field
reordering.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 2


def _pack_leaf(x):
    """numpy-ify a leaf; typed PRNG keys are stored as raw key data."""
    if _is_key(x):
        return {"__prng__": str(jax.random.key_impl(x)), "data": np.asarray(jax.random.key_data(x))}
    return np.asarray(x)


def _unpack_leaf(x):
    if isinstance(x, dict) and "__prng__" in x:
        # rewrap with the SAVED impl (e.g. rbg vs threefry differ in key-data
        # shape and stream) — the session default may not match the writer's
        return jax.random.wrap_key_data(
            jnp.asarray(x["data"]), impl=x["__prng__"]
        )
    return x


def _keypaths(tree) -> List[str]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [jax.tree_util.keystr(path) for path, _ in flat]


def save_checkpoint(path: str, state: Any, metadata: Optional[dict] = None) -> str:
    """Snapshot any pytree of arrays to ``path`` (atomic rename)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    try:
        # Structure serialised SEPARATELY and best-effort: loading the payload
        # never fails just because the classes behind the treedef changed, and
        # saving never fails on unpicklable (e.g. locally-defined) node types.
        # It is only consulted by like-less loads.
        treedef_bytes = pickle.dumps(treedef, protocol=pickle.HIGHEST_PROTOCOL)
    except Exception:  # noqa: BLE001
        treedef_bytes = None
    payload = {
        "version": FORMAT_VERSION,
        "leaves": [_pack_leaf(x) for x in leaves],
        "keypaths": _keypaths(state),
        "treedef_bytes": treedef_bytes,
        "metadata": metadata or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, like: Optional[Any] = None) -> Any:
    """Restore a pytree snapshot.

    With ``like``, leaves are re-staged onto the template's structure —
    matched by keypath when both sides carry them (robust to field
    reordering), positionally with shape checks otherwise. Without ``like``
    the stored treedef is deserialised (requires the defining classes).
    """
    with open(path, "rb") as f:
        payload = pickle.load(f)
    version = payload.get("version")
    if version not in (1, FORMAT_VERSION):
        raise ValueError(f"Unsupported checkpoint version in {path}")
    leaves = [_unpack_leaf(x) for x in payload["leaves"]]
    if like is not None:
        flat, treedef = jax.tree_util.tree_flatten_with_path(like)
        t_paths = [jax.tree_util.keystr(p) for p, _ in flat]
        t_leaves = [x for _, x in flat]
        s_paths = payload.get("keypaths")
        if s_paths is not None and sorted(s_paths) == sorted(t_paths):
            by_path = dict(zip(s_paths, leaves))
            leaves = [by_path[p] for p in t_paths]
        elif len(t_leaves) != len(leaves):
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
    if version == 1:
        return jax.tree_util.tree_unflatten(payload["treedef"], leaves)
    if payload["treedef_bytes"] is None:
        raise ValueError(
            f"{path} has no stored structure (saved from a non-picklable "
            "pytree class); pass a `like=` template to restore it"
        )
    treedef = pickle.loads(payload["treedef_bytes"])
    return jax.tree_util.tree_unflatten(treedef, leaves)


def try_load_checkpoint(path: str, like: Optional[Any] = None) -> Optional[Any]:
    """Load-if-present (the reference's try/except pattern, made explicit)."""
    if not os.path.exists(path):
        return None
    try:
        return load_checkpoint(path, like)
    except Exception as e:  # noqa: BLE001 — any corrupt checkpoint → fresh start
        print(f"Checkpoint load failed ({path}): {e}")
        return None


# ---------------------------------------------------------------------------
# Orbax backend — same single-snapshot semantics, production storage layer:
# atomic directory commit, async save (training continues while the host
# writes), multi-host-aware array handling. The pickle format above remains
# the zero-dependency default; select orbax per call.
# ---------------------------------------------------------------------------


def _is_key(x) -> bool:
    return hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)


def _strip_keys(tree):
    """Typed PRNG keys → raw uint32 key data (orbax stores plain arrays)."""
    return jax.tree_util.tree_map(
        lambda x: np.asarray(jax.random.key_data(x)) if _is_key(x) else x, tree
    )


def _rewrap_keys(restored, like):
    # the template's impl is the best available (orbax stores plain arrays,
    # so the writer's impl isn't recorded the way the pickle format does)
    return jax.tree_util.tree_map(
        lambda r, t: jax.random.wrap_key_data(
            jnp.asarray(r), impl=str(jax.random.key_impl(t))
        )
        if _is_key(t)
        else r,
        restored,
        like,
    )


_async_checkpointer = None


def save_checkpoint_orbax(path: str, state: Any, async_save: bool = False) -> str:
    """Snapshot ``state`` to an orbax checkpoint directory at ``path``.

    With ``async_save`` the host write proceeds in the background —
    call :func:`wait_for_async_saves` before reading the checkpoint or
    exiting the process.
    """
    global _async_checkpointer
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    stripped = _strip_keys(state)
    if async_save:
        if _async_checkpointer is None:
            _async_checkpointer = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler()
            )
        _async_checkpointer.save(
            path, args=ocp.args.StandardSave(stripped), force=True
        )
    else:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, stripped, force=True)
        ckptr.close()
    return path


def wait_for_async_saves() -> None:
    if _async_checkpointer is not None:
        _async_checkpointer.wait_until_finished()


def load_checkpoint_orbax(path: str, like: Any) -> Any:
    """Restore an orbax snapshot onto the ``like`` template (required — it
    carries the pytree structure, dtypes/shardings and typed-key positions)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), _strip_keys(like))
    ckptr.close()
    return _rewrap_keys(restored, like)
