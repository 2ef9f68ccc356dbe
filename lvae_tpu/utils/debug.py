"""Runtime sanity checks: NaN/conditioning guards for the GP algebra.

The reference has no sanitizers (SURVEY.md §5) — a failed Cholesky silently
NaNs the run. Here: a jit-compatible health report over the GP operators and
a trainer-level guard that raises with diagnostics the moment training state
degrades, instead of producing garbage checkpoints.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from lvae_tpu.ops.elbo import GPBlockOperators
from lvae_tpu.train.state import tree_finite


def gp_health(ops: GPBlockOperators) -> Dict[str, jax.Array]:
    """Conditioning diagnostics of one batch's GP operators (jit-safe).

    With the fused Pallas B-chain (kernels_pallas/b_chain.py) the B/chol(B)
    stacks never leave the kernel, so the equivalent evidence is B⁻¹'s
    finiteness and log|B| (a failed pivot NaNs both).
    """
    diag_lk = jnp.diagonal(ops.LK0zz, axis1=-2, axis2=-1)
    out = {
        "finite_iK0zz": jnp.isfinite(ops.iK0zz).all(),
        "min_LK0zz_pivot": jnp.min(diag_lk),
        "max_iK0zz": jnp.max(jnp.abs(ops.iK0zz)),
    }
    if ops.B is not None and ops.LB is not None:
        diag_lb = jnp.diagonal(ops.LB, axis1=-2, axis2=-1)
        out.update({
            "finite_B": jnp.isfinite(ops.B).all(),
            "finite_LB": jnp.isfinite(ops.LB).all(),
            "min_LB_pivot": jnp.min(diag_lb),
        })
    else:
        out.update({
            "finite_iB": jnp.isfinite(ops.iB).all(),
            "finite_logdet_B": jnp.isfinite(ops.logdet_B).all(),
        })
    return out


def assert_state_finite(state, where: str = "") -> None:
    """Host-side guard: raise with a per-leaf report if any leaf is non-finite."""
    if bool(tree_finite(state)):
        return
    bad = []
    leaves, treedef = jax.tree_util.tree_flatten_with_path(state)
    for path, leaf in leaves:
        try:
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
                if not bool(jnp.isfinite(leaf).all()):
                    bad.append(jax.tree_util.keystr(path))
        except Exception:  # noqa: BLE001 — PRNG keys etc.
            continue
    raise FloatingPointError(
        f"Non-finite training state{f' at {where}' if where else ''}: "
        + ", ".join(bad[:10])
        + ("..." if len(bad) > 10 else "")
    )
