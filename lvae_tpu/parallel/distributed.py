"""Multi-host (multi-slice / DCN) runtime setup.

Single-host multi-chip runs need nothing beyond ``parallel.mesh``; across
hosts, JAX's distributed runtime must be initialised before any device use so
every process sees the global device set. The reference has no distributed
path at all (SURVEY.md §2.2); this module is the framework's entry point for
pod-scale runs: data-parallel subjects ride ICI within a slice, the (small)
variational state replicates, and only scalar loss terms cross DCN.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialise jax.distributed from args or the standard env variables.

    No-op when single-process (returns the local device count). Returns the
    global device count.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return jax.device_count()
    kwargs = {"coordinator_address": coordinator_address}
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.device_count()


def make_global_mesh(latent: int = 1):
    """A ('data', 'latent') mesh over ALL processes' devices.

    Keep the latent axis within a slice (ICI): the [L, M, M] state is tiny and
    its all-reduces are frequent; the data (subject) axis can span DCN because
    only the scalar KLD partial terms cross it per step.
    """
    from lvae_tpu.parallel.mesh import make_mesh

    n = jax.device_count()
    assert n % latent == 0, f"{n} devices not divisible by latent={latent}"
    return make_mesh(data=n // latent, latent=latent, devices=jax.devices())
