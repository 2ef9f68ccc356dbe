"""Worker process for the multi-process (DCN) test.

Each of two processes owns 4 virtual CPU devices, joins the JAX distributed
runtime through ``lvae_tpu.parallel.distributed.initialize_distributed``
(localhost coordinator), builds the global ('data','latent') mesh over all 8
devices and runs Hensman epochs through the sharded trainer. Per-epoch
metrics are written to a JSON file for the parent test to compare against
the single-process run.

Invoked by tests/test_distributed.py:
    python tests/dcn_worker.py <coordinator_port> <process_id> <out.json>
"""

import json
import os
import sys

if __name__ == "__main__":
    # worker-process env; MUST be guarded — the parent pytest process
    # imports this module for build_trainer, and clobbering its XLA_FLAGS
    # (8 virtual devices) with 4 would poison later subprocess-spawning
    # tests
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def tiny_cohort(p=8, t=4, seed=0):
    from lvae_tpu.data.datasets import ArrayDataset

    rng = np.random.default_rng(seed)
    n = p * t
    labels = np.stack(
        [
            np.tile(np.arange(t), p).astype(float),
            np.repeat(rng.normal(size=p), t),
            np.repeat(np.arange(p), t).astype(float),
            np.repeat(rng.integers(0, 2, p), t).astype(float),
        ],
        axis=1,
    )
    data = rng.uniform(size=(n, 20)).astype(np.float64)
    mask = (rng.uniform(size=(n, 20)) > 0.25).astype(np.float64)
    return ArrayDataset(data=data, labels=labels, mask=mask)


def build_trainer():
    from lvae_tpu.data.blocks import build_subject_blocks
    from lvae_tpu.models import vae as mv
    from lvae_tpu.ops import kernels as kx
    from lvae_tpu.train import hensman as th
    from lvae_tpu.train import state as st

    ds = tiny_cohort()
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2],
        sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    cfg = th.HensmanConfig(
        spec0=spec0, spec1=spec1, latent_dim=4, P_tot=8, N_tot=32,
        weight=0.5, loss_function="mse", natural_gradient=True,
        natural_gradient_lr=0.01, constrain_scales=True, eps=1e-5,
        dropout=False,
    )
    model = mv.SimpleVAE(latent_dim=4, num_dim=20, dtype=jnp.float64)
    z = st.init_inducing_points(ds.labels, m_inducing=6, seed=0)
    return th.HensmanTrainer(
        model, cfg, ds, blocks, z, subjects_per_batch=4, seed=0,
        dtype=jnp.float64,
    )


def build_standard_trainer():
    from lvae_tpu.data.blocks import build_subject_blocks
    from lvae_tpu.models import vae as mv
    from lvae_tpu.ops import kernels as kx
    from lvae_tpu.train import state as st
    from lvae_tpu.train.standard import StandardConfig, StandardTrainer

    ds = tiny_cohort()
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2],
        sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    cfg = StandardConfig(
        spec0=spec0, spec1=spec1, latent_dim=4, P_tot=8, T=4,
        weight=0.5, loss_function="mse", type_KL="GPapprox_closed",
        num_samples=1, constrain_scales=True, eps=1e-6, dropout=False,
    )
    model = mv.SimpleVAE(latent_dim=4, num_dim=20, dtype=jnp.float64)
    z = st.init_inducing_points(ds.labels, m_inducing=6, seed=0)
    return StandardTrainer(model, cfg, ds, blocks, z, dtype=jnp.float64)


def main():
    port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    from lvae_tpu.parallel.distributed import (
        initialize_distributed,
        make_global_mesh,
    )
    from lvae_tpu.parallel.mesh import (
        ShardedHensmanTrainer,
        ShardedStandardTrainer,
    )

    n = initialize_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
    assert n == 8, f"expected 8 global devices, got {n}"
    assert jax.process_count() == 2

    mesh = make_global_mesh(latent=2)
    assert dict(mesh.shape) == {"data": 4, "latent": 2}

    trainer = build_trainer()
    ShardedHensmanTrainer(trainer, mesh)
    ms = trainer.run_epochs(3)
    out = [{"net": m.net, "kld": m.kld, "recon": m.recon} for m in ms]

    # the full-batch regime over the same cross-process mesh
    std = build_standard_trainer()
    ShardedStandardTrainer(std, mesh)
    std_out = [std.run_epoch()._asdict() for _ in range(3)]

    with open(out_path, "w") as f:
        json.dump({"hensman": out, "standard": std_out}, f)
    print(f"process {pid} done: {out[-1]}")


if __name__ == "__main__":
    main()
