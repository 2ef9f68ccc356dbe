"""Multi-chip example: mesh-parallel training + prediction.

Runs the Hensman SVI regime over a ('data', 'latent') device mesh and then
GP-predicts unseen-subject latents mesh-parallel. On a real pod slice the
same code uses the physical chips; here it runs on virtual CPU devices so
the example works anywhere:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        PYTHONPATH=. python examples/multichip.py

Through the CLI/pipeline the equivalent is `--data_mesh=4 --latent_mesh=2`
(works for the hensman, standard and VI regimes).
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import jax

    n = len(jax.devices())
    if n < 2:
        raise SystemExit(
            "multichip example needs >=2 devices; run with "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8 "
            "JAX_PLATFORMS=cpu for virtual devices"
        )
    latent_axis = 2 if n % 2 == 0 else 1
    data_axis = n // latent_axis

    from lvae_tpu.ops.predict import build_predict_inputs
    from lvae_tpu.parallel.mesh import ShardedHensmanTrainer, sharded_gp_predict
    from lvae_tpu.pipeline import LVAEPipeline
    from tests.test_pipeline import healthmnist_like, make_cfg

    cfg = make_cfg(
        "/tmp/lvae_multichip_example", epochs=3, run_validation=False,
        generate_images=False, run_tests=False, latent_dim=2 * latent_axis,
        M=8, subjects_per_batch=data_axis,
        data_mesh=data_axis, latent_mesh=latent_axis,
    )
    cohort = healthmnist_like(p=2 * data_axis, t=5, seed=0)
    pipeline = LVAEPipeline(cfg, {"train": cohort})
    pipeline.build_trainer()
    assert isinstance(pipeline.trainer, ShardedHensmanTrainer)
    pipeline.train()
    print(f"trained on mesh {dict(pipeline.trainer.mesh.shape)}")

    # mesh-parallel GP posterior prediction for unseen subjects
    vae_params, gp_params, noise = pipeline.current_params()
    test = healthmnist_like(p=data_axis, t=5, seed=3)
    test.labels[:, 2] += 1000.0
    mu = np.zeros((len(cohort), cfg.latent_dim), np.float32)
    inputs, _, _ = build_predict_inputs(
        cohort.labels.astype(np.float32), mu,
        test.labels.astype(np.float32), id_covariate=2,
    )
    z_pred = sharded_gp_predict(
        pipeline.spec0, pipeline.spec1, gp_params.kp0, gp_params.kp1,
        noise, inputs, pipeline.trainer.tdata.z, pipeline.trainer.mesh,
        eps=cfg.eps,
    )
    print("predicted latents:", np.asarray(z_pred).shape,
          "finite:", bool(np.isfinite(np.asarray(z_pred)).all()))


if __name__ == "__main__":
    main()
    print("multichip example OK")
