"""Clinic-batch serving lifecycle, end to end on the attached accelerator.

Demonstrates the production serving story (docs/OPERATIONS.md §5):

1. train a small L-VAE (Hensman SVI) on a synthetic Health-MNIST cohort;
2. build an AOT serving bundle (`LVAEPredictor.aot_compile`) — fixed-shape
   executables over a precomputed low-rank cohort basis;
3. score a K-subject clinic batch in ONE request
   (`for_k_subjects(K).predict_trajectories` — ~O(K) in the T×T solves,
   flat in the cohort size);
4. grow the cohort in place (`refresh_basis`) — new training subjects fold
   into the basis operators with no recompile — and serve again.

    PYTHONPATH=. python examples/clinic_serving.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from lvae_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main():
    import jax
    import jax.numpy as jnp

    from lvae_tpu.data.blocks import build_subject_blocks
    from lvae_tpu.data.datasets import ArrayDataset
    from lvae_tpu.inference import LVAEPredictor
    from lvae_tpu.models.vae import ConvVAE
    from lvae_tpu.ops import kernels as kx
    from lvae_tpu.train import state as st
    from lvae_tpu.train.hensman import HensmanConfig, HensmanTrainer

    p, t, latent, m_ind, img = 24, 5, 8, 16, 36
    rng = np.random.default_rng(0)
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
    ds = ArrayDataset(
        data=rng.uniform(size=(n, img, img, 1)).astype(np.float32),
        labels=labels,
        mask=np.ones((n, img * img), np.float32),
    )
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    cfg = HensmanConfig(
        spec0=spec0, spec1=spec1, latent_dim=latent, P_tot=p, N_tot=n,
        weight=0.15, loss_function="mse", natural_gradient=True,
        natural_gradient_lr=0.01, constrain_scales=True, eps=1e-5,
        dropout=False,
    )
    model = ConvVAE(latent_dim=latent, num_dim=img * img, p=0.0)
    z = st.init_inducing_points(labels, m_ind, seed=0)
    trainer = HensmanTrainer(model, cfg, ds, blocks=build_subject_blocks(
        labels, id_covariate=2), z=z, subjects_per_batch=8)
    print("training 50 epochs ...", flush=True)
    trainer.fit(50, log_every=25, chunk=25)

    tr = trainer.state.trainables
    from lvae_tpu.evaluation.encode import encode_dataset

    mu, _ = encode_dataset(model, tr.vae, ds.data)
    pred = LVAEPredictor(
        model=model, vae_params=tr.vae, gp_params=tr.gp,
        noise=jnp.ones((latent,), jnp.float32), spec0=spec0, spec1=spec1,
        z=jnp.asarray(trainer.tdata.z), id_covariate=2,
        basis_labels=labels.astype(np.float32), basis_mu=mu, eps=1e-5,
    )

    t_obs, n_query, k = 3, 2, 4
    bundle = pred.aot_compile(batch_size=64, t_obs=t_obs, n_query=n_query)
    kb = bundle.for_k_subjects(k)

    def clinic_batch(id_base):
        obs_x = np.stack(
            [ds.data[j * t:(j * t) + t_obs] for j in range(k)]
        )
        obs_lab = np.stack([labels[j * t:(j * t) + t_obs] for j in range(k)]
                           ).astype(np.float32)
        obs_lab[..., 2] = id_base + np.arange(k)[:, None]
        q = np.repeat(obs_lab[:, :1], n_query, axis=1).copy()
        q[..., 0] = np.arange(10, 10 + n_query)[None]
        return obs_x, obs_lab, q

    obs_x, obs_lab, q = clinic_batch(1e6)
    t0 = time.perf_counter()
    frames = kb.predict_trajectories(obs_x, obs_lab, q)
    ms = (time.perf_counter() - t0) * 1e3
    assert np.isfinite(frames).all()
    print(f"clinic batch of {k}: predicted {frames.shape} in {ms:.1f} ms "
          f"({ms / k:.1f} ms/subject)", flush=True)

    # cohort growth: fold 2 new training subjects in place, serve again
    grow = 2
    gx = ds.data[: grow * t]
    gl = labels[: grow * t].astype(np.float32).copy()
    gl[:, 2] += 5000
    t0 = time.perf_counter()
    kb.refresh_basis(gx, gl)
    print(f"basis refreshed with {grow} subjects in "
          f"{(time.perf_counter() - t0) * 1e3:.1f} ms (no recompile)",
          flush=True)
    obs_x, obs_lab, q = clinic_batch(2e6)
    frames2 = kb.predict_trajectories(obs_x, obs_lab, q)
    assert np.isfinite(frames2).all()
    print("served against the grown basis: OK", flush=True)
    print("clinic serving example OK:", jax.devices()[0].device_kind)


if __name__ == "__main__":
    main()
