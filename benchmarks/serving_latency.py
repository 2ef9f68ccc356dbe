"""Serving latency benchmark: the three product capabilities as requests.

The reference has no deployment story (evaluation is inline in its training
scripts); this measures lvae_tpu's serving bundle (lvae_tpu/inference.py) on
the real device:

* ``impute``  — reconstruct a batch of frames (AOT executable, chunked);
* ``predict_trajectory`` — single-subject GP trajectory request, two ways:
  the full-cohort recompute (the reference's algorithm shape,
  utils.py:115-211: every request re-solves all P training-subject blocks)
  vs the AOT low-rank path (cohort operators folded once at bundle build;
  per-request cost independent of P — ops/predict.py gp_predict_extend).

Weights are random-initialised: latency is shape-determined, training
quality is irrelevant here (accuracy is healthmnist_accuracy.py's job).

Usage: env PYTHONPATH=.:/root/.axon_site python benchmarks/serving_latency.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lvae_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


IMG, T = 36, 20
KERNEL_KW = dict(
    cat_kernel=[2],
    sqexp_kernel=[0],
    cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
)


def synth_cohort(p: int, seed=0):
    rng = np.random.default_rng(seed)
    n = p * T
    labels = np.stack(
        [
            np.tile(np.arange(T), p).astype(float),
            np.repeat(rng.normal(size=p), T),
            np.repeat(np.arange(p), T).astype(float),
            np.repeat(rng.integers(0, 2, p), T).astype(float),
        ],
        axis=1,
    )
    data = rng.uniform(size=(n, IMG, IMG, 1)).astype(np.float32)
    return data, labels


def build_predictor(p_subjects: int, latent: int = 32, m_ind: int = 60):
    import jax
    import jax.numpy as jnp

    from lvae_tpu.inference import LVAEPredictor
    from lvae_tpu.models.vae import ConvVAE
    from lvae_tpu.ops import kernels as kx
    from lvae_tpu.train import state as st

    data, labels = synth_cohort(p_subjects)

    model = ConvVAE(latent_dim=latent, num_dim=IMG * IMG, p=0.0)
    params = jax.jit(lambda k, x: model.init(k, x, deterministic=True))(
        jax.random.key(0), jnp.asarray(data[:2])
    )
    spec0, spec1 = kx.split_kernel_spec(id_covariate=2, **KERNEL_KW)
    gp = st.init_gp_params(spec0, spec1, latent)
    z = st.init_inducing_points(labels, m_ind, seed=0)

    from lvae_tpu.evaluation.encode import encode_dataset

    mu, _ = encode_dataset(model, params, data)
    return LVAEPredictor(
        model=model,
        vae_params=params,
        gp_params=gp,
        noise=jnp.ones((latent,), jnp.float32),
        spec0=spec0,
        spec1=spec1,
        z=jnp.asarray(z, jnp.float32),
        id_covariate=2,
        basis_labels=labels.astype(np.float32),
        basis_mu=mu,
        eps=1e-5,
    ), (data, labels)


def timed(fn, reps=20, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)  # ms


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--subjects", type=int, default=200)
    ap.add_argument("--t_obs", type=int, default=10)
    ap.add_argument("--n_query", type=int, default=10)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k_subjects", type=int, nargs="+", default=[1, 2, 8, 32])
    a = ap.parse_args(argv)

    import jax

    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    pred, (data, labels) = build_predictor(a.subjects)

    t0 = time.perf_counter()
    bundle = pred.aot_compile(
        batch_size=a.batch, t_obs=a.t_obs, n_query=a.n_query
    )
    build_s = time.perf_counter() - t0
    print(f"bundle build (AOT compile + basis fold): {build_s:.1f} s", flush=True)

    frames = data[: a.batch]
    pixmask = (np.random.default_rng(0).uniform(size=(a.batch, 36 * 36)) > 0.25
               ).astype(np.float32)
    impute_ms = timed(lambda: bundle.impute(frames, pixmask))

    # a new subject's request: t_obs observed frames → n_query future frames
    obs_x = data[: a.t_obs]
    obs_lab = labels[: a.t_obs].astype(np.float32).copy()
    obs_lab[:, 2] = 1e6  # unseen id
    query_lab = np.tile(obs_lab[:1], (a.n_query, 1))
    query_lab[:, 0] = np.arange(10, 10 + a.n_query)

    traj_aot_ms = timed(
        lambda: bundle.predict_trajectory(obs_x, obs_lab, query_lab)
    )
    traj_full_ms = timed(
        lambda: pred.predict_trajectory(obs_x, obs_lab, query_lab), reps=10
    )

    # clinic batch scoring: K new subjects per request via the batched
    # low-rank extension (ops/predict.py gp_predict_extend_batch) — should
    # stay ~O(K) in the T×T solves and flat in the basis cohort P
    batch_rows = {}
    for k in a.k_subjects:
        # sibling bundle: reuses the batch executables + folded basis,
        # compiles only the K-shaped trajectory executable
        kb = bundle.for_k_subjects(k)
        obs_k = np.stack([data[j * a.t_obs:(j + 1) * a.t_obs] for j in range(k)])
        lab_k = np.stack([obs_lab + j for j in range(k)])
        lab_k[..., 2] = 1e6 + np.arange(k)[:, None]
        q_k = np.stack([query_lab.copy() for _ in range(k)])
        q_k[..., 2] = 1e6 + np.arange(k)[:, None]
        ms = timed(lambda: kb.predict_trajectories(obs_k, lab_k, q_k))
        batch_rows[f"K{k}_ms"] = round(ms, 3)
        batch_rows[f"K{k}_ms_per_subject"] = round(ms / k, 3)

    # basis refresh: fold 2 new TRAINING subjects into the serving basis
    # in place (cohort growth, no O(P) refold / no recompile) vs rebuilding
    # the basis from scratch at the grown size
    grow_n = 2
    grow_x = data[: grow_n * T]
    grow_lab = labels[: grow_n * T].astype(np.float32).copy()
    base_ids = grow_lab[:, 2].copy()
    refresh_counter = [0]

    def do_refresh():
        refresh_counter[0] += 1
        grow_lab[:, 2] = 5e6 + base_ids + grow_n * refresh_counter[0]
        bundle.refresh_basis(grow_x, grow_lab)

    refresh_ms = timed(do_refresh, reps=10, warmup=1)
    t0 = time.perf_counter()
    bundle._fold_basis()
    refold_s = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "serving_trajectory_request_latency",
                "value": round(traj_aot_ms, 3),
                "unit": "ms",
                "vs_baseline": round(traj_full_ms / traj_aot_ms, 2),
                "extra": {
                    "full_recompute_ms": round(traj_full_ms, 2),
                    "impute_batch256_ms": round(impute_ms, 3),
                    "impute_frames_per_s": round(a.batch / (impute_ms / 1e3)),
                    "bundle_build_s": round(build_s, 1),
                    "basis_subjects": a.subjects,
                    "t_obs": a.t_obs,
                    "n_query": a.n_query,
                    "batch_scoring": batch_rows,
                    # in-place fold of 2 new training subjects vs refolding
                    # the grown cohort (a refold at a NEW cohort shape also
                    # pays a fresh compile — that is the real refold cost)
                    "basis_refresh_2subj_ms": round(refresh_ms, 3),
                    "basis_refold_grown_s": round(refold_s, 2),
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
