"""Physionet-protocol benchmark: mortality AUROC from L-VAE latents.

The poster's second experiment (BASELINE.md): train the L-VAE on clinical
time series (Physionet 2012: 3993 patients, 35 attributes, 7 covariates),
then classify in-hospital mortality from the latent representation; L-VAE
reaches AUROC ≈0.73-0.75 vs VAE ≈0.66.

The real Physionet data cannot ship in this environment, so this harness
SYNTHESISES physionet-like cohorts with a ground-truth outcome signal: each
patient's latent severity drifts with a slope that depends on mortality, the
35 observed attributes are a noisy linear readout, and ~40% of readings are
missing. The harness then runs the full chain — SimpleVAE + additive-GP
L-VAE (Hensman) → per-patient latent summary → logistic regression → AUROC —
and compares against the same classifier on raw attribute means. Swap
``synth_physionet`` for a loader of the real npz (data/datasets.load_physionet)
to reproduce the paper numbers.

    python benchmarks/physionet_auroc.py [--patients 400]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T, D_ATTR = 12, 35


def synth_physionet(patients: int, seed: int = 0):
    """Clinical-like cohort with outcome-dependent latent dynamics."""
    from lvae_tpu.data.datasets import ArrayDataset

    rng = np.random.default_rng(seed)
    n = patients * T
    y = rng.binomial(1, 0.3, size=patients)  # mortality
    t = np.tile(np.arange(T, dtype=float), patients)
    # 3-d latent severity process: outcome shifts the drift and level
    base = rng.normal(size=(patients, 3))
    drift = np.stack([0.09 * y + 0.03, -0.06 * y + 0.02, 0.04 * y], axis=1)
    lat = base[:, None, :] + drift[:, None, :] * np.arange(T)[None, :, None]
    lat = lat + 0.8 * rng.normal(size=lat.shape)
    w = rng.normal(size=(3, D_ATTR)) / np.sqrt(3)
    readings = lat.reshape(n, 3) @ w + 1.0 * rng.normal(size=(n, D_ATTR))
    readings = 1.0 / (1.0 + np.exp(-readings))  # squash to [0,1] like vitals
    mask = (rng.uniform(size=(n, D_ATTR)) > 0.4).astype(np.float32)

    # covariates: [time, severity-at-admission, subject, gender]
    labels = np.stack(
        [
            t,
            np.repeat(base[:, 0], T),
            np.repeat(np.arange(patients, dtype=float), T),
            np.repeat(rng.integers(0, 2, patients).astype(float), T),
        ],
        axis=1,
    )
    ds = ArrayDataset(
        data=(readings * mask).astype(np.float32), labels=labels, mask=mask
    )
    return ds, y


def auroc(scores: np.ndarray, y: np.ndarray) -> float:
    """Rank-statistic AUROC (no sklearn dependency)."""
    order = np.argsort(scores)
    ranks = np.empty_like(order, dtype=float)
    ranks[order] = np.arange(1, len(scores) + 1)
    n_pos, n_neg = int(y.sum()), int((1 - y).sum())
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return float((ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def logistic_auroc(features: np.ndarray, y: np.ndarray, seed: int = 0) -> float:
    """5-fold CV logistic regression AUROC on standardised features (jax)."""
    import jax
    import jax.numpy as jnp
    import optax

    feats = (features - features.mean(0)) / (features.std(0) + 1e-6)
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(y))
    folds = np.array_split(order, 5)
    scores = np.zeros(len(y))
    for k in range(5):
        test_idx = folds[k]
        train_idx = np.concatenate([folds[j] for j in range(5) if j != k])
        xtr = jnp.asarray(feats[train_idx], jnp.float32)
        ytr = jnp.asarray(y[train_idx], jnp.float32)
        params = jnp.zeros(feats.shape[1] + 1, jnp.float32)
        opt = optax.adam(0.05)
        opt_state = opt.init(params)

        @jax.jit
        def run(params, opt_state):
            def loss_fn(p):
                logits = xtr @ p[:-1] + p[-1]
                return jnp.mean(
                    jnp.logaddexp(0.0, logits) - ytr * logits
                ) + 1e-3 * jnp.sum(p[:-1] ** 2)

            def step(carry, _):
                p, s = carry
                g = jax.grad(loss_fn)(p)
                u, s = opt.update(g, s)
                return (optax.apply_updates(p, u), s), None

            (p, s), _ = jax.lax.scan(step, (params, opt_state), None, length=300)
            return p

        p = run(params, opt_state)
        scores[test_idx] = np.asarray(feats[test_idx] @ np.asarray(p[:-1]) + float(p[-1]))
    return auroc(scores, y)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--patients", type=int, default=400)
    ap.add_argument("--latent_dim", type=int, default=8)
    ap.add_argument("--M", type=int, default=30)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args(argv)

    from lvae_tpu.data.blocks import build_subject_blocks
    from lvae_tpu.evaluation.encode import encode_dataset
    from lvae_tpu.models.vae import SimpleVAE
    from lvae_tpu.ops import kernels as kx
    from lvae_tpu.train import state as st
    from lvae_tpu.train.hensman import HensmanConfig, HensmanTrainer

    t0 = time.perf_counter()
    ds, y = synth_physionet(a.patients, a.seed)
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2],
        sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    cfg = HensmanConfig(
        spec0=spec0, spec1=spec1, latent_dim=a.latent_dim,
        P_tot=a.patients, N_tot=len(ds), weight=0.5, loss_function="mse",
        natural_gradient=True, natural_gradient_lr=0.01,
        constrain_scales=True, eps=1e-5, dropout=False,
    )
    model = SimpleVAE(latent_dim=a.latent_dim, num_dim=D_ATTR)
    z = st.init_inducing_points(ds.labels, a.M, seed=a.seed)
    trainer = HensmanTrainer(model, cfg, ds, blocks, z, subjects_per_batch=20)
    trainer.fit(a.epochs, log_every=max(1, a.epochs // 5), chunk=25)

    mu, _ = encode_dataset(model, trainer.state.trainables.vae, ds.data)
    # per-patient summary: latent mean + slope over time
    mu_b = mu[blocks.index] * blocks.mask[..., None]
    t_axis = np.arange(blocks.t_max)
    mean_feat = mu_b.sum(1) / blocks.mask.sum(1, keepdims=True)
    centred_t = (t_axis - t_axis.mean())[None, :, None]
    slope_feat = (mu_b * centred_t).sum(1) / (centred_t**2).sum()
    lvae_features = np.concatenate([mean_feat, slope_feat], axis=1)

    raw = ds.data.reshape(len(ds), -1)
    raw_feat = raw[blocks.index].mean(1)

    auc_lvae = logistic_auroc(lvae_features, y, a.seed)
    auc_raw = logistic_auroc(raw_feat, y, a.seed)
    dur = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "physionet_like_mortality_auroc",
                "value": round(auc_lvae, 4),
                "unit": "AUROC",
                "vs_baseline": round(auc_lvae / max(auc_raw, 1e-6), 3),
                "extra": {
                    "raw_features_auroc": round(auc_raw, 4),
                    "paper_lvae": "≈0.73-0.75 (real Physionet)",
                    "patients": a.patients,
                    "wall_s": round(dur, 1),
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
