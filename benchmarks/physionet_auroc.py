"""Physionet-protocol benchmark: mortality AUROC from L-VAE latents.

The poster's second experiment (BASELINE.md): train the L-VAE on clinical
time series (Physionet 2012: 3993 patients, 35 attributes, 7 covariates),
then classify in-hospital mortality from the latent representation; L-VAE
reaches AUROC ≈0.73-0.75 vs VAE ≈0.66. The real data cannot ship in this
environment; swap ``synth_physionet`` for ``data.datasets.load_physionet``
on the real npz to reproduce the paper numbers.

Synthetic-cohort design (de-circularised in r2 — the r1 harness injected a
linear latent drift read out linearly, which a linear classifier on raw
means could nearly invert, so beating it proved little):

* ground-truth per-patient factors drive a latent severity process with
  level + drift + oscillatory components;
* mortality is a function of the TRUE factors (level & slope), but the 35
  observed attributes are a frozen random two-layer MLP (tanh → sigmoid)
  of the latent state — a NONLINEAR entangled mixing that a linear readout
  of raw attributes cannot invert;
* missingness is MNAR: the dropout probability depends on the reading's
  value (~40% average), and patients have ragged stay lengths (T ∈ 8..12),
  exercising the varying-T training path;
* baselines get the SAME per-patient feature engineering (masked means +
  slopes): (a) PCA scores at the SAME dimensionality, (b) the untrained
  encoder (same architecture, random weights), and (c) ALL 35 raw
  attributes — an unequal-capacity reference (70 probe features vs the
  L-VAE's 2·latent_dim) reported for transparency but not asserted
  against. Asserted claims (seed-stable): (1) TRAINING contributes —
  L-VAE features beat the untrained encoder by a clear margin (this was
  FALSE under the r1 protocol, where the mse-mode KLD partially collapsed
  the posterior and training made the features WORSE than random); and
  (2) L-VAE is at least competitive with the best baseline. On this
  synthetic cohort L-VAE and same-dim PCA are statistically tied (the
  sigmoid-MLP map is invertible enough for a linear subspace to carry the
  factors); the paper's L-VAE-vs-linear gap on real Physionet comes from
  realistic noise structure a synthetic map cannot honestly emulate, so
  strict superiority over PCA is deliberately NOT asserted — constructing
  a cohort to force it would reintroduce the circularity this rewrite
  removes.

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

from lvae_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

T_MIN, T_MAX, D_ATTR, D_LAT = 8, 12, 35, 3


def synth_physionet(patients: int, seed: int = 0):
    """Clinical-like ragged cohort with a nonlinear observation map."""
    from lvae_tpu.data.datasets import ArrayDataset

    rng = np.random.default_rng(seed)
    t_lens = rng.integers(T_MIN, T_MAX + 1, size=patients)

    # per-patient ground-truth factors
    u = rng.normal(size=(patients, 4))
    # mortality from TRUE level & slope factors (linear in the factors —
    # the difficulty lives in the observation map, not in the outcome)
    logit = 1.4 * u[:, 0] + 1.8 * u[:, 1] - 0.8
    y = rng.binomial(1, 1.0 / (1.0 + np.exp(-logit)))

    # frozen random MLP: latent state -> 35 attributes (nonlinear mixing)
    w1 = rng.normal(size=(D_LAT, 24)) / np.sqrt(D_LAT)
    b1 = 0.3 * rng.normal(size=24)
    w2 = rng.normal(size=(24, D_ATTR)) / np.sqrt(24.0)
    b2 = 0.2 * rng.normal(size=D_ATTR)

    rows, mask_rows, labels = [], [], []
    for i in range(patients):
        ts = np.arange(t_lens[i], dtype=float)
        lat = np.stack(
            [
                u[i, 0] + 0.12 * u[i, 1] * ts + 0.4 * np.sin(ts / 2.0 + u[i, 2]),
                0.8 * u[i, 1] + 0.08 * u[i, 0] * ts,
                u[i, 2] + 0.5 * np.cos(ts / 3.0 + u[i, 3]),
            ],
            axis=1,
        )  # [T_i, 3]
        lat = lat + 0.35 * rng.normal(size=lat.shape)
        readings = 1.0 / (
            1.0 + np.exp(-(np.tanh(lat @ w1 + b1) @ w2 + b2))
        )
        readings = readings + 0.15 * rng.normal(size=readings.shape)
        # sparse MNAR mask (~70% missing): extreme readings are likelier to
        # be measured — raw per-patient means are then few-sample noisy,
        # which is where structure-aware denoising has to earn its keep
        p_obs = 1.0 / (1.0 + np.exp(-(2.0 * np.abs(readings - 0.5) * 4.0 - 2.6)))
        mask = (rng.uniform(size=readings.shape) < p_obs).astype(np.float32)
        rows.append(readings)
        mask_rows.append(mask)
        # covariates: [time, age-like, subject, gender]
        labels.append(
            np.stack(
                [
                    ts,
                    np.full(len(ts), u[i, 3]),
                    np.full(len(ts), float(i)),
                    np.full(len(ts), float(rng.integers(0, 2))),
                ],
                axis=1,
            )
        )
    readings = np.concatenate(rows).astype(np.float32)
    mask = np.concatenate(mask_rows).astype(np.float32)
    labels = np.concatenate(labels)
    ds = ArrayDataset(data=readings * mask, labels=labels, mask=mask)
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
    """5-fold CV logistic regression AUROC on standardised features (jax).

    Standardisation is FOLD-LOCAL (fit on the train rows, applied to the
    test rows) so the supervised stage never reads test-fold statistics.
    The unsupervised representations themselves (encoder, PCA basis) are
    deliberately fit on the full cohort — the paper's own semi-supervised
    protocol, applied symmetrically to every method in the panel.
    """
    import jax
    import jax.numpy as jnp
    import optax

    rng = np.random.default_rng(seed)
    order = rng.permutation(len(y))
    folds = np.array_split(order, 5)
    scores = np.zeros(len(y))
    for k in range(5):
        test_idx = folds[k]
        train_idx = np.concatenate([folds[j] for j in range(5) if j != k])
        mu_f = features[train_idx].mean(0)
        sd_f = features[train_idx].std(0) + 1e-6
        feats = (features - mu_f) / sd_f
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


def summary_features(values: np.ndarray, blocks) -> np.ndarray:
    """Per-patient masked mean + slope of a per-row feature matrix [N, D]."""
    vb = values[blocks.index] * blocks.mask[..., None]  # [P, T, D]
    counts = np.maximum(blocks.mask.sum(1, keepdims=True), 1.0)
    mean_f = vb.sum(1) / counts
    t_axis = np.arange(blocks.t_max, dtype=float)[None, :, None]
    tc = (t_axis - (t_axis * blocks.mask[..., None]).sum(1, keepdims=True) / counts[:, None])
    tc = tc * blocks.mask[..., None]
    denom = np.maximum((tc**2).sum(1), 1e-6)
    slope_f = (vb * tc).sum(1) / denom
    return np.concatenate([mean_f, slope_f], axis=1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--patients", type=int, default=400)
    ap.add_argument("--latent_dim", type=int, default=8)
    ap.add_argument("--M", type=int, default=30)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args(argv)

    import jax

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
    # nll keeps the reconstruction term dominant over the GP KLD (with the
    # per-attribute-normalised mse the KLD wins and the posterior collapses
    # — same pathology as the r1 accuracy harness, see benchmarks/README.md)
    cfg = HensmanConfig(
        spec0=spec0, spec1=spec1, latent_dim=a.latent_dim,
        P_tot=a.patients, N_tot=len(ds), weight=0.5, loss_function="nll",
        natural_gradient=True, natural_gradient_lr=0.01,
        constrain_scales=True, eps=1e-5, dropout=False,
    )
    model = SimpleVAE(latent_dim=a.latent_dim, num_dim=D_ATTR)
    z = st.init_inducing_points(ds.labels, a.M, seed=a.seed)
    trainer = HensmanTrainer(model, cfg, ds, blocks, z, subjects_per_batch=20)
    # snapshot to host: the epoch program DONATES the state buffers, so a
    # live reference to the initial device params would be deleted storage
    untrained = jax.tree_util.tree_map(np.asarray, trainer.state.trainables.vae)
    trainer.fit(a.epochs, log_every=max(1, a.epochs // 5), chunk=25)

    mu, _ = encode_dataset(model, trainer.state.trainables.vae, ds.data)
    lvae_features = summary_features(np.asarray(mu), blocks)

    # baselines with IDENTICAL feature engineering
    raw_features = summary_features(ds.data.reshape(len(ds), -1), blocks)
    mu0, _ = encode_dataset(model, untrained, ds.data)
    untrained_features = summary_features(np.asarray(mu0), blocks)
    raw = ds.data.reshape(len(ds), -1)
    centred = raw - raw.mean(0)
    _, _, vt = np.linalg.svd(centred, full_matrices=False)
    pca_scores = centred @ vt[: a.latent_dim].T
    pca_features = summary_features(pca_scores, blocks)

    auc_lvae = logistic_auroc(lvae_features, y, a.seed)
    auc_raw = logistic_auroc(raw_features, y, a.seed)
    auc_pca = logistic_auroc(pca_features, y, a.seed)
    auc_untrained = logistic_auroc(untrained_features, y, a.seed)
    dur = time.perf_counter() - t0
    print(
        f"AUROC — L-VAE({2 * a.latent_dim} feats) {auc_lvae:.4f} | "
        f"PCA({2 * a.latent_dim} feats) {auc_pca:.4f} | "
        f"untrained encoder {auc_untrained:.4f} | "
        f"raw all-attributes ({2 * D_ATTR} feats, unequal capacity) {auc_raw:.4f}",
        flush=True,
    )
    assert auc_lvae > auc_untrained + 0.01, (
        "training did not improve the representation "
        f"({auc_lvae:.4f} vs untrained {auc_untrained:.4f}) — check for "
        "posterior collapse (see the nll-vs-mse note above)"
    )
    best_any = max(auc_pca, auc_untrained, auc_raw)
    assert auc_lvae > 0.95 * best_any, (
        f"L-VAE far below the best baseline ({auc_lvae:.4f} vs {best_any:.4f})"
    )
    equal_budget_best = max(auc_pca, auc_untrained)
    print(
        json.dumps(
            {
                "metric": "physionet_like_mortality_auroc",
                "value": round(auc_lvae, 4),
                "unit": "AUROC",
                "vs_baseline": round(auc_lvae / max(equal_budget_best, 1e-6), 3),
                "extra": {
                    "pca_same_dim_auroc": round(auc_pca, 4),
                    "untrained_encoder_auroc": round(auc_untrained, 4),
                    "raw_all_attr_auroc_unequal_capacity": round(auc_raw, 4),
                    "paper_lvae": "≈0.73-0.75 (real Physionet; not comparable "
                    "to this synthetic cohort)",
                    "patients": a.patients,
                    "wall_s": round(dur, 1),
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
