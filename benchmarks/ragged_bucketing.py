"""Ragged-T cohorts: single-T_max padding vs bucketed batching, on chip.

The reference handles ragged cohorts exactly but serially (per-subject Python
loop, elbo_functions.py:219-307 — cost ∝ Σ T_s³); the TPU build pads subjects
into static-shape blocks. With ONE global bucket, a single long stay makes
every short subject pay T_max³-shaped Cholesky blocks; with T-length buckets
(SURVEY §7 step 7, ``--T_buckets``) each length band pays only its own cap.
This harness measures that win on a Physionet-like length distribution
(many short stays, few long: the 2012 challenge's hourly-sampled 48h ICU
stays vs early discharges).

    env PYTHONPATH=.:/root/.axon_site python benchmarks/ragged_bucketing.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LATENT, M_IND, SPB, D = 16, 60, 20, 35


def ragged_cohort(p=200, frac_long=0.15, seed=0):
    """Physionet-like lengths: short stays T∈[4,12], few long T∈[40,72]."""
    rng = np.random.default_rng(seed)
    n_long = int(round(p * frac_long))
    t_lens = np.concatenate([
        rng.integers(4, 13, size=p - n_long),
        rng.integers(40, 73, size=n_long),
    ])
    rng.shuffle(t_lens)
    rows = []
    for s, tl in enumerate(t_lens):
        for i in range(tl):
            rows.append([float(i), rng.normal(), float(s), float(s % 2)])
    labels = np.asarray(rows)
    n = len(labels)
    from lvae_tpu.data.datasets import ArrayDataset

    return ArrayDataset(
        data=rng.normal(size=(n, D)).astype(np.float32),
        labels=labels,
        mask=(rng.uniform(size=(n, D)) > 0.5).astype(np.float32),
    ), t_lens


def measure(t_buckets, ds, chunk=10, reps=3, seed=0):
    from lvae_tpu.data.blocks import build_subject_blocks
    from lvae_tpu.models.vae import SimpleVAE
    from lvae_tpu.ops import kernels as kx
    from lvae_tpu.train import state as st
    from lvae_tpu.train.hensman import HensmanConfig, HensmanTrainer

    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    p = blocks.num_subjects
    cfg = HensmanConfig(
        spec0=spec0, spec1=spec1, latent_dim=LATENT, P_tot=p,
        N_tot=len(ds), weight=0.15, loss_function="mse",
        natural_gradient=True, natural_gradient_lr=0.01,
        constrain_scales=True, eps=1e-5, dropout=False,
    )
    model = SimpleVAE(latent_dim=LATENT, num_dim=D)
    z = st.init_inducing_points(ds.labels, M_IND, seed=seed)
    trainer = HensmanTrainer(
        model, cfg, ds, blocks, z, subjects_per_batch=SPB, seed=seed,
        t_buckets=t_buckets,
    )
    caps = [int(t.index.shape[1]) for t in trainer.tables]
    t0 = time.perf_counter()
    trainer.run_epochs(chunk)  # compile + warmup
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        ms = trainer.run_epochs(chunk)
        times.append((time.perf_counter() - t0) / chunk)
    assert np.isfinite(ms[-1].net), ms[-1]
    return float(np.median(times)), caps, compile_s, float(ms[-1].net)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--subjects", type=int, default=200)
    ap.add_argument("--buckets", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=10)
    a = ap.parse_args(argv)

    from lvae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    ds, t_lens = ragged_cohort(p=a.subjects)
    waste = float(np.max(t_lens) ** 3 * len(t_lens) / np.sum(t_lens**3))
    print(json.dumps({
        "P": a.subjects, "T_max": int(t_lens.max()),
        "mean_T": round(float(t_lens.mean()), 1),
        "chol_waste_upper_bound_x": round(waste, 1),
    }), flush=True)

    rows = []
    for tb in (1, a.buckets):
        epoch_s, caps, compile_s, net = measure(tb, ds, chunk=a.chunk)
        rows.append({
            "t_buckets": tb, "bucket_caps": caps,
            "epoch_ms": round(epoch_s * 1000, 2),
            "compile_s": round(compile_s, 1), "net": round(net, 2),
        })
        print(json.dumps(rows[-1]), flush=True)
    speedup = rows[0]["epoch_ms"] / rows[1]["epoch_ms"]
    print(json.dumps({
        "metric": "ragged_bucketing_speedup", "value": round(speedup, 2),
        "unit": "x", "rows": rows,
    }))


if __name__ == "__main__":
    main()
