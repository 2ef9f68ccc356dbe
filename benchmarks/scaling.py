"""Cohort-size scaling: Hensman epoch time / sample throughput vs P.

The SVI bound's per-epoch cost is O(N) with per-batch cost independent of the
cohort (elbo_functions.py:144-216's point) — this measures that on real
hardware. Synthetic arrays (no image synthesis) so it isolates training.

    python benchmarks/scaling.py [--subjects 200 1000 5000]
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

T, LATENT, M_IND, SPB, IMG = 20, 32, 60, 20, 36


def cohort(p, seed=0):
    from lvae_tpu.data.datasets import ArrayDataset

    rng = np.random.default_rng(seed)
    n = p * T
    labels = np.stack(
        [
            np.tile(np.arange(T), p).astype(float),
            np.repeat(rng.normal(size=p), T),
            np.repeat(np.arange(p), T).astype(float),
            np.repeat(rng.integers(0, 2, p), T).astype(float),
            np.repeat(rng.integers(0, 2, p), T).astype(float),
            np.repeat(rng.integers(0, 2, p), T).astype(float),
        ],
        axis=1,
    )
    return ArrayDataset(
        data=rng.uniform(size=(n, IMG, IMG, 1)).astype(np.float32),
        labels=labels,
        mask=(rng.uniform(size=(n, IMG * IMG)) > 0.25).astype(np.float32),
    )


def measure(p, chunk=10, reps=3, model_dtype="auto"):
    import jax.numpy as jnp

    from lvae_tpu.data.blocks import build_subject_blocks
    from lvae_tpu.models.vae import ConvVAE, auto_model_dtype
    from lvae_tpu.ops import kernels as kx
    from lvae_tpu.train import state as st
    from lvae_tpu.train.hensman import HensmanConfig, HensmanTrainer

    ds = cohort(p)
    dt = (
        auto_model_dtype(p * T) if model_dtype == "auto"
        else jnp.bfloat16 if model_dtype == "bfloat16"
        else jnp.float32
    )
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    cfg = HensmanConfig(
        spec0=spec0, spec1=spec1, latent_dim=LATENT, P_tot=p, N_tot=p * T,
        weight=0.15, loss_function="mse", natural_gradient=True,
        natural_gradient_lr=0.01, constrain_scales=True, eps=1e-5,
        dropout=False,
    )
    model = ConvVAE(latent_dim=LATENT, num_dim=IMG * IMG, p=0.0, dtype=dt)
    z = st.init_inducing_points(ds.labels, M_IND, seed=0)
    trainer = HensmanTrainer(model, cfg, ds, blocks, z, subjects_per_batch=SPB)
    trainer.run_epochs(chunk)  # compile + warmup
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        ms = trainer.run_epochs(chunk)
        times.append((time.perf_counter() - t0) / chunk)
    assert np.isfinite(ms[-1].net)
    epoch_s = float(np.median(times))
    return epoch_s, (p * T) / epoch_s, np.dtype(dt).name


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--subjects", type=int, nargs="+", default=[200, 1000, 5000])
    ap.add_argument("--model_dtype", choices=("auto", "float32", "bfloat16"),
                    default="auto",
                    help="auto = the shipped scale-gated default "
                    "(models/vae.auto_model_dtype)")
    a = ap.parse_args(argv)
    rows = []
    for p in a.subjects:
        epoch_s, sps, dt_name = measure(p, model_dtype=a.model_dtype)
        rows.append({"P": p, "epoch_ms": round(epoch_s * 1000, 2),
                     "samples_per_s": round(sps), "model_dtype": dt_name})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"metric": "hensman_scaling", "rows": rows}))


if __name__ == "__main__":
    main()
