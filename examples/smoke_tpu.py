"""Minimal end-to-end smoke run on whatever accelerator is attached.

Generates a small Health MNIST cohort in memory, trains the L-VAE for a few
epochs under the Hensman regime, and GP-predicts the latents of unseen future
timepoints. Finishes in ~1-2 min on a TPU v5e (mostly compile).

    PYTHONPATH=. python examples/smoke_tpu.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from benchmarks.healthmnist_accuracy import main  # noqa: E402

if __name__ == "__main__":
    result = main(
        ["--subjects", "16", "--test_subjects", "6",
         "--epochs", "30", "--pretrain_epochs", "5",
         "--latent_dim", "8", "--M", "16", "--subjects_per_batch", "8"]
    )
    assert np.isfinite(result.gp_mse)
    print("smoke OK")
