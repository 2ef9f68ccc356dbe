"""Image-sequence generation and qualitative plots.

Rebuild of predict_HealthMNIST.py:14-193 in SidRama/Longitudinal-VAE:
matplotlib grids placing each frame at the column given by its timepoint
covariate, and the ``recon_complete_gen`` flow that decodes GP-predicted
latents for unseen sequences into a PDF.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from lvae_tpu.evaluation.encode import decode_latents
from lvae_tpu.ops.predict import predict_latents


def gen_rotated_mnist_plot(
    x, recon_x, labels, seq_length=16, num_sets=3, save_file="recon.pdf",
    image_hw=(36, 36),
):
    """Pairs of (data, reconstruction) rows, frames at column = timepoint
    (predict_HealthMNIST.py:14-34)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.asarray(x).reshape(x.shape[0], -1)
    recon_x = np.asarray(recon_x).reshape(recon_x.shape[0], -1)
    labels = np.asarray(labels)
    fig, ax = plt.subplots(2 * num_sets, 20)
    for row in ax:
        for a in row:
            a.set_xticks([])
            a.set_yticks([])
    plt.axis("off")
    fig.set_size_inches(9, 1.5 * num_sets)
    for j in range(num_sets):
        begin, end = seq_length * j, seq_length * (j + 1)
        for i, t in enumerate(labels[begin:end, 0]):
            col = int(t)
            ax[2 * j, col].imshow(x[begin + i].reshape(image_hw), cmap="gray")
            ax[2 * j + 1, col].imshow(recon_x[begin + i].reshape(image_hw), cmap="gray")
    plt.savefig(save_file)
    plt.close("all")


def gen_rotated_mnist_seqrecon_plot(
    x, recon_x, labels_recon, labels_train, save_file="recon_complete.pdf",
    image_hw=(36, 36), num_sets=8, seq_length=20,
):
    """Generation grid: one data row + two predicted rows per subject set
    (predict_HealthMNIST.py:68-105).

    Two reference quirks kept verbatim: (a) set ``j``'s data row strides by
    ``seq_length`` (20) while its two recon rows stride by ``2*seq_length``
    (40), so on 40-row-per-subject cohorts the ground-truth frames above a
    prediction pair come from a DIFFERENT subject for j >= 1 — exactly what
    predict_HealthMNIST.py:85-103 renders; (b) ``labels_recon`` is accepted
    but never read (the reference indexes ``labels_train`` for every row,
    :93-103), and the one reference call site passes the same array twice
    (:142).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.asarray(x).reshape(x.shape[0], -1)
    recon_x = np.asarray(recon_x).reshape(recon_x.shape[0], -1)
    labels_train = np.asarray(labels_train)
    fig, ax = plt.subplots(4 * num_sets - 1, 20)
    for row in ax:
        for a in row:
            a.set_xticks([])
            a.set_yticks([])
            a.axis("off")
    plt.axis("off")
    fig.set_size_inches(12, 20)
    for j in range(num_sets):
        begin_data, end_data = seq_length * j, seq_length * (j + 1)
        begin_label = seq_length * 2 * j
        mid_label = seq_length * (2 * j + 1)
        end_label = seq_length * 2 * (j + 1)
        for i, t in enumerate(labels_train[begin_data:end_data, 0]):
            if begin_data + i < x.shape[0]:
                ax[4 * j, int(t)].imshow(x[begin_data + i].reshape(image_hw), cmap="gray")
        for i, t in enumerate(labels_train[begin_label:mid_label, 0]):
            if begin_label + i < recon_x.shape[0]:
                ax[4 * j + 1, int(t)].imshow(recon_x[begin_label + i].reshape(image_hw), cmap="gray")
        for i, t in enumerate(labels_train[mid_label:end_label, 0]):
            if mid_label + i < recon_x.shape[0]:
                ax[4 * j + 2, int(t)].imshow(recon_x[mid_label + i].reshape(image_hw), cmap="gray")
    plt.savefig(save_file, bbox_inches="tight")
    plt.close("all")


def recon_complete_gen(
    generation_dataset,
    model,
    params,
    gp_params,
    noise,
    spec0,
    spec1,
    prediction_x: np.ndarray,
    prediction_mu: np.ndarray,
    z,
    id_covariate: int,
    results_path: str,
    epoch: int = -1,
    eps: float = 1e-6,
    verbose: bool = True,
) -> str:
    """Decode GP-predicted latents for the generation cohort → PDF
    (predict_HealthMNIST.py:107-143)."""
    if verbose:
        print(f"Generating images - length of dataset:  {len(generation_dataset)}")
    dtype = np.asarray(prediction_mu).dtype
    z_pred = predict_latents(
        spec0, spec1, gp_params.kp0, gp_params.kp1, np.asarray(noise),
        np.asarray(prediction_x, dtype), np.asarray(prediction_mu, dtype),
        np.asarray(generation_dataset.labels, dtype), z, id_covariate, eps,
    )
    recon = decode_latents(model, params, z_pred)
    filename = "recon_complete.pdf" if epoch == -1 else "recon_complete_best.pdf"
    os.makedirs(results_path, exist_ok=True)
    path = os.path.join(results_path, filename)
    data = np.asarray(generation_dataset.data)
    labels = np.asarray(generation_dataset.labels)
    n_sets = max(1, min(8, data.shape[0] // 40))
    gen_rotated_mnist_seqrecon_plot(
        data[: n_sets * 20], recon[: n_sets * 40], labels[: n_sets * 40],
        labels[: n_sets * 40], save_file=path, num_sets=n_sets,
    )
    return path


def vae_output(
    model, params, dataset, epoch: int, save_path: str, rng=None,
    num_sets: int = 8, seq_length: int = 20,
) -> Optional[str]:
    """Plot VAE reconstructions during pre-training
    (predict_HealthMNIST.py:174-193)."""
    import jax.numpy as jnp

    n = min(len(dataset), 1000)
    data = jnp.asarray(dataset.data[:n])
    if rng is None:
        rng = jax.random.key(0)
    from lvae_tpu.evaluation.encode import vae_forward

    recon, _, _ = vae_forward(model, params, data, rng)
    os.makedirs(save_path, exist_ok=True)
    path = os.path.join(save_path, f"recon_VAE_{epoch}.pdf")
    lo = min(40, max(0, n - num_sets * seq_length))
    hi = min(n, lo + num_sets * seq_length)
    avail_sets = max(1, (hi - lo) // seq_length)
    gen_rotated_mnist_plot(
        np.asarray(data)[lo:hi], np.asarray(recon)[lo:hi],
        dataset.labels[lo:hi], seq_length=seq_length,
        num_sets=avail_sets, save_file=path,
    )
    return path
