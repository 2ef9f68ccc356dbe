"""Health MNIST synthetic data generator.

Reproduces the semantics of the reference generator
(Health_MNIST_generate.py:17-174 in SidRama/Longitudinal-VAE): instances of
digits 3 and 6 padded from 28×28 to 36×36, each observed at 20 timepoints.
"Sick" subjects (Bernoulli ½) rotate by ``45·sigmoid(t)`` over time_points
``t ∈ [-9, 10]``; healthy subjects sit at a 5° baseline; all rotations get
N(0, 2) noise. Each frame is diagonally shifted by ``idx/10`` and a Bernoulli
pixel mask with the requested missing fraction is drawn. Labels columns:
``[subject, digit, angle, disease, disease_time, gender, time_age, location]``
with ``disease_time = 'nan'`` for healthy subjects — the source of the
nan-handling in the dataset loaders.

``--source`` ingests real digit images in the reference's directory layout
(``source/<digit>/*.jpg``, Health_MNIST_generate.py:104-115) so the paper
protocol runs verbatim when real MNIST files exist. Without ``--source``
(this environment ships no MNIST), digit *templates* are rendered procedurally
(matplotlib glyphs) with per-instance elastic/affine/stroke/intensity
diversity. The output CSV format is byte-compatible with the reference
loaders either way.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

import numpy as np

_TEMPLATE_CACHE: Dict[str, np.ndarray] = {}


def _render_digit_template(digit: str) -> np.ndarray:
    """Render a 28×28 grayscale glyph for the digit via matplotlib."""
    if digit in _TEMPLATE_CACHE:
        return _TEMPLATE_CACHE[digit]
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(1, 1), dpi=28)
    fig.patch.set_facecolor("black")
    ax = fig.add_axes([0, 0, 1, 1])
    ax.set_facecolor("black")
    ax.axis("off")
    # ~20 px glyph height on the 28 px canvas, matching real MNIST framing
    # (fontsize is in points: 52 pt = 0.72 in = ~20 px at dpi 28)
    ax.text(
        0.5, 0.45, digit, color="white", fontsize=52,
        ha="center", va="center", fontweight="bold",
    )
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., 0].astype(np.float64)
    plt.close(fig)
    img = buf[:28, :28]
    img = img / max(img.max(), 1.0) * 255.0
    _TEMPLATE_CACHE[digit] = img
    return img


def _instance_image(digit: str, rng: np.random.Generator) -> np.ndarray:
    """A 28×28 digit instance with real handwriting-scale diversity.

    The reference samples actual MNIST images, whose per-instance variation
    is what makes GP future-prediction of an unseen subject genuinely harder
    than reconstruction: the model must carry the subject's appearance
    through the id-kernel term, not just read it off the covariates. With no
    MNIST files in this environment, each instance gets an independent
    elastic deformation + affine (rotation/shear/anisotropic zoom) + stroke
    width + intensity draw over the glyph template — calibrated so the
    benchmark discriminates (gp_mse strictly above recon mse, sensitive to
    kernel ablation; asserted in benchmarks/healthmnist_accuracy.py).
    """
    from scipy import ndimage

    base = _render_digit_template(digit)

    # elastic deformation (Simard et al. 2003): smoothed displacement field
    alpha, sigma = rng.uniform(18.0, 36.0), rng.uniform(3.5, 5.0)
    dx = ndimage.gaussian_filter(rng.uniform(-1, 1, base.shape), sigma) * alpha
    dy = ndimage.gaussian_filter(rng.uniform(-1, 1, base.shape), sigma) * alpha
    yy, xx = np.meshgrid(np.arange(28), np.arange(28), indexing="ij")
    img = ndimage.map_coordinates(base, [yy + dy, xx + dx], order=1, mode="constant")

    # affine: rotation + shear + anisotropic zoom about the centre
    angle = np.deg2rad(rng.normal(0.0, 8.0))
    shear = rng.normal(0.0, 0.15)
    zy = 1.0 + rng.normal(0.0, 0.12)
    zx = 1.0 + rng.normal(0.0, 0.12)
    c, s = np.cos(angle), np.sin(angle)
    mat = np.array([[c * zy, -s + shear], [s, c * zx]])
    centre = np.array([13.5, 13.5])
    offset = centre - mat @ centre
    img = ndimage.affine_transform(img, mat, offset=offset, order=1)

    # stroke-width variation: grey dilation (thicker) / erosion (thinner)
    stroke = rng.uniform(-1.0, 1.0)
    if stroke > 0.3:
        img = ndimage.grey_dilation(img, size=(2, 2))
    elif stroke < -0.3:
        img = ndimage.grey_erosion(img, size=(2, 2))

    # per-instance ink intensity
    img = img * rng.uniform(0.65, 1.0)
    return np.clip(img, 0, 255)


def _load_source_images(source: str, digit: str, count: int, offset: int = 0):
    """Read ``count`` real digit instances from ``source/<digit>/*.jpg|png``.

    The reference's ingestion layout (Health_MNIST_generate.py:104-115): one
    sub-directory per digit, one 28×28 grayscale image per instance, consumed
    in file order. We sort the glob for determinism (the reference relies on
    filesystem order) and also accept .png alongside .jpg.
    """
    import glob

    import matplotlib.pyplot as plt

    data_path = os.path.join(source, digit)
    files = sorted(
        glob.glob(os.path.join(data_path, "*.jpg"))
        + glob.glob(os.path.join(data_path, "*.jpeg"))
        + glob.glob(os.path.join(data_path, "*.png"))
    )
    if len(files) < offset + count:
        raise FileNotFoundError(
            f"--source needs >= {offset + count} images under {data_path!r} "
            f"(found {len(files)}); expected the reference layout "
            "source/<digit>/*.jpg"
        )
    out = []
    for f in files[offset : offset + count]:
        img = np.asarray(plt.imread(f), dtype=np.float64)
        if img.ndim == 3:  # RGB(A) → grayscale
            img = img[..., :3].mean(axis=-1)
        if img.max() <= 1.0:  # png floats → the reference's 0..255 scale
            img = img * 255.0
        if img.shape != (28, 28):
            raise ValueError(f"{f}: expected a 28x28 digit image, got {img.shape}")
        out.append(img)
    return out


def generate_healthmnist(
    num_3: int = 50,
    num_6: int = 50,
    missing: float = 25.0,
    num_timepoints: int = 20,
    seed: int = 0,
    destination: Optional[str] = None,
    source: Optional[str] = None,
    source_offset: int = 0,
    data_file_name: str = "health_MNIST_data.csv",
    data_masked_file_name: str = "health_MNIST_data_masked.csv",
    labels_file_name: str = "health_MNIST_label.csv",
    mask_file_name: str = "mask.csv",
):
    """Generate the cohort; optionally write reference-format CSVs.

    Returns ``(data [N,1296] uint8, masked_data, mask, labels_df)`` with
    ``N = (num_3 + num_6) * num_timepoints``.
    """
    from scipy import ndimage
    from scipy.special import expit as sigmoid
    import pandas as pd

    rng = np.random.default_rng(seed)
    sick_prob = 0.5
    time_age = np.arange(0, num_timepoints)
    time_points = np.arange(-(num_timepoints // 2 - 1), num_timepoints // 2 + 1)

    rows = []
    labels = []
    subject_index = 0
    for digit, count in (("3", num_3), ("6", num_6)):
        gender = 0 if digit == "3" else 1
        real_imgs = (
            _load_source_images(source, digit, count, source_offset)
            if source
            else None
        )
        for inst in range(count):
            img28 = (
                real_imgs[inst] if real_imgs is not None
                else _instance_image(digit, rng)
            )
            img_pad = np.pad(img28, ((4, 4), (4, 4)), "constant")
            sick = int(rng.binomial(1, sick_prob))
            loc = int(rng.binomial(1, 0.5))
            rotations = rng.normal(0, 2, num_timepoints)
            rotations = rotations + (45 * sigmoid(time_points) if sick else 5.0)
            for idx, rotation in enumerate(rotations):
                img = ndimage.rotate(img_pad, angle=rotation, reshape=False)
                img = ndimage.shift(img, shift=idx / 10)
                rows.append(np.clip(img, 0, 255).reshape(-1))
                labels.append(
                    [
                        subject_index,
                        digit,
                        rotation,
                        sick,
                        float(time_points[idx]) if sick else float("nan"),
                        gender,
                        int(time_age[idx]),
                        loc,
                    ]
                )
            subject_index += 1

    data = np.asarray(np.stack(rows), dtype=np.int64)
    missing_frac = missing / 100.0
    mask = rng.choice([0, 1], size=data.shape, p=[missing_frac, 1 - missing_frac])
    masked_data = data * mask
    labels_df = pd.DataFrame(
        labels,
        columns=[
            "subject", "digit", "angle", "disease",
            "disease_time", "gender", "time_age", "location",
        ],
    )

    if destination is not None:
        os.makedirs(destination, exist_ok=True)
        np.savetxt(os.path.join(destination, data_file_name), data, fmt="%d", delimiter=",")
        np.savetxt(os.path.join(destination, data_masked_file_name), masked_data, fmt="%d", delimiter=",")
        np.savetxt(os.path.join(destination, mask_file_name), mask, fmt="%d", delimiter=",")
        labels_df.to_csv(os.path.join(destination, labels_file_name), index=False)

    return data, masked_data, mask, labels_df


def generate_split(
    destination: str,
    num_3: int = 50,
    num_6: int = 50,
    missing: float = 25.0,
    seed: int = 0,
    splits=(("", 1.0),),
    source: Optional[str] = None,
):
    """Generate one cohort per named split, e.g. train/validation/test/prediction.

    With ``source``, each split draws DISJOINT real digit-image instances:
    the per-digit file offset advances past every earlier split's draw, so
    a model can never see a test subject's source instance during training
    (Health_MNIST_generate.py samples each cohort from separate invocations
    for the same reason).
    """
    out = {}
    offset = 0
    for i, (name, frac) in enumerate(splits):
        n3 = max(1, int(round(num_3 * frac)))
        n6 = max(1, int(round(num_6 * frac)))
        suffix = f"_{name}" if name else ""
        out[name] = generate_healthmnist(
            n3, n6, missing, seed=seed + i, destination=destination,
            source=source, source_offset=offset,
            data_file_name=f"health_MNIST_data{suffix}.csv",
            data_masked_file_name=f"health_MNIST_data_masked{suffix}.csv",
            labels_file_name=f"health_MNIST_label{suffix}.csv",
            mask_file_name=f"mask{suffix}.csv",
        )
        offset += max(n3, n6)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="Generate Health MNIST data")
    p.add_argument("--source", type=str, default=None,
                   help="Directory of real digit images in the reference "
                        "layout source/<digit>/*.jpg (Health_MNIST_generate"
                        ".py:104-115); omitted = procedural glyph instances")
    p.add_argument("--destination", type=str, default="./data")
    p.add_argument("--num_3", type=int, default=50)
    p.add_argument("--num_6", type=int, default=50)
    p.add_argument("--missing", type=float, default=25)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_file_name", type=str, default="health_MNIST_data.csv")
    p.add_argument("--data_masked_file_name", type=str, default="health_MNIST_data_masked.csv")
    p.add_argument("--labels_file_name", type=str, default="health_MNIST_label.csv")
    p.add_argument("--mask_file_name", type=str, default="mask.csv")
    a = p.parse_args(argv)
    data, _, _, labels = generate_healthmnist(
        a.num_3, a.num_6, a.missing, seed=a.seed, destination=a.destination,
        source=a.source,
        data_file_name=a.data_file_name,
        data_masked_file_name=a.data_masked_file_name,
        labels_file_name=a.labels_file_name,
        mask_file_name=a.mask_file_name,
    )
    print(f"Saved! Number of samples: {data.shape[0]}")


if __name__ == "__main__":
    main()
