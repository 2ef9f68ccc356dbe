"""Loader tests for the Physionet and RotatedMNIST families (synthetic files)."""

import numpy as np

from lvae_tpu.data.datasets import load_physionet, load_rotatedmnist


def test_physionet_loader(tmp_path):
    """dataset_def.py:8-44 semantics: reshape, label[8] -= 24, outcome mask
    appended to the label vector."""
    rng = np.random.default_rng(0)
    subj, t, d, q = 4, 3, 7, 10
    data = rng.normal(size=(subj, t, d))
    labels = rng.normal(size=(subj, t, q))
    data_mask = rng.integers(0, 2, size=(subj, t, d))
    label_mask = rng.integers(0, 2, size=(subj, t, q))
    np.savez(
        tmp_path / "physionet.npz",
        data_readings=data,
        outcome_attrib=labels,
        data_mask=data_mask,
        outcome_mask=label_mask,
    )
    ds = load_physionet("physionet.npz", root_dir=str(tmp_path))
    assert ds.data.shape == (subj * t, d)
    assert ds.labels.shape == (subj * t, 2 * q)
    np.testing.assert_allclose(
        ds.labels[:, 8], labels.reshape(-1, q)[:, 8] - 24.0, rtol=1e-6
    )
    np.testing.assert_array_equal(ds.mask, data_mask.reshape(-1, d))


def test_rotatedmnist_loader(tmp_path):
    """dataset_def.py:47-130 semantics: npy data + transposed label table.

    ToTensor rescales /255 ONLY uint8 input; float npy passes through raw
    (the paper's rotated-MNIST npy files are floats in [0, 1])."""
    rng = np.random.default_rng(1)
    n, q = 12, 4
    data = rng.integers(0, 256, size=(n, 784)).astype(np.uint8)
    labels = rng.normal(size=(q, n))  # stored [Q, N], loader transposes
    np.save(tmp_path / "data.npy", data)
    np.save(tmp_path / "labels.npy", labels)
    ds = load_rotatedmnist("data.npy", "labels.npy", root_dir=str(tmp_path), conv=True)
    assert ds.data.shape == (n, 28, 28, 1)
    np.testing.assert_allclose(
        ds.data.reshape(n, 784), data / 255.0, rtol=0, atol=1e-7
    )
    assert ds.labels.shape == (n, q)
    np.testing.assert_allclose(ds.labels, labels.T)
    assert ds.mask.shape == (n, 784)

    # float input is NOT rescaled, even when its range looks like 0..255 —
    # torchvision's ToTensor leaves float ndarrays alone and the reference
    # trains on the raw values
    fdata = data.astype(np.float64)
    np.save(tmp_path / "fdata.npy", fdata)
    ds_f = load_rotatedmnist(
        "fdata.npy", "labels.npy", root_dir=str(tmp_path), conv=False
    )
    np.testing.assert_allclose(ds_f.data, fdata, rtol=0, atol=0)
