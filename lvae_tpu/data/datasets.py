"""Array-backed datasets.

TPU-native replacement for the reference's torch ``Dataset`` classes
(dataset_def.py:8-219): instead of per-item ``__getitem__`` dicts fed through
worker processes, each dataset is loaded once into contiguous numpy arrays and
lives on-device for the whole run — batching is pure index arithmetic inside
``jit``. The longitudinal cohorts here are tens of MB; host↔device transfer
happens exactly once.

Label semantics preserved exactly:
* Health MNIST label columns are reordered to
  ``[time_age, disease_time, subject, gender, disease, location]``
  (iloc ``[6, 4, 0, 5, 3, 7]``, dataset_def.py:163) with NaN→0
  (``disease_time`` of healthy subjects);
* images are scaled to [0, 1] (the reference's ``transforms.ToTensor()``);
* Physionet labels get ``label[8] -= 24`` and the outcome mask appended
  (dataset_def.py:34-38).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import numpy as np

HEALTH_LABEL_ORDER = [6, 4, 0, 5, 3, 7]  # dataset_def.py:163


class ArrayDataset(NamedTuple):
    """A fully materialised longitudinal dataset.

    ``data``   — float32 ``[N, ...]`` in [0, 1]; images are ``[N, H, W, 1]``
                 (NHWC) for conv models, flat ``[N, D]`` otherwise.
    ``labels`` — float ``[N, Q]`` auxiliary covariates (reordered, NaN→0).
    ``mask``   — float32 ``[N, D]`` observation mask (1 = observed).
    """

    data: np.ndarray
    labels: np.ndarray
    mask: np.ndarray

    def __len__(self) -> int:
        return self.data.shape[0]

    @property
    def num_dim(self) -> int:
        return int(np.prod(self.data.shape[1:]))

    @property
    def num_covariates(self) -> int:
        return self.labels.shape[1]

    def flat_data(self) -> np.ndarray:
        return self.data.reshape(len(self), -1)


def _read_csv_fast(path: str, header: bool = False) -> np.ndarray:
    """Fast CSV → float array. Uses the native reader when built (utils/io)."""
    try:
        from lvae_tpu.utils.native_io import read_csv_native

        arr = read_csv_native(path, skip_header=1 if header else 0)
        if arr is not None:
            return arr
    except Exception:
        pass
    import pandas as pd

    df = pd.read_csv(path, header=0 if header else None)
    return df.to_numpy(dtype=np.float64)


def load_healthmnist(
    csv_file_data: str,
    csv_file_label: str,
    mask_file: Optional[str] = None,
    root_dir: str = ".",
    conv: bool = True,
) -> ArrayDataset:
    """Health MNIST loader (dataset_def.py:133-219 semantics)."""
    import pandas as pd

    data = _read_csv_fast(os.path.join(root_dir, csv_file_data))
    n = data.shape[0]
    label_df = pd.read_csv(os.path.join(root_dir, csv_file_label), header=0)
    labels = np.nan_to_num(
        label_df.to_numpy(dtype=np.float64)[:, HEALTH_LABEL_ORDER]
    )
    if mask_file is not None:
        mask = _read_csv_fast(os.path.join(root_dir, mask_file)).astype(np.float32)
    else:
        mask = np.ones_like(data, dtype=np.float32)
    # the reference loader casts raw CSV values through uint8 BEFORE
    # ToTensor's /255 (dataset_def.py:71 `np.array(digit, dtype='uint8')`):
    # reference-generated CSVs contain unclipped ndimage.rotate overshoot
    # (< 0 and > 255), which wraps mod 256 there — replicate the cast so
    # loading reference artifacts is byte-compatible (lvae_tpu's own
    # generator clips to 0..255, where this is a no-op)
    x = (data.astype(np.uint8) / 255.0).astype(np.float32)
    if conv:
        x = x.reshape(n, 36, 36, 1)
    return ArrayDataset(data=x, labels=labels, mask=mask)


def load_rotatedmnist(
    data_file: str,
    label_file: str,
    mask_file: Optional[str] = None,
    root_dir: str = ".",
    conv: bool = True,
) -> ArrayDataset:
    """Rotated MNIST loader (dataset_def.py:47-130 semantics): npy files."""
    data = np.load(os.path.join(root_dir, data_file))
    data = data.reshape(-1, data.shape[-1])
    label = np.load(os.path.join(root_dir, label_file))
    labels = label.reshape(label.shape[0], -1).T.astype(np.float64)
    if mask_file is not None:
        mask = np.load(os.path.join(root_dir, mask_file)).astype(np.float32)
        mask = mask.reshape(data.shape)
    else:
        mask = np.ones_like(data, dtype=np.float32)
    # exact ToTensor semantics (dataset_def.py:81): torchvision rescales
    # /255 ONLY for uint8 input; float npy arrays pass through unscaled —
    # the previous `max() > 1.5` heuristic silently rescaled 0..255-float
    # data the reference trains on raw
    if np.issubdtype(data.dtype, np.integer):
        x = (data.astype(np.uint8) / 255.0).astype(np.float32)
    else:
        x = data.astype(np.float32)
    if conv:
        x = x.reshape(-1, 28, 28, 1)
    return ArrayDataset(data=x, labels=labels, mask=mask)


def load_physionet(data_file: str, root_dir: str = ".") -> ArrayDataset:
    """Physionet 2012 loader (dataset_def.py:8-44 semantics): npz bundle."""
    bundle = np.load(os.path.join(root_dir, data_file))
    data = bundle["data_readings"].reshape(-1, bundle["data_readings"].shape[-1])
    labels = bundle["outcome_attrib"].reshape(-1, bundle["outcome_attrib"].shape[-1])
    mask = bundle["data_mask"].reshape(-1, bundle["data_mask"].shape[-1])
    label_mask = bundle["outcome_mask"].reshape(-1, bundle["outcome_mask"].shape[-1])
    labels = labels.astype(np.float64).copy()
    labels[:, 8] = labels[:, 8] - 24.0  # dataset_def.py:35
    full_labels = np.concatenate([labels, label_mask.astype(np.float64)], axis=1)
    return ArrayDataset(
        data=data.astype(np.float32),
        labels=full_labels,
        mask=mask.astype(np.float32),
    )


def load_dataset(cfg, which: str = "train", conv: Optional[bool] = None) -> Optional[ArrayDataset]:
    """Load a dataset named by config fields (mirrors LVAE.py:48-125 dispatch).

    ``which`` ∈ {train, test, prediction, validation, generation}.
    """
    prefix = {
        "train": "",
        "test": "test_",
        "prediction": "prediction_",
        "validation": "validation_",
        "generation": "generation_",
    }[which]
    if which == "train":
        data_f = cfg.csv_file_data
        label_f = cfg.csv_file_label
        mask_f = cfg.mask_file
    else:
        data_f = getattr(cfg, f"csv_file_{which}_data")
        label_f = getattr(cfg, f"csv_file_{which}_label")
        mask_f = getattr(cfg, f"{prefix}mask_file")
    if data_f is None:
        return None
    if conv is None:
        conv = cfg.type_nnet == "conv"
    if cfg.dataset_type == "HealthMNIST":
        return load_healthmnist(data_f, label_f, mask_f, cfg.data_source_path, conv=conv)
    if cfg.dataset_type == "RotatedMNIST":
        return load_rotatedmnist(data_f, label_f, mask_f, cfg.data_source_path, conv=conv)
    if cfg.dataset_type == "Physionet":
        return load_physionet(data_f, cfg.data_source_path)
    raise ValueError(f"Unknown dataset_type {cfg.dataset_type!r}")
