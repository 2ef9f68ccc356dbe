"""Data-layer tests: generator semantics, loaders, subject blocking."""

import os

import numpy as np
import pytest

from lvae_tpu.data import blocks as bl
from lvae_tpu.data import healthmnist as hm
from lvae_tpu.data.datasets import load_healthmnist


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hm"))
    data, masked, mask, labels = hm.generate_healthmnist(
        num_3=3, num_6=3, missing=25.0, seed=0, destination=d
    )
    return d, data, masked, mask, labels


def test_generator_shapes_and_labels(cohort):
    d, data, masked, mask, labels = cohort
    assert data.shape == (6 * 20, 1296)
    assert list(labels.columns) == [
        "subject", "digit", "angle", "disease",
        "disease_time", "gender", "time_age", "location",
    ]
    # 20 timepoints per subject, time_age 0..19
    assert (labels.groupby("subject").size() == 20).all()
    np.testing.assert_array_equal(
        labels["time_age"].to_numpy()[:20], np.arange(20)
    )
    # healthy subjects have NaN disease_time (Health_MNIST_generate.py:153)
    healthy = labels[labels["disease"] == 0]
    if len(healthy):
        assert healthy["disease_time"].isna().all()
    sick = labels[labels["disease"] == 1]
    if len(sick):
        assert not sick["disease_time"].isna().any()
    # digit 3 → gender 0, digit 6 → gender 1
    assert (labels[labels["digit"] == "3"]["gender"] == 0).all()
    assert (labels[labels["digit"] == "6"]["gender"] == 1).all()


def test_generator_rotation_trajectory(cohort):
    """Sick subjects' rotation spans ~0→45°; healthy stays near 5°."""
    _, _, _, _, labels = cohort
    for sid, grp in labels.groupby("subject"):
        ang = grp["angle"].to_numpy()
        if grp["disease"].iloc[0] == 1:
            assert ang[-1] - ang[0] > 20  # sigmoid ramp
        else:
            assert abs(np.mean(ang) - 5.0) < 3.0


def test_mask_missing_fraction(cohort):
    _, data, masked, mask, _ = cohort
    frac = 1.0 - mask.mean()
    assert 0.2 < frac < 0.3
    np.testing.assert_array_equal(masked, data * mask)


def test_loader_roundtrip(cohort):
    d, data, masked, mask, labels = cohort
    ds = load_healthmnist(
        "health_MNIST_data.csv", "health_MNIST_label.csv", "mask.csv",
        root_dir=d, conv=True,
    )
    assert ds.data.shape == (120, 36, 36, 1)
    assert ds.data.max() <= 1.0
    np.testing.assert_allclose(
        ds.flat_data() * 255.0, data.astype(np.float32), atol=0.5
    )
    # label reorder [time_age, disease_time, subject, gender, disease, location]
    assert ds.labels.shape == (120, 6)
    np.testing.assert_array_equal(ds.labels[:, 0][:20], np.arange(20))
    np.testing.assert_array_equal(ds.labels[:, 2], labels["subject"].to_numpy())
    assert np.isfinite(ds.labels).all()  # NaN disease_time → 0


def test_native_reader_matches_pandas(cohort):
    from lvae_tpu.utils.native_io import native_available, read_csv_native

    if not native_available():
        pytest.skip("native IO library not built")
    d, data, *_ = cohort
    import pandas as pd

    p = os.path.join(d, "health_MNIST_data.csv")
    got = read_csv_native(p)
    want = pd.read_csv(p, header=None).to_numpy(dtype=np.float64)
    np.testing.assert_array_equal(got, want)


def test_native_reader_empty_and_nan_fields(tmp_path):
    """Trailing-empty fields must NOT swallow the next row's first value
    (strtod's whitespace skip crosses newlines); ',,' and 'nan' parse to
    NaN, matching pandas."""
    from lvae_tpu.utils.native_io import native_available, read_csv_native

    if not native_available():
        pytest.skip("native IO library not built")
    import pandas as pd

    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("1.0,2.0,\n4.0,,6.0\nnan,8.0,9.0\n")
    got = read_csv_native(p)
    want = pd.read_csv(p, header=None).to_numpy(dtype=np.float64)
    assert got.shape == want.shape == (3, 3)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_array_equal(np.nan_to_num(got), np.nan_to_num(want))


def test_subject_blocks_ragged():
    labels = np.zeros((7, 3))
    labels[:, 1] = [5, 5, 5, 9, 9, 2, 2]  # subjects 5 (T=3), 9 (T=2), 2 (T=2)
    blocks = bl.build_subject_blocks(labels, id_covariate=1)
    assert blocks.num_subjects == 3 and blocks.t_max == 3
    np.testing.assert_array_equal(blocks.subject_ids, [5, 9, 2])
    np.testing.assert_array_equal(blocks.t_lens, [3, 2, 2])
    np.testing.assert_array_equal(blocks.index[0], [0, 1, 2])
    np.testing.assert_array_equal(blocks.mask[1], [1, 1, 0])


def test_scatter_roundtrip():
    labels = np.zeros((7, 1))
    labels[:, 0] = [0, 0, 0, 1, 1, 2, 2]
    blocks = bl.build_subject_blocks(labels, id_covariate=0)
    vals = np.arange(7, dtype=np.float64)[:, None] * 10
    gathered = vals[blocks.index] * blocks.mask[..., None]
    back = bl.scatter_to_flat(gathered, blocks.index, blocks.mask, 7)
    np.testing.assert_array_equal(back, vals)


def test_generate_split_writes_named_cohorts(tmp_path):
    """generate_split: one reference-format CSV cohort per named split."""
    from lvae_tpu.data.healthmnist import generate_split

    out = generate_split(
        str(tmp_path), num_3=2, num_6=2, missing=25.0, seed=0,
        splits=(("train", 1.0), ("validation", 0.5)),
    )
    assert set(out) == {"train", "validation"}
    for name in ("train", "validation"):
        assert os.path.exists(tmp_path / f"health_MNIST_data_{name}.csv")
        assert os.path.exists(tmp_path / f"health_MNIST_label_{name}.csv")
        assert os.path.exists(tmp_path / f"mask_{name}.csv")
    # validation split is half the subjects → half the rows
    n_train = len(open(tmp_path / "health_MNIST_data_train.csv").readlines())
    n_val = len(open(tmp_path / "health_MNIST_data_validation.csv").readlines())
    assert n_val == n_train // 2


def test_step_timer_fences_device_work():
    """StepTimer: wall-clock timing with block_until_ready fencing."""
    import jax.numpy as jnp

    from lvae_tpu.utils.metrics import StepTimer

    timer = StepTimer()
    out = timer.time(lambda x: (x * 2).sum(), jnp.arange(100.0))
    assert float(out) == float(jnp.arange(100.0).sum() * 2)
    assert len(timer.times) == 1 and timer.median_ms >= 0


def _write_digit_dir(root, n_per_digit=4):
    """Tiny synthetic --source tree in the reference layout: <root>/<digit>/*.jpg."""
    from PIL import Image

    rng = np.random.default_rng(7)
    for digit in ("3", "6"):
        d = os.path.join(root, digit)
        os.makedirs(d, exist_ok=True)
        for i in range(n_per_digit):
            img = np.zeros((28, 28), np.uint8)
            # a distinct blob per instance so instances are tellable apart
            r, c = 4 + 3 * i, 6 + 2 * i
            img[r : r + 8, c : c + 8] = 200 + i * 10
            img[10:18, 10:13] = 120 if digit == "3" else 250
            Image.fromarray(img, mode="L").save(os.path.join(d, f"img{i:02d}.jpg"))
    return root


def test_generate_with_source_uses_real_instances(tmp_path):
    """--source ingests real digit files (Health_MNIST_generate.py:104-125):
    per-subject base images come from the files, differ across subjects, and
    differ from the procedural-template output."""
    src = _write_digit_dir(str(tmp_path / "mnist"), n_per_digit=3)
    data, _, _, labels = hm.generate_healthmnist(
        num_3=2, num_6=2, missing=0.0, seed=0, source=src
    )
    proc, _, _, _ = hm.generate_healthmnist(num_3=2, num_6=2, missing=0.0, seed=0)
    assert data.shape == proc.shape
    assert not np.array_equal(data, proc)  # real files, not glyph templates
    # subjects drew DIFFERENT instance files: compare each subject's first
    # frame (same timepoint, so same rotation stats)
    frames = data.reshape(4, 20, -1)[:, 0]
    assert not np.array_equal(frames[0], frames[1])
    # offset slicing gives disjoint instances
    d2, _, _, _ = hm.generate_healthmnist(
        num_3=1, num_6=1, missing=0.0, seed=0, source=src, source_offset=2
    )
    assert not np.array_equal(d2[:20], data[:20])


def test_generate_with_source_through_cli(tmp_path):
    from lvae_tpu.cli import main as cli_main

    src = _write_digit_dir(str(tmp_path / "mnist"), n_per_digit=2)
    dest = str(tmp_path / "out")
    rc = cli_main([
        "generate", f"--source={src}", f"--destination={dest}",
        "--num_3=2", "--num_6=2", "--missing=25",
    ])
    assert rc == 0
    arr = np.loadtxt(os.path.join(dest, "health_MNIST_data.csv"), delimiter=",")
    assert arr.shape == (80, 1296)
    # instances came from the files: subjects differ at the same timepoint
    subj = arr.reshape(4, 20, -1)
    assert not np.array_equal(subj[0, 0], subj[1, 0])


def test_generate_source_missing_files_errors(tmp_path):
    src = _write_digit_dir(str(tmp_path / "mnist"), n_per_digit=1)
    with pytest.raises(FileNotFoundError, match="source"):
        hm.generate_healthmnist(num_3=5, num_6=1, source=src)


def test_generate_split_source_draws_disjoint_instances(tmp_path, monkeypatch):
    """Each split must ingest DISJOINT real digit files — a model memorizing
    train instances must never meet them again in the test split (the
    reference achieves this by separate Health_MNIST_generate invocations
    with distinct sources)."""
    src = _write_digit_dir(str(tmp_path / "mnist"), n_per_digit=4)
    calls = []
    orig = hm._load_source_images

    def spy(source, digit, count, offset=0):
        calls.append((str(digit), int(count), int(offset)))
        return orig(source, digit, count, offset)

    monkeypatch.setattr(hm, "_load_source_images", spy)
    hm.generate_split(
        str(tmp_path / "out"), num_3=4, num_6=4, missing=0.0, seed=0,
        splits=(("train", 0.5), ("test", 0.5)), source=src,
    )
    by_digit = {}
    for digit, count, offset in calls:
        by_digit.setdefault(digit, []).append((offset, count))
    assert set(by_digit) == {"3", "6"}
    for digit, oc in by_digit.items():
        ranges = sorted(oc)
        assert len(ranges) == 2, (digit, ranges)
        for (o1, c1), (o2, _c2) in zip(ranges, ranges[1:]):
            assert o1 + c1 <= o2, f"digit {digit} splits overlap: {ranges}"


def test_loader_uint8_wrap_parity(tmp_path):
    """Reference-generated CSVs carry UNclipped ndimage.rotate overshoot
    (Health_MNIST_generate.py writes fmt='%d' without clipping); the
    reference loader wraps them through uint8 (dataset_def.py:71
    ``np.array(digit, dtype='uint8')``: -5 -> 251, 260 -> 4). The rebuild's
    loader must be byte-compatible on such artifacts."""
    import pandas as pd

    vals = np.zeros((2, 1296))
    vals[0, 0], vals[0, 1], vals[1, 2] = -5, 260, 255
    np.savetxt(tmp_path / "d.csv", vals, fmt="%d", delimiter=",")
    labels = pd.DataFrame(
        {
            "Unnamed: 0": [0, 1], "age": [0.0, 1.0], "digit": ["3", "3"],
            "gender": [0, 0], "id": [0, 0], "diagnosis": [0, 0],
            "angle": [0.0, 0.0], "location": [0, 0], "disease_time": [0, 0],
        }
    )
    labels.to_csv(tmp_path / "l.csv", index=False)
    ds = load_healthmnist("d.csv", "l.csv", None, root_dir=str(tmp_path), conv=False)
    np.testing.assert_allclose(ds.data[0, 0], 251 / 255.0, atol=1e-7)
    np.testing.assert_allclose(ds.data[0, 1], 4 / 255.0, atol=1e-7)
    np.testing.assert_allclose(ds.data[1, 2], 255 / 255.0, atol=1e-7)
