"""Data layer: generators, array-backed datasets, subject blocking."""

from lvae_tpu.data.datasets import (  # noqa: F401
    ArrayDataset,
    load_healthmnist,
    load_physionet,
    load_rotatedmnist,
)
from lvae_tpu.data.blocks import SubjectBlocks, build_subject_blocks  # noqa: F401
