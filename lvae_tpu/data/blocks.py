"""Subject blocking: static-shape batching over longitudinal subjects.

TPU-native replacement for the reference's sampler zoo (utils.py:9-113:
``SubjectSampler``, ``VaryingLengthSubjectSampler``,
``VaryingLengthBatchSampler``, ``HensmanDataLoader``). Instead of Python
iterators feeding worker processes, we precompute a padded index table
``[P, T_max]`` once per dataset; an epoch is a host-side subject permutation
reshaped into ``[n_batches, S, T_max]`` gather indices, and every batch has
the same static shape — ragged subjects are padded and masked (mask semantics
consumed by ``lvae_tpu.ops.elbo``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np


class SubjectBlocks(NamedTuple):
    """Padded per-subject sample-index table for one dataset.

    ``index [P, T_max]`` — row indices into the flat dataset (0 on padding),
    ``mask  [P, T_max]`` — 1 where the slot holds a real sample,
    ``subject_ids [P]``  — subject id value per block row (first-appearance
                           order, matching utils.py:61-87),
    ``t_lens [P]``       — true number of samples per subject.
    """

    index: np.ndarray
    mask: np.ndarray
    subject_ids: np.ndarray
    t_lens: np.ndarray

    @property
    def num_subjects(self) -> int:
        return self.index.shape[0]

    @property
    def t_max(self) -> int:
        return self.index.shape[1]


def build_subject_blocks(
    labels: np.ndarray,
    id_covariate: int,
    t_max: Optional[int] = None,
) -> SubjectBlocks:
    """Group sample rows by the id covariate, in order of first appearance."""
    ids = np.asarray(labels)[:, id_covariate]
    order: dict = {}
    members: list = []
    for i, s in enumerate(ids):
        key = float(s)
        if key not in order:
            order[key] = len(members)
            members.append([])
        members[order[key]].append(i)
    p = len(members)
    t_lens = np.asarray([len(m) for m in members], dtype=np.int32)
    if t_max is None:
        t_max = int(t_lens.max())
    elif t_max < t_lens.max():
        raise ValueError(f"t_max={t_max} < longest subject ({t_lens.max()})")
    index = np.zeros((p, t_max), dtype=np.int32)
    mask = np.zeros((p, t_max), dtype=np.float32)
    for r, m in enumerate(members):
        index[r, : len(m)] = m
        mask[r, : len(m)] = 1.0
    subject_ids = np.asarray([float(ids[m[0]]) for m in members])
    return SubjectBlocks(index=index, mask=mask, subject_ids=subject_ids, t_lens=t_lens)


def epoch_batches(
    blocks: SubjectBlocks,
    subjects_per_batch: int,
    rng: Optional[np.random.Generator] = None,
    shuffle: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One epoch of subject-wise batches with static shapes.

    Returns ``(index [B, S, T_max], mask [B, S, T_max], p_batch [B])`` where
    the final batch is padded with fully-masked ghost subjects so every batch
    is the same shape — the masked bounds make ghosts contribute exactly zero,
    and ``p_batch`` carries the true subject count for the P/P_batch scaling
    (training.py:111-118).
    """
    p = blocks.num_subjects
    s = subjects_per_batch
    n_batches = (p + s - 1) // s
    perm = np.arange(p)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(perm)
    pad = n_batches * s - p
    perm_padded = np.concatenate([perm, np.zeros(pad, dtype=perm.dtype)])
    idx = blocks.index[perm_padded].reshape(n_batches, s, blocks.t_max)
    msk = blocks.mask[perm_padded].reshape(n_batches, s, blocks.t_max).copy()
    p_batch = np.full((n_batches,), s, dtype=np.int32)
    if pad:
        msk[-1, s - pad :] = 0.0
        p_batch[-1] = s - pad
    return idx, msk, p_batch


def scatter_to_flat(
    values_b: np.ndarray, index: np.ndarray, mask: np.ndarray, n: int
) -> np.ndarray:
    """Scatter per-block values ``[..., P, T, D]`` back to flat rows ``[N, D]``."""
    flat_idx = index.reshape(-1)
    flat_mask = mask.reshape(-1).astype(bool)
    out = np.zeros((n,) + values_b.shape[len(index.shape):], dtype=values_b.dtype)
    vals = values_b.reshape((-1,) + values_b.shape[len(index.shape):])
    out[flat_idx[flat_mask]] = vals[flat_mask]
    return out
