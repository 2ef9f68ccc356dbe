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

from typing import List, NamedTuple, Optional, Sequence, Tuple

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


def bucket_boundaries(t_lens: np.ndarray, max_buckets: int) -> List[int]:
    """Choose ≤``max_buckets`` T-length caps for a ragged cohort.

    Greedy cost-balancing replacement for the reference's exact per-subject
    iteration (elbo_functions.py:219-307, utils.py:89-113 — cost ∝ Σ T_s³):
    starting from the distinct subject lengths, repeatedly merge the adjacent
    pair of caps whose merge adds the least padded-Cholesky waste
    (Σ_s∈lower (T_upper³ − T_s³)) until ≤``max_buckets`` caps remain. One
    90-timepoint stay then no longer makes 5-timepoint subjects pay 90³-shaped
    blocks. Returns sorted inclusive caps; the last equals ``max(t_lens)``.
    """
    t_lens = np.asarray(t_lens, dtype=np.int64)
    caps = sorted(set(int(t) for t in t_lens))
    if max_buckets < 1:
        raise ValueError(f"max_buckets must be >= 1, got {max_buckets}")
    # subjects per distinct length
    counts = {c: int(np.sum(t_lens == c)) for c in caps}
    # members[i] = list of (length, count) currently assigned to cap caps[i]
    members = [[(c, counts[c])] for c in caps]
    while len(caps) > max_buckets:
        best_i, best_cost = 0, None
        for i in range(len(caps) - 1):
            upper = caps[i + 1]
            cost = sum(n * (upper**3 - t**3) for t, n in members[i])
            if best_cost is None or cost < best_cost:
                best_i, best_cost = i, cost
        members[best_i + 1] = members[best_i] + members[best_i + 1]
        del caps[best_i], members[best_i]
    return caps


def bucket_subject_blocks(
    blocks: SubjectBlocks,
    max_buckets: int,
    caps: Optional[Sequence[int]] = None,
) -> List[SubjectBlocks]:
    """Partition a ragged cohort into T-length buckets (SURVEY §7 step 7).

    Each returned ``SubjectBlocks`` holds the subjects whose true length falls
    in its cap's band, padded only to that cap — the TPU-shaped replacement
    for ``minibatch_KLD_upper_bound_iter``'s per-subject Python loop
    (elbo_functions.py:219-307). Buckets are ordered by ascending cap and are
    non-empty; with one bucket (or a fixed-T cohort) this degenerates to the
    original single table. Masked padding makes every bound exact regardless
    of the cap (see ops/elbo.py masking invariants), so bucketing changes
    cost, never values.
    """
    if caps is None:
        caps = bucket_boundaries(blocks.t_lens, max_buckets)
    caps = sorted(int(c) for c in caps)
    if caps[-1] < int(blocks.t_lens.max()):
        raise ValueError(
            f"largest cap {caps[-1]} < longest subject ({blocks.t_lens.max()})"
        )
    out: List[SubjectBlocks] = []
    assigned = np.zeros(blocks.num_subjects, dtype=bool)
    for cap in caps:
        sel = (~assigned) & (blocks.t_lens <= cap)
        assigned |= sel
        rows = np.flatnonzero(sel)
        if rows.size == 0:
            continue
        out.append(
            SubjectBlocks(
                index=blocks.index[rows, :cap].copy(),
                mask=blocks.mask[rows, :cap].copy(),
                subject_ids=blocks.subject_ids[rows].copy(),
                t_lens=blocks.t_lens[rows].copy(),
            )
        )
    return out


def scatter_to_flat(
    values_b: np.ndarray, index: np.ndarray, mask: np.ndarray, n: int
) -> np.ndarray:
    """Scatter per-block values ``[P, T, ...]`` back to flat rows ``[N, ...]``.

    The block axes must LEAD (matching ``index``'s shape); trailing feature
    axes are free. Leading batch axes are not supported — pass e.g.
    ``[P, T, L]``, not ``[L, P, T]`` (ops/predict.py:203 layout).
    """
    flat_idx = index.reshape(-1)
    flat_mask = mask.reshape(-1).astype(bool)
    out = np.zeros((n,) + values_b.shape[len(index.shape):], dtype=values_b.dtype)
    vals = values_b.reshape((-1,) + values_b.shape[len(index.shape):])
    out[flat_idx[flat_mask]] = vals[flat_mask]
    return out
