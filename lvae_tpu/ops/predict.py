"""Sparse-GP posterior prediction of latent trajectories.

TPU-native rebuild of the reference predictors (utils.py:115-345 in
SidRama/Longitudinal-VAE): given the training cohort's encoded latent means
``mu`` and covariates ``x``, predict latents at arbitrary query covariates
``X`` — entire unseen future timepoints or subjects — via the sparse additive
GP posterior mean

    Z_pred = K0(X,·) K0zz⁻¹ K0zx μ̃  +  K1(X,·) μ̃,
    μ̃ = Σ⁻¹ μ = (B⁻¹ − B⁻¹ K0xz H⁻¹ K0zx B⁻¹) μ,   H = K0zz + K0zx B⁻¹ K0xz.

The reference iterates Python loops over subjects for the block-diagonal
``B = K1 + σ²I`` inverse (utils.py:159-181) and over *test* subjects for the
``K1`` term (utils.py:195-207). Here both are batched block computations on
the padded ``[P, T_max]`` layout: ``K1`` is exactly block-diagonal over
subjects (every kernel1 component carries the id equality factor), so the
per-test-subject restriction becomes a gather of the aligned training block.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lvae_tpu.ops import kernels as kx
from lvae_tpu.ops import linalg as la
from lvae_tpu.ops.elbo import _full_precision


class PredictInputs(NamedTuple):
    """Block-layout inputs to :func:`gp_predict` (host-prepared, static shapes).

    Training cohort: ``xb [P, T, Q]``, ``mask [P, T]``, ``mu_b [P, T, L]``.
    Queries: ``Xb [Pq, Tq, Q]``, ``Xmask [Pq, Tq]``.
    ``align [Pq]`` — index of each query subject's block in the training
    cohort, or -1 when the subject has no training data (the K1 term is zero
    there, matching the reference's mask over prediction subjects,
    utils.py:192-207).
    """

    xb: jax.Array
    mask: jax.Array
    mu_b: jax.Array
    Xb: jax.Array
    Xmask: jax.Array
    align: jax.Array


def _cohort_fold(spec0, spec1, kp0, kp1, noise, xb, mask, mu_b, z, eps):
    """Fold the training cohort's block solves once — the shared first half
    of :func:`gp_predict` and :func:`precompute_predict_basis`.

    Returns ``(k0xz [L,P,T,M], k0zz [L,M,M], ib [L,P,T,T], ib_mu [L,P,T],
    h_nojit [L,M,M], c [L,M])`` where ``h_nojit = symmetrize(K0zz + Σ_s
    K0zx_s B_s⁻¹ K0xz_s)`` WITHOUT the f32 relative jitter (the serving
    extension applies it after its low-rank update; gp_predict applies it
    immediately) and ``c = Σ_s K0zx_s B_s⁻¹ μ_s``. K0zz carries the
    adaptive jitter (kx.add_adaptive_jitter): H inherits K0zz's rank
    deficiency — observed NaN Cholesky at trained hyperparameters
    without it.
    """
    p, t, q = xb.shape
    m_ind = z.shape[0]
    x_flat = xb.reshape(p * t, q)
    k0xz = kx.kernel_matrix(spec0, kp0, x_flat, z, mask1=mask.reshape(p * t))
    latent_dim = k0xz.shape[0]
    k0xz = k0xz.reshape(latent_dim, p, t, m_ind)
    k0zz = kx.add_adaptive_jitter(kx.kernel_matrix(spec0, kp0, z, z), eps)

    b = kx.block_b_operator(spec1, kp1, xb, mask, noise)
    _, ib = la.cholesky_and_inverse(b)

    ib_k0xz = ib @ k0xz
    h_nojit = la.symmetrize(
        k0zz + jnp.einsum("lptm,lptn->lmn", k0xz, ib_k0xz)
    )
    mu = (mu_b * mask[..., None]).transpose(2, 0, 1)  # [L, P, T]
    ib_mu = jnp.einsum("lptu,lpu->lpt", ib, mu)
    c = jnp.einsum("lptm,lpt->lm", k0xz, ib_mu)
    return k0xz, k0zz, ib, ib_mu, h_nojit, c


@_full_precision
def gp_predict(
    spec0: kx.KernelSpec,
    spec1: kx.KernelSpec,
    kp0: kx.KernelParams,
    kp1: kx.KernelParams,
    noise: jax.Array,
    inputs: PredictInputs,
    z: jax.Array,
    eps: float = 1e-6,
) -> jax.Array:
    """Posterior mean latents at the query blocks: ``[Pq, Tq, L]``.

    Fully batched over latent dims and subjects; jit-compatible
    (``batch_predict_varying_T``, utils.py:115-211, without host loops).
    """
    xb, mask, mu_b = inputs.xb, inputs.mask, inputs.mu_b
    Xb, Xmask, align = inputs.Xb, inputs.Xmask, inputs.align
    _, _, q = xb.shape
    pq, tq, _ = Xb.shape
    dtype = xb.dtype
    mask = mask.astype(dtype)
    Xmask = Xmask.astype(dtype)

    X_flat = Xb.reshape(pq * tq, q)
    Xmask_flat = Xmask.reshape(pq * tq)

    k0xz, k0zz, ib, ib_mu, h_nojit, c = _cohort_fold(
        spec0, spec1, kp0, kp1, noise, xb, mask, mu_b, z, eps
    )
    latent_dim = k0xz.shape[0]
    k0Xz = kx.kernel_matrix(spec0, kp0, X_flat, z, mask1=Xmask_flat)

    h = kx.add_rel_jitter(h_nojit)
    lh = la.cholesky(h)

    sol = la.cho_solve(lh, c[..., None])[..., 0]  # H⁻¹ K0zx B⁻¹ μ
    back = jnp.einsum("lptm,lm->lpt", k0xz, sol)  # K0xz H⁻¹ ...
    mu_tilde = ib_mu - jnp.einsum("lptu,lpu->lpt", ib, back)  # [L, P, T]

    # shared term over all queries
    d = jnp.einsum("lptm,lpt->lm", k0xz, mu_tilde)
    lk0zz = la.cholesky(k0zz)
    shared = jnp.einsum(
        "lnm,lm->ln", k0Xz, la.cho_solve(lk0zz, d[..., None])[..., 0]
    )  # [L, Pq*Tq]

    # per-subject K1 term: gather the aligned training block for each query
    has_train = (align >= 0).astype(dtype)  # [Pq]
    safe_align = jnp.maximum(align, 0)
    xb_al = xb[safe_align]  # [Pq, T, Q]
    mask_al = mask[safe_align] * has_train[:, None]
    mu_tilde_al = mu_tilde[:, safe_align] * mask_al[None]  # [L, Pq, T]

    nb = kp1.raw_scale.ndim - 1
    k1_cross = jax.vmap(
        lambda xq, mq, xt, mt: kx.kernel_matrix(spec1, kp1, xq, xt, mq, mt),
        out_axes=nb,
    )(Xb, Xmask, xb_al, mask_al)  # [L, Pq, Tq, T]
    id_term = jnp.einsum("lqat,lqt->lqa", k1_cross, mu_tilde_al)  # [L, Pq, Tq]

    z_pred = shared.reshape(latent_dim, pq, tq) + id_term
    return z_pred.transpose(1, 2, 0)  # [Pq, Tq, L]


def build_predict_inputs(
    train_labels: np.ndarray,
    train_mu: np.ndarray,
    test_labels: np.ndarray,
    id_covariate: int,
    dtype=np.float32,
) -> Tuple[PredictInputs, "np.ndarray", "np.ndarray"]:
    """Host-side packing of flat arrays into aligned prediction blocks.

    Returns ``(inputs, test_index, test_mask)`` where ``test_index/test_mask``
    map the query blocks back to flat test rows (for scattering ``Z_pred``).
    """
    from lvae_tpu.data.blocks import build_subject_blocks

    tr = build_subject_blocks(train_labels, id_covariate)
    te = build_subject_blocks(test_labels, id_covariate)
    train_pos = {float(s): i for i, s in enumerate(tr.subject_ids)}
    align = np.asarray(
        [train_pos.get(float(s), -1) for s in te.subject_ids], dtype=np.int32
    )
    xb = np.asarray(train_labels, dtype=dtype)[tr.index] * tr.mask[..., None]
    Xb = np.asarray(test_labels, dtype=dtype)[te.index] * te.mask[..., None]
    mu_b = np.asarray(train_mu, dtype=dtype)[tr.index] * tr.mask[..., None]
    inputs = PredictInputs(
        xb=jnp.asarray(xb),
        mask=jnp.asarray(tr.mask.astype(dtype)),
        mu_b=jnp.asarray(mu_b),
        Xb=jnp.asarray(Xb),
        Xmask=jnp.asarray(te.mask.astype(dtype)),
        align=jnp.asarray(align),
    )
    return inputs, te.index, te.mask


def predict_latents(
    spec0,
    spec1,
    kp0,
    kp1,
    noise,
    train_labels: np.ndarray,
    train_mu: np.ndarray,
    test_labels: np.ndarray,
    z,
    id_covariate: int,
    eps: float = 1e-6,
    mesh=None,
) -> np.ndarray:
    """Flat-array convenience wrapper: returns ``Z_pred [N_test, L]``.

    Matches the reference's ``batch_predict_varying_T`` call signature shape
    (model_test.py:137): flat covariates in, flat predicted latents out.
    With ``mesh``, the posterior runs mesh-parallel
    (parallel.mesh.sharded_gp_predict): queries and training blocks over
    'data', the per-GP algebra over 'latent'.
    """
    from lvae_tpu.data.blocks import scatter_to_flat

    inputs, te_index, te_mask = build_predict_inputs(
        train_labels, np.asarray(train_mu), test_labels, id_covariate,
        dtype=np.asarray(train_mu).dtype,
    )
    if mesh is not None:
        from lvae_tpu.parallel.mesh import sharded_gp_predict

        zb = sharded_gp_predict(
            spec0, spec1, kp0, kp1, noise, inputs, z, mesh, eps=eps
        )
    else:
        zb = gp_predict_jit()(spec0, spec1, kp0, kp1, noise, inputs, z, eps)
    return scatter_to_flat(np.asarray(zb), te_index, te_mask, test_labels.shape[0])


@functools.lru_cache(maxsize=1)
def gp_predict_jit():
    """The shared jitted :func:`gp_predict` (specs static).

    Every prediction consumer routes through this one wrapper: eager
    dispatch of the predictor's kernel/Cholesky/einsum chain costs one
    remote round trip PER OP on the attached chip, and a shared cache means
    the test/generation/serving paths reuse a single compiled program per
    shape/placement."""
    return jax.jit(gp_predict, static_argnums=(0, 1))


# ---------------------------------------------------------------------------
# Incremental serving path: precomputed basis operators + per-request
# low-rank extension. Same math as gp_predict — the shared term reduces to
#
#     shared = K0(X,z) H⁻¹ c,   H = K0zz + Σ_s K0zx_s B_s⁻¹ K0xz_s,
#     c = Σ_s K0zx_s B_s⁻¹ μ_s
#
# (substituting μ̃ = B⁻¹μ − B⁻¹K0xz H⁻¹c into d = Σ K0zx μ̃ gives
# d = K0zz H⁻¹ c, and the full path's K0zz⁻¹ d round-trip cancels exactly).
# A request that adds ONE observed subject therefore only contributes a
# rank-M update U = K0zx,new B_new⁻¹ K0xz,new to H and c_new to c — the
# O(P) per-subject block solves over the training cohort are done once at
# bundle-build time, not per request (the reference recomputes everything,
# utils.py:115-211).


class PredictBasis(NamedTuple):
    """Cohort-level operators, precomputed once for serving.

    ``h_nojit`` excludes the f32 adaptive jitter on H (it must be applied
    AFTER the request's low-rank update so the incremental path is
    bit-identical in structure to the full recompute).
    """

    h_nojit: jax.Array  # [L, M, M] K0zz(+jitter) + Σ_s K0zx_s B_s⁻¹ K0xz_s
    c: jax.Array  # [L, M]    Σ_s K0zx_s B_s⁻¹ μ_s


@_full_precision
def precompute_predict_basis(
    spec0: kx.KernelSpec,
    spec1: kx.KernelSpec,
    kp0: kx.KernelParams,
    kp1: kx.KernelParams,
    noise: jax.Array,
    xb: jax.Array,
    mask: jax.Array,
    mu_b: jax.Array,
    z: jax.Array,
    eps: float = 1e-6,
) -> PredictBasis:
    """Fold the training cohort's block solves into (H, c) once."""
    mask = mask.astype(xb.dtype)
    _, _, _, _, h_nojit, c = _cohort_fold(
        spec0, spec1, kp0, kp1, noise, xb, mask, mu_b, z, eps
    )
    return PredictBasis(h_nojit=h_nojit, c=c)


def _fold_new_subjects(spec0, spec1, kp0, kp1, noise, x_new, mask_new, mu_new, z):
    """Per-subject fold of K new subjects' blocks — the shared core of the
    per-request extension (:func:`gp_predict_extend_batch`) and the basis
    refresh (:func:`extend_predict_basis`).

    Returns ``(k0xz_n [L,K,T,M], ib_n [L,K,T,T], ib_mu [L,K,T],
    h_delta [L,M,M], c_delta [L,M])`` where ``h_delta = Σ_k K0zx_k B_k⁻¹
    K0xz_k`` and ``c_delta = Σ_k K0zx_k B_k⁻¹ μ_k`` — the exact per-subject
    terms of :func:`_cohort_fold`'s sums, so adding them to an existing
    basis equals refolding the union cohort.
    """
    k, t, q = x_new.shape
    m_ind = z.shape[0]
    x_flat = x_new.reshape(k * t, q)
    k0xz_n = kx.kernel_matrix(
        spec0, kp0, x_flat, z, mask1=mask_new.reshape(k * t)
    )
    latent_dim = k0xz_n.shape[0]
    k0xz_n = k0xz_n.reshape(latent_dim, k, t, m_ind)  # [L,K,T,M]

    # per-subject B_k = K1 + noise (unit diag on padding) — the same masked
    # block operator the trainer uses
    b_n = kx.block_b_operator(spec1, kp1, x_new, mask_new, noise)
    _, ib_n = la.cholesky_and_inverse(b_n)  # [L, K, T, T]

    ib_k0xz = ib_n @ k0xz_n  # [L, K, T, M]
    h_delta = jnp.einsum("lktm,lktn->lmn", k0xz_n, ib_k0xz)
    mu = (mu_new * mask_new[..., None]).transpose(2, 0, 1)  # [L, K, T]
    ib_mu = jnp.einsum("lktu,lku->lkt", ib_n, mu)
    c_delta = jnp.einsum("lktm,lkt->lm", k0xz_n, ib_mu)
    return k0xz_n, ib_n, ib_mu, h_delta, c_delta


@_full_precision
def extend_predict_basis(
    spec0: kx.KernelSpec,
    spec1: kx.KernelSpec,
    kp0: kx.KernelParams,
    kp1: kx.KernelParams,
    noise: jax.Array,
    basis: PredictBasis,
    x_new: jax.Array,
    mask_new: jax.Array,
    mu_new: jax.Array,
    z: jax.Array,
) -> PredictBasis:
    """Basis refresh: fold K new *training* subjects into the cohort basis.

    ``(H, c)`` are sums over subject blocks, so cohort growth is an exact
    incremental update: the returned basis equals
    :func:`precompute_predict_basis` on the union cohort at 1e-6
    (tests/test_predict.py::test_extend_basis_matches_full_refold) at
    per-refresh cost O(K) in the T×T block solves, flat in the basis cohort
    size P — no O(P) refold (VERDICT r3 item 7; the reference recomputes the
    whole chain per prediction call, utils.py:115-211).

    Contract: a subject folded into the basis is a TRAINING subject from
    then on — later requests must not re-send it as "new" to
    :func:`gp_predict_extend_batch` (H would double-count its block);
    queries about a folded subject that need the K1 own-block term go
    through :func:`gp_predict` on the grown cohort.
    """
    mask_new = mask_new.astype(x_new.dtype)
    _, _, _, h_delta, c_delta = _fold_new_subjects(
        spec0, spec1, kp0, kp1, noise, x_new, mask_new, mu_new, z
    )
    return PredictBasis(
        h_nojit=la.symmetrize(basis.h_nojit + h_delta), c=basis.c + c_delta
    )


@_full_precision
def gp_predict_extend_batch(
    spec0: kx.KernelSpec,
    spec1: kx.KernelSpec,
    kp0: kx.KernelParams,
    kp1: kx.KernelParams,
    noise: jax.Array,
    basis: PredictBasis,
    x_new: jax.Array,
    mask_new: jax.Array,
    mu_new: jax.Array,
    Xq: jax.Array,
    Xq_mask: jax.Array,
    z: jax.Array,
) -> jax.Array:
    """Posterior latents after observing K new subjects in ONE request.

    ``x_new [K, T, Q]`` / ``mask_new [K, T]`` / ``mu_new [K, T, L]`` — the
    new subjects' observed covariates and encoded latent means;
    ``Xq [K, Tq, Q]`` / ``Xq_mask [K, Tq]`` — query block k belongs to new
    subject k (its id kernel carries the K1 term) or is data-free
    (mask_new[k] all zero → shared term only). Returns ``[K, Tq, L]``.

    H gains a sum of K rank-M updates ``Σ_k K0zx_k B_k⁻¹ K0xz_k`` and c
    gains K terms — identical to the full recompute with the K subjects
    appended to the cohort (proved at 1e-6 in tests/test_predict.py), but
    per-request cost is K [L,T,T] Cholesky blocks + one [L,M,M] solve:
    ~O(K) in the block solves and FLAT in the basis-cohort size P (the
    clinic batch-scoring case the r2 serving path forced into an O(P)
    full recompute). Fixed shapes (K, T, Tq static) → AOT-compilable.
    """
    k, t, q = x_new.shape
    _, tq, _ = Xq.shape
    dtype = x_new.dtype
    mask_new = mask_new.astype(dtype)
    Xq_mask = Xq_mask.astype(dtype)

    k0xz_n, ib_n, ib_mu, h_delta, c_delta = _fold_new_subjects(
        spec0, spec1, kp0, kp1, noise, x_new, mask_new, mu_new, z
    )
    latent_dim = k0xz_n.shape[0]
    m_ind = z.shape[0]
    k0Xz = kx.kernel_matrix(
        spec0, kp0, Xq.reshape(k * tq, q), z, mask1=Xq_mask.reshape(k * tq)
    ).reshape(latent_dim, k, tq, m_ind)

    h = kx.add_rel_jitter(la.symmetrize(basis.h_nojit + h_delta))
    lh = la.cholesky(h)
    c = basis.c + c_delta

    sol = la.cho_solve(lh, c[..., None])[..., 0]  # H⁻¹ c  [L, M]
    shared = jnp.einsum("lkam,lm->lka", k0Xz, sol)  # [L, K, Tq]

    # each new subject's μ̃ block and its K1 cross-term to its own queries
    back = jnp.einsum("lktm,lm->lkt", k0xz_n, sol)
    mu_tilde_n = ib_mu - jnp.einsum("lktu,lku->lkt", ib_n, back)  # [L, K, T]
    nb = kp1.raw_scale.ndim - 1
    k1_cross = jax.vmap(
        lambda xq, mq, xt, mt: kx.kernel_matrix(spec1, kp1, xq, xt, mq, mt),
        out_axes=nb,
    )(Xq, Xq_mask, x_new, mask_new)  # [L, K, Tq, T]
    id_term = jnp.einsum("lkat,lkt->lka", k1_cross, mu_tilde_n)

    return (shared + id_term).transpose(1, 2, 0)  # [K, Tq, L]


def gp_predict_extend(
    spec0: kx.KernelSpec,
    spec1: kx.KernelSpec,
    kp0: kx.KernelParams,
    kp1: kx.KernelParams,
    noise: jax.Array,
    basis: PredictBasis,
    x_new: jax.Array,
    mask_new: jax.Array,
    mu_new: jax.Array,
    Xq: jax.Array,
    Xq_mask: jax.Array,
    z: jax.Array,
) -> jax.Array:
    """Posterior latents at ``Xq [Tq, Q]`` after observing ONE new subject.

    ``x_new [T, Q]`` / ``mask_new [T]`` / ``mu_new [T, L]`` — the new
    subject's observed covariates and encoded latent means. Queries must
    belong to that subject (its id kernel carries the K1 term) or to a
    subject with no data at all (K1 vanishes → shared term only, matching
    the full path). Queries for a subject already in the BASIS cohort are
    out of scope here — use :func:`gp_predict`, which aligns them to their
    training block. The K=1 view of :func:`gp_predict_extend_batch`.
    """
    return gp_predict_extend_batch(
        spec0, spec1, kp0, kp1, noise, basis,
        x_new[None], mask_new[None], mu_new[None], Xq[None], Xq_mask[None], z,
    )[0]
