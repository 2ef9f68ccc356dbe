"""Additive multi-output GP kernels as pure functions over a declarative spec.

TPU-first rebuild of the reference kernel stack (kernel_spec.py:9-69,
kernel_gen.py:9-310 and the dependency-free template GP_model.py:31-236 in
SidRama/Longitudinal-VAE). Instead of composing framework kernel *objects*
(GPyTorch ``AdditiveKernel``/``ProductKernel``/``ScaleKernel`` with
``batch_shape``), we describe the additive kernel as a static, hashable
:class:`KernelSpec` and evaluate the full ``[L, N1, N2]`` kernel stack for all
latent dimensions in one fused broadcast — ideal for XLA fusion on TPU.

Semantics (each cites the reference behaviour it reproduces):

* categorical factor: ``k(x1, x2) = 1 iff x1[col] == x2[col]``
  (kernel_spec.py:26-32);
* binary factor: ``k(x1, x2) = 1 iff x1[col] + x2[col] == 2``
  (kernel_spec.py:9-23) — also used for missing-covariate masks
  (kernel_gen.py:29-34);
* squared-exponential factor on one column with per-latent-dim lengthscale
  (kernel_spec.py:58-69, GP_model.py:55-85);
* every additive component is wrapped in a per-latent-dim positive scale
  (GPyTorch ``ScaleKernel``; GP_model.py:87-117);
* components are split into kernel0 (no id covariate) and kernel1 (id
  covariate) exactly as kernel_gen.py:97-197.

Positive parameters use the reference's own dependency-free parameterisation
(GP_model.py:16-29): ``value = exp(min_log + softplus(raw - min_log))`` with
``min_log = -16`` — a softplus-floored log-parameter that keeps values strictly
positive and numerically safe in float32.
"""

from __future__ import annotations

import math
import os
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from lvae_tpu.ops import linalg as la

MIN_LOG = -16.0
DEFAULT_SCALE = math.log(2.0)  # softplus(0), the GPyTorch ScaleKernel default
DEFAULT_LENGTHSCALE = 2.5  # kernel_spec.py:68
DEFAULT_NOISE = math.log(2.0)  # softplus(0), GPyTorch GaussianLikelihood default

# dispatch large square kernel evaluations to the fused Pallas builder
use_pallas_kernel_matrix: bool = True
# Lane-packed Pallas builder for the per-subject [L, S, T, T] block pair in
# the training step (kernels_pallas/kernel_matrix.py:block_kernel_pair_pallas).
# Default OFF: measured a wash at the sample-config shapes — in isolation
# (0.138 vs 0.139 ms) and in the real step (19.1 vs 18.9 ms/epoch) — the
# build is floored by per-op overhead, not VPU lane occupancy
# (benchmarks/README.md "lane-packed builder" entry).
use_pallas_block_pair: bool = False
# Fused B-operator chain (kernels_pallas/b_chain.py): block builds + B
# assembly + Cholesky + inverse + log|B| + tr(B⁻¹K0) in ONE kernel.
# Tri-state: None = auto (on for TPU — measured win, see B_CHAIN_AUTO_DEFAULT),
# True/False force. Env override LVAE_BCHAIN=1/0/auto for A/B without edits.
use_pallas_b_chain = None
_bchain_env = os.environ.get("LVAE_BCHAIN", "").strip().lower()
if _bchain_env in ("1", "true", "on", "yes"):
    use_pallas_b_chain = True
elif _bchain_env in ("0", "false", "off", "no"):
    use_pallas_b_chain = False
elif _bchain_env not in ("", "auto"):
    raise ValueError(
        f"LVAE_BCHAIN={os.environ['LVAE_BCHAIN']!r}: expected "
        "1/0/true/false/on/off/yes/no/auto"
    )
# what 'auto' resolves to. ON: the on-chip A/B (tools/ab_fastpaths.py,
# TPU v5e, 2026-08-19) measured the fused chain at 13.79 ms/epoch device vs
# 14.62 ms for the XLA chain on the flagship Hensman config (~6% win;
# benchmarks/README.md "fast-path A/B"). CPU/mesh traces are unaffected
# (the gate requires the TPU backend; mesh programs use the
# custom_partitioning route or pallas_suppressed()).
B_CHAIN_AUTO_DEFAULT: bool = True


class KernelComponent(NamedTuple):
    """One additive component: a product of simple factors on covariate columns.

    ``rbf_col``  — column index of the squared-exponential factor, or -1.
    ``eq_cols``  — columns compared with equality (categorical factors).
    ``and_cols`` — columns where both inputs must equal 1 (binary factors,
                   including missing-value mask columns).
    ``cat_mod``  — optional centred categorical factor ``(col, num_classes)``:
                   1 if equal else -1/(num-1) (the reference's ``CatKernelMod``,
                   kernel_spec.py:35-55, arXiv:1912.03549). ``(-1, 0)`` = none.
    ``kind``     — informational tag for introspection/serialisation.
    """

    kind: str
    rbf_col: int
    eq_cols: Tuple[int, ...]
    and_cols: Tuple[int, ...]
    cat_mod: Tuple[int, int] = (-1, 0)


class KernelSpec(NamedTuple):
    """A static, hashable description of an additive kernel.

    Safe to pass as a ``jax.jit`` static argument.
    """

    components: Tuple[KernelComponent, ...]

    @property
    def num_components(self) -> int:
        return len(self.components)

    @property
    def has_rbf(self) -> Tuple[bool, ...]:
        return tuple(c.rbf_col >= 0 for c in self.components)


class KernelParams(NamedTuple):
    """Trainable kernel hyper-parameters (a pytree).

    ``raw_scale`` and ``raw_lengthscale`` have shape ``[..., C]`` where the
    leading batch dims (typically ``[L]``, the latent dimension) replace
    GPyTorch's ``batch_shape=[latent_dim]`` (kernel_gen.py:199-310).
    Lengthscale entries of non-RBF components exist but are unused.
    """

    raw_scale: jax.Array
    raw_lengthscale: jax.Array


def constrain(raw: jax.Array, min_log: float = MIN_LOG) -> jax.Array:
    """Raw → positive value: ``exp(min_log + softplus(raw - min_log))``.

    Matches GP_model.py:22-29 / VAE.py:79-82 in the reference.
    """
    return jnp.exp(min_log + jax.nn.softplus(raw - min_log))


def unconstrain(value, min_log: float = MIN_LOG) -> jax.Array:
    """Positive value → raw parameter (inverse of :func:`constrain`)."""
    value = jnp.asarray(value)
    y = jnp.log(value) - min_log
    # softplus^{-1}(y) = log(expm1(y)); guard large y for overflow.
    inv = jnp.where(y > 30.0, y, jnp.log(jnp.expm1(jnp.clip(y, 1e-12, 30.0))))
    return min_log + inv


def init_kernel_params(
    spec: KernelSpec,
    latent_dim: Optional[int] = None,
    scale: float = DEFAULT_SCALE,
    lengthscale: float = DEFAULT_LENGTHSCALE,
    dtype=jnp.float32,
) -> KernelParams:
    """Initialise params for ``spec``; batched over ``latent_dim`` if given."""
    c = spec.num_components
    shape = (c,) if latent_dim is None else (latent_dim, c)
    raw_s = jnp.full(shape, unconstrain(scale), dtype=dtype)
    raw_l = jnp.full(shape, unconstrain(lengthscale), dtype=dtype)
    return KernelParams(raw_scale=raw_s, raw_lengthscale=raw_l)


def _component_base(
    comp: KernelComponent, x1: jax.Array, x2: jax.Array
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Data-only part of a component: discrete 0/1 matrix and squared distance.

    ``x1: [N1, Q]``, ``x2: [N2, Q]`` → ``disc: [N1, N2]`` and
    ``sqdist: [N1, N2]`` (or None when the component has no RBF factor).
    """
    dtype = x1.dtype
    disc = None
    for col in comp.eq_cols:
        d = (x1[:, col, None] == x2[None, :, col]).astype(dtype)
        disc = d if disc is None else disc * d
    for col in comp.and_cols:
        d = ((x1[:, col, None] + x2[None, :, col]) == 2.0).astype(dtype)
        disc = d if disc is None else disc * d
    if comp.cat_mod[0] >= 0:
        col, num = comp.cat_mod
        eq = x1[:, col, None] == x2[None, :, col]
        d = jnp.where(eq, 1.0, -1.0 / (num - 1)).astype(dtype)
        disc = d if disc is None else disc * d
    sqdist = None
    if comp.rbf_col >= 0:
        diff = x1[:, comp.rbf_col, None] - x2[None, :, comp.rbf_col]
        sqdist = diff * diff
    return disc, sqdist


def kernel_matrix(
    spec: KernelSpec,
    params: KernelParams,
    x1: jax.Array,
    x2: jax.Array,
    mask1: Optional[jax.Array] = None,
    mask2: Optional[jax.Array] = None,
) -> jax.Array:
    """Evaluate the additive kernel: ``K[..., N1, N2]``.

    ``...`` are the leading batch dims of ``params`` (usually ``[L]``).
    ``mask1``/``mask2`` are optional 0/1 validity vectors (``[N1]``/``[N2]``):
    rows/columns of padded (invalid) points are zeroed, which is how ragged
    per-subject series are folded into static shapes (replacing the reference's
    per-subject iteration, elbo_functions.py:264-288).

    An empty spec evaluates to zeros — matching an empty GPyTorch
    ``AdditiveKernel`` (sum over no components).

    Large square evaluations on TPU dispatch to the fused Pallas builder
    (kernels_pallas/kernel_matrix.py) — one tiled pass instead of one
    accumulator sweep per component (measured 1.7× at [32, 4000, 4000]).
    Tall-skinny shapes (N2 ≈ M) stay on XLA, where lane padding would waste
    most of the tile.
    """
    batch_shape = params.raw_scale.shape[:-1]
    if (
        use_pallas_kernel_matrix
        and len(batch_shape) == 1
        and spec.num_components > 0
        and x1.dtype == jnp.float32
        and x1.shape[0] >= 512
        and x2.shape[0] >= 512
        and jax.default_backend() == "tpu"
        and not la.pallas_suppress_active()
    ):
        from lvae_tpu.kernels_pallas.kernel_matrix import kernel_matrix_pallas

        return kernel_matrix_pallas(spec, params, x1, x2, mask1, mask2)
    n1, n2 = x1.shape[0], x2.shape[0]
    dtype = x1.dtype
    scale = constrain(params.raw_scale.astype(dtype))  # [..., C]
    ls = constrain(params.raw_lengthscale.astype(dtype))  # [..., C]
    inv2l2 = 0.5 / (ls * ls)

    out = jnp.zeros(batch_shape + (n1, n2), dtype=dtype)
    expand = (Ellipsis,) + (None, None)
    for c, comp in enumerate(spec.components):
        disc, sqdist = _component_base(comp, x1, x2)
        term = scale[..., c][expand]
        if sqdist is not None:
            term = term * jnp.exp(-sqdist * inv2l2[..., c][expand])
        if disc is not None:
            term = term * disc
        elif sqdist is None:
            # A component with no factors at all would be the constant 1 —
            # not constructible from the reference spec, but keep it sane.
            term = term * jnp.ones((n1, n2), dtype=dtype)
        out = out + term
    if mask1 is not None:
        out = out * mask1.astype(dtype)[:, None]
    if mask2 is not None:
        out = out * mask2.astype(dtype)[None, :]
    return out


def block_kernel_matrix(
    spec: KernelSpec,
    params: KernelParams,
    xb: jax.Array,
    maskb: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-subject block kernel: ``xb [P, T, Q] → K [..., P, T, T]``.

    Evaluates the kernel independently on each subject's padded time block —
    the TPU-shaped equivalent of the reference evaluating ``covar_module1`` on
    ``x_st = reshape(x, [P, T, Q])`` (elbo_functions.py:60-62) and of the
    per-subject loop in the varying-T path (elbo_functions.py:264-288).
    """
    nbatch = params.raw_scale.ndim - 1
    if maskb is None:
        f = jax.vmap(lambda x: kernel_matrix(spec, params, x, x), out_axes=nbatch)
        return f(xb)
    f = jax.vmap(
        lambda x, m: kernel_matrix(spec, params, x, x, m, m), out_axes=nbatch
    )
    return f(xb, maskb)


def _mask_col(covariate: int, covariate_missing_val: Sequence[dict]) -> Optional[int]:
    for d in covariate_missing_val:
        if d["covariate"] == covariate:
            return d["mask"]
    return None


def _make_component(
    kind: str,
    rbf_col: int,
    eq_cols: Tuple[int, ...],
    and_cols: Tuple[int, ...],
    covariate_missing_val: Sequence[dict],
) -> KernelComponent:
    """Attach missing-value mask factors (kernel_gen.py:29-34 semantics)."""
    extra_and = list(and_cols)
    for col in eq_cols + and_cols + ((rbf_col,) if rbf_col >= 0 else ()):
        m = _mask_col(col, covariate_missing_val)
        if m is not None:
            extra_and.append(m)
    return KernelComponent(
        kind=kind, rbf_col=rbf_col, eq_cols=eq_cols, and_cols=tuple(extra_and)
    )


def build_kernel_spec(
    cat_kernel: Sequence[int] = (),
    bin_kernel: Sequence[int] = (),
    sqexp_kernel: Sequence[int] = (),
    cat_int_kernel: Sequence[dict] = (),
    bin_int_kernel: Sequence[dict] = (),
    covariate_missing_val: Sequence[dict] = (),
) -> KernelSpec:
    """Single additive kernel from the config-file spec (kernel_gen.py:9-94)."""
    mv = covariate_missing_val
    comps = []
    for idx in cat_kernel:
        comps.append(_make_component("cat", -1, (idx,), (), mv))
    for idx in sqexp_kernel:
        comps.append(_make_component("rbf", idx, (), (), mv))
    for idx in bin_kernel:
        comps.append(_make_component("bin", -1, (), (idx,), mv))
    for d in cat_int_kernel:
        comps.append(
            _make_component("cat_rbf", d["cont_covariate"], (d["cat_covariate"],), (), mv)
        )
    for d in bin_int_kernel:
        comps.append(
            _make_component("bin_rbf", d["cont_covariate"], (), (d["bin_covariate"],), mv)
        )
    return KernelSpec(components=tuple(comps))


def split_kernel_spec(
    cat_kernel: Sequence[int] = (),
    bin_kernel: Sequence[int] = (),
    sqexp_kernel: Sequence[int] = (),
    cat_int_kernel: Sequence[dict] = (),
    bin_int_kernel: Sequence[dict] = (),
    covariate_missing_val: Sequence[dict] = (),
    id_covariate: int = 0,
) -> Tuple[KernelSpec, KernelSpec]:
    """(kernel0 without the id covariate, kernel1 with it) — kernel_gen.py:97-197.

    kernel1 collects every component that involves the subject-id covariate as
    a categorical factor; kernel1 is therefore block-diagonal over subjects,
    which is what makes the per-subject T×T factorisation exact.
    """
    mv = covariate_missing_val
    k0, k1 = [], []
    for idx in cat_kernel:
        comp = _make_component("cat", -1, (idx,), (), mv)
        (k1 if idx == id_covariate else k0).append(comp)
    for idx in sqexp_kernel:
        k0.append(_make_component("rbf", idx, (), (), mv))
    for idx in bin_kernel:
        k0.append(_make_component("bin", -1, (), (idx,), mv))
    for d in cat_int_kernel:
        comp = _make_component(
            "cat_rbf", d["cont_covariate"], (d["cat_covariate"],), (), mv
        )
        (k1 if d["cat_covariate"] == id_covariate else k0).append(comp)
    for d in bin_int_kernel:
        k0.append(
            _make_component("bin_rbf", d["cont_covariate"], (), (d["bin_covariate"],), mv)
        )
    return KernelSpec(components=tuple(k0)), KernelSpec(components=tuple(k1))


def add_adaptive_jitter(kzz: jax.Array, eps: float) -> jax.Array:
    """``K(z,z) + ε_eff·I`` — the training/serving inducing-matrix jitter.

    The reference uses a fixed float64 eps (LVAE.py:24). K0zz is frequently
    rank-deficient by construction (an RBF over a covariate with few distinct
    values duplicates inducing rows), and in float32 a 1e-6 jitter leaves
    K0zz⁻¹ entries ~1e5 that destabilise the natural-gradient feedback loop —
    so f32 floors the jitter relative to the kernel's scale
    (``max(eps, 3e-4·mean diag)``); f64 keeps the exact reference value.
    Single definition shared by the training loss (elbo.gp_block_operators),
    the predictor (predict.gp_predict) and the serving basis
    (predict.precompute_predict_basis) so train/serve stay bit-consistent.
    """
    m = kzz.shape[-1]
    dtype = kzz.dtype
    if dtype == jnp.float32:
        # eye-masked diag mean: jnp.diagonal's VJP is a scatter-add into a
        # fresh [L,M,M] cotangent (this sits in the kernel-hyperparameter
        # gradient path every training step); the masked sum back-propagates
        # as a fused elementwise multiply. Same value — the off-diagonal
        # summands are exact zeros.
        eye = jnp.eye(m, dtype=dtype)
        diag_mean = jnp.sum(kzz * eye) / (kzz.size // m)
        eps_eff = jnp.maximum(jnp.asarray(eps, dtype), 3e-4 * diag_mean)
    else:
        eps_eff = jnp.asarray(eps, dtype)
    return kzz + eps_eff * jnp.eye(m, dtype=dtype)


def add_rel_jitter(h: jax.Array, rel: float = 3e-4) -> jax.Array:
    """f32-only relative diagonal jitter for derived operators.

    Applied to ``H = K0zz + Σ_s K0zx_s B_s⁻¹ K0xz_s`` AFTER the sum (it
    inherits K0zz's rank deficiency; observed NaN Cholesky at trained
    hyperparameters) — unlike :func:`add_adaptive_jitter` there is no
    ``max(eps, ·)`` floor because the operator already carries K0zz's
    jitter. Shared by the full predictor and the low-rank serving extension
    so the two paths keep agreeing. f64 is a no-op (reference precision).
    """
    if h.dtype != jnp.float32:
        return h
    m = h.shape[-1]
    eye = jnp.eye(m, dtype=h.dtype)
    # eye-masked diag mean — scatter-free VJP, see add_adaptive_jitter
    diag_mean = jnp.sum(h * eye) / (h.size // m)
    return h + (rel * diag_mean) * eye


def block_b_operator(
    spec1: KernelSpec,
    kp1: KernelParams,
    xb: jax.Array,
    mask: jax.Array,
    noise: jax.Array,
    k1_st: Optional[jax.Array] = None,
) -> jax.Array:
    """``B = K1 + σ²I`` per subject block ``[L, P, T, T]``.

    σ_l² on real samples, unit pivot on padding (⇒ logdet offset 0) — the
    blocked form of the reference's ``K1 + noise·I`` (elbo_functions.py
    ``minibatch_KLD_upper_bound``'s B). Pass ``k1_st`` when the caller
    already built the block stack (e.g. via the Pallas pair builder).
    """
    t = xb.shape[1]
    dtype = xb.dtype
    if k1_st is None:
        k1_st = block_kernel_matrix(spec1, kp1, xb, mask)
    diag = mask[None] * noise[:, None, None] + (1.0 - mask)[None]
    return k1_st + diag[..., None] * jnp.eye(t, dtype=dtype)


def join_specs(
    spec0: KernelSpec,
    spec1: KernelSpec,
    kp0: KernelParams,
    kp1: KernelParams,
) -> Tuple[KernelSpec, KernelParams]:
    """Concatenate the split kernels back into one additive kernel.

    Used by the exact-GP paths, which evaluate ``covar_module0 +
    covar_module1`` jointly (LVAE.py:195-196, model_test.py:70), and by the
    closed-form KL (KL_closed receives the full prior, training.py:499-513).
    """
    spec = KernelSpec(components=spec0.components + spec1.components)
    params = KernelParams(
        raw_scale=jnp.concatenate([kp0.raw_scale, kp1.raw_scale], axis=-1),
        raw_lengthscale=jnp.concatenate(
            [kp0.raw_lengthscale, kp1.raw_lengthscale], axis=-1
        ),
    )
    return spec, params
