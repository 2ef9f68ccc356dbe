"""VAE encoder/decoder families (flax.linen), NHWC, TPU-friendly.

Rebuild of the reference models (VAE.py:16-273 in SidRama/Longitudinal-VAE):

* :class:`ConvVAE` — for 36×36 imaging data: conv16→pool→conv32→pool→
  FC 2592→300→30→latent, mirrored decoder with two stride-2 transposed
  convolutions and a sigmoid output (VAE.py:44-124). Channel-wise spatial
  dropout (torch ``Dropout2d``) becomes ``Dropout(broadcast_dims=(1, 2))``
  over NHWC.
* :class:`SimpleVAE` — MLP num_dim→300→30→latent and mirror (VAE.py:191-235).

Both carry a learnable per-pixel observation noise ``vy`` parameterised as a
softplus-floored log-variance with floor ``exp(-8)`` (VAE.py:32-42, 79-88).

Layout notes (TPU): images are NHWC ``[N, 36, 36, 1]`` (torch is NCHW); convs
and the big FC layers run on the MXU in the model's compute dtype (f32 by
default, bf16 optional for throughput).
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

MIN_LOG_VY = -8.0


def _vy_init_raw(vy_init: float, dtype) -> jnp.ndarray:
    """raw = log(vy_init - exp(min_log_vy)) (VAE.py:34)."""
    return jnp.asarray(math.log(vy_init - math.exp(MIN_LOG_VY)), dtype=dtype)


def floored_log_vy(raw_log_vy: jax.Array) -> jax.Array:
    """``min + softplus(raw - min)`` — the floored log observation variance."""
    return MIN_LOG_VY + jax.nn.softplus(raw_log_vy - MIN_LOG_VY)


# 2x2/stride-2 max pooling as reshape+max instead of lax.reduce_window.
# Forward-identical (windows don't overlap); the BACKWARD lowers to fused
# compare/multiply ops instead of TPU select-and-scatter, which the measured
# epoch profile showed costing 8.4% of device time (tools/measure_roofline.py,
# r3). MEASURED NEGATIVE on the v5e: the reshape variant's backward emits
# 2.3x the HBM traffic of select-and-scatter and the epoch slows 13.5 ->
# 15.8 ms device time, so the default stays off (A/B: tools/bench_maxpool
# note in benchmarks/README.md). Subgradient choice on ties differs (even
# split vs single winner) — both valid; forward torch parity is unaffected.
# Env override LVAE_RESHAPE_POOL=0/1 for on-chip A/B without source churn.
# RE-MEASURED at P=1000/bf16 (r5, where select-and-scatter is 8.3 % of the
# device budget): STILL negative — P=200 12.87 → 14.64 ms wall, P=1000
# 44.35 → 44.69 (device 43.80 → 44.15, HBM 7.45 → 9.07 GB/epoch): the
# reshape backward's extra traffic eats the select-and-scatter saving at
# both scales (tools/ab_fastpaths.py --arms default,rpool, 2026-08-20).
use_reshape_max_pool: bool = False
_rp_env = os.environ.get("LVAE_RESHAPE_POOL", "").strip().lower()
if _rp_env in ("1", "true", "on"):
    use_reshape_max_pool = True
elif _rp_env in ("0", "false", "off"):
    use_reshape_max_pool = False
elif _rp_env:
    raise ValueError(
        f"LVAE_RESHAPE_POOL={os.environ['LVAE_RESHAPE_POOL']!r}: expected 0/1"
    )


def _max_pool_2x2(h: jax.Array) -> jax.Array:
    if not use_reshape_max_pool:
        return nn.max_pool(h, (2, 2), strides=(2, 2))
    n, hh, ww, c = h.shape
    return h.reshape(n, hh // 2, 2, ww // 2, 2, c).max(axis=(2, 4))


# Space-to-depth conv formulation. The reference topology's channel counts
# (1→16→32 encoder, 32→16→1 decoder) leave the 128-wide MXU lanes almost
# empty: conv1 contracts K=3·3·1=9 of 128, deconv2 emits N=1 of 128. Working
# on 2×2-block space-to-depth layouts with exactly-rearranged weights turns
# every conv into a denser one (conv2+pool2 becomes K=576, N=128 — full
# lanes) and makes each 2×2 max-pool a free channel-axis max (no
# reduce_window forward, no select-and-scatter backward). Same math modulo
# f32 summation order; tie-breaking of max subgradients differs (even split
# vs single winner), as with use_reshape_max_pool. None = auto (TPU only,
# where the MXU geometry is the point); True/False force for A/B and tests.
# Env override for A/B without source edits (which would churn the AOT-cache
# source digest): LVAE_S2D=0/1/auto.
use_s2d_convs: Optional[bool] = None
_s2d_env = os.environ.get("LVAE_S2D", "").strip().lower()
if _s2d_env in ("1", "true", "on", "yes"):
    use_s2d_convs = True
elif _s2d_env in ("0", "false", "off", "no"):
    use_s2d_convs = False
elif _s2d_env not in ("", "auto"):
    raise ValueError(
        f"LVAE_S2D={os.environ['LVAE_S2D']!r}: expected 1/0/true/false/on/off/yes/no/auto"
    )


# what 'auto' (None) resolves to on the TPU backend. OFF by measurement:
# the on-chip A/B (tools/ab_fastpaths.py, TPU v5e, 2026-08-19) found the
# s2d formulation SLOWER on the flagship Hensman epoch — 16.97 ms device vs
# 14.62 ms baseline (and 16.24 vs 13.79 with the fused B-chain on): the
# rearranged conv2/deconv FLOPs (99→216 G modeled) cost more than the
# select-and-scatter pool backward they remove. Kept as an opt-in
# (LVAE_S2D=1) for conv-dominated workloads; numbers in
# benchmarks/README.md "fast-path A/B".
S2D_AUTO_DEFAULT: bool = False


def _s2d_active() -> bool:
    if use_s2d_convs is None:
        return S2D_AUTO_DEFAULT and jax.default_backend() == "tpu"
    return bool(use_s2d_convs)


# bf16 VAE compute as a SCALE-GATED default (VERDICT r4 item 2). The on-chip
# dtype A/B (tools/ab_fastpaths.py arms, benchmarks/README.md "fast-path A/B
# round 9") measured bf16 conv/dense compute NEUTRAL at P=200 (4k frame rows;
# the epoch is op-latency-bound — halved HBM bytes buy nothing, convert ops
# add executions, 13.44 → 13.45 ms) and a 16 % WIN at P=1000 (20k rows; the
# epoch is conv-HBM-bound — 68.85 → 57.95 ms, composed with the flat gather
# 46.0 ms / 434k samples/s). Accuracy-validated at bf16 for all three
# regimes with armed asserts (hensman 0.01055 / gppvae 0.01556 / vi 0.01286
# vs paper 0.025±0.0015). So the auto default mirrors the flat gather's
# shape-keyed gate (train/hensman.FLATGATHER_MIN_ROWS — same two measured
# scales bracket the same threshold): bf16 VAE compute when the frame table
# has >= MODEL_BF16_MIN_ROWS rows AND the base dtype is f32 AND the backend
# is TPU (CPU emulates bf16 — strictly slower; tests/f64 oracles keep their
# dtype). GP algebra stays f32 under default_matmul_precision('highest')
# regardless (the ops/elbo.py invariant) — only conv/dense VAE compute
# moves, params stay f32. Explicit override both ways: config
# ``model_dtype`` ('float32' pins f32, 'bfloat16' pins bf16) or env
# LVAE_MODEL_BF16=0/1.
use_bf16_model: Optional[bool] = None
MODEL_BF16_MIN_ROWS = 10_000  # 4k rows measured neutral, 20k rows −16 %
_bf16_env = os.environ.get("LVAE_MODEL_BF16", "").strip().lower()
if _bf16_env in ("1", "true", "on"):
    use_bf16_model = True
elif _bf16_env in ("0", "false", "off"):
    use_bf16_model = False
elif _bf16_env:
    raise ValueError(
        f"LVAE_MODEL_BF16={os.environ['LVAE_MODEL_BF16']!r}: expected 0/1"
    )


def auto_model_dtype(n_rows: int, base_dtype=jnp.float32):
    """Resolve the VAE compute dtype for an ``n_rows``-frame cohort.

    The shipped default when no explicit ``model_dtype`` is configured:
    bf16 above the measured row threshold on TPU, the base dtype otherwise
    (see the gate comment above for the A/B provenance)."""
    if use_bf16_model is not None:
        want = use_bf16_model
    else:
        want = (
            n_rows >= MODEL_BF16_MIN_ROWS
            and jax.default_backend() == "tpu"
        )
    if want and base_dtype == jnp.float32:
        return jnp.bfloat16
    return base_dtype


def _space_to_depth(x: jax.Array) -> jax.Array:
    """[N, H, W, C] → [N, H/2, W/2, 4C]; channel order ((a, b), c), a/b = the
    pixel's position inside its 2×2 block."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def _depth_to_space(x: jax.Array, c_out: int) -> jax.Array:
    """Inverse of :func:`_space_to_depth`: [N, H, W, 4C] → [N, 2H, 2W, C]."""
    n, h, w, _ = x.shape
    x = x.reshape(n, h, w, 2, 2, c_out).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, 2 * h, 2 * w, c_out)


def _conv3_taps():
    """Static tap map for the stride-1 SAME 3×3 conv in block coordinates.

    Output pixel ``2I+p`` reads input row ``2(I+Bi)+a`` through original tap
    ``di = 2·Bi + a − p + 1`` (valid iff 0 ≤ di ≤ 2), for block offset
    ``Bi ∈ {−1,0,1}`` and in-block positions ``a, p ∈ {0,1}``.
    """
    bi = np.arange(3)[:, None, None] - 1
    a = np.arange(2)[None, :, None]
    p = np.arange(2)[None, None, :]
    d = 2 * bi + a - p + 1  # [3, 2, 2] indexed [bi, a, p]
    ok = (d >= 0) & (d <= 2)
    return np.clip(d, 0, 2), ok


def _deconv4_taps():
    """Static tap map for flax ``ConvTranspose((4,4), strides=2, SAME)``.

    Its output obeys ``y[r] = Σ_i x[i] · w[2 − (r − 2i)]`` (verified against
    flax 0.12 by delta probing); with ``r = 2I + p`` and ``i = I + Bi`` the
    original tap is ``k = 2 − (p − 2·Bi)``, valid iff 0 ≤ k ≤ 3.
    """
    bi = np.arange(3)[:, None] - 1
    p = np.arange(2)[None, :]
    k = 2 - (p - 2 * bi)  # [3, 2] indexed [Bi, p]
    ok = (k >= 0) & (k <= 3)
    return np.clip(k, 0, 3), ok


_CONV3_TAPS = _conv3_taps()
_DECONV4_TAPS = _deconv4_taps()


def _s2d_conv3_kernel(w: jax.Array) -> jax.Array:
    """Rearrange ``w [3,3,cin,cout]`` to ``W [3,3,4·cin,4·cout]`` such that
    ``conv(s2d(x), W, SAME) == s2d(conv(x, w, SAME))`` exactly."""
    cin, cout = w.shape[2], w.shape[3]
    dc, ok = _CONV3_TAPS
    wf = w[dc[:, :, :, None, None, None], dc[None, None, None]]
    mask = ok[:, :, :, None, None, None] & ok[None, None, None]
    wf = wf * jnp.asarray(mask, dtype=w.dtype)[..., None, None]
    # [bi, a, p, bj, b, q, ci, co] → [bi, bj, (a, b, ci), (p, q, co)]
    wf = wf.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    return wf.reshape(3, 3, 4 * cin, 4 * cout)


def _s2d_deconv4_kernel(w: jax.Array) -> jax.Array:
    """Rearrange ``w [4,4,cin,cout]`` to ``W [3,3,cin,4·cout]`` such that
    ``conv(x, W, SAME) == s2d(conv_transpose(x, w, strides=2, SAME))``."""
    cin, cout = w.shape[2], w.shape[3]
    kc, ok = _DECONV4_TAPS
    wf = w[kc[:, :, None, None], kc[None, None]]
    mask = ok[:, :, None, None] & ok[None, None]
    wf = wf * jnp.asarray(mask, dtype=w.dtype)[..., None, None]
    # [Bi, p, Bj, q, ci, co] → [Bi, Bj, ci, (p, q, co)]
    wf = wf.transpose(0, 2, 4, 1, 3, 5)
    return wf.reshape(3, 3, cin, 4 * cout)


def _conv_nhwc(x: jax.Array, w: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


class ConvVAE(nn.Module):
    """Convolutional VAE for single-channel images (VAE.py:16-162).

    The reference hardcodes 36×36 inputs (fc1 expects 32·9·9 features,
    VAE.py:55 — its conv path would crash on the 28×28 Rotated MNIST it
    nominally supports). Here the spatial size is a field: ``image_hw`` must
    be divisible by 4 (two 2× pools).
    """

    latent_dim: int
    num_dim: int = 36 * 36
    vy_init: float = 1.0
    p_input: float = 0.2  # stored for config parity; unused in the reference
    p: float = 0.5
    image_hw: int = 36
    dtype: Any = jnp.float32

    @property
    def _feat_hw(self) -> int:
        assert self.image_hw % 4 == 0, "image_hw must be divisible by 4"
        return self.image_hw // 4

    def setup(self):
        self.conv1 = nn.Conv(16, (3, 3), padding="SAME", dtype=self.dtype)
        self.conv2 = nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype)
        self.fc1 = nn.Dense(300, dtype=self.dtype)
        self.fc21 = nn.Dense(30, dtype=self.dtype)
        self.fc211 = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.fc221 = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.fc3 = nn.Dense(30, dtype=self.dtype)
        self.fc31 = nn.Dense(300, dtype=self.dtype)
        self.fc4 = nn.Dense(32 * self._feat_hw * self._feat_hw, dtype=self.dtype)
        self.deconv1 = nn.ConvTranspose(16, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype)
        self.deconv2 = nn.ConvTranspose(1, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype)
        # spatial (channel-wise) dropout ≡ torch Dropout2d (VAE.py:48-53)
        self.drop2d = nn.Dropout(self.p, broadcast_dims=(1, 2))
        self.drop = nn.Dropout(self.p)
        self.raw_log_vy = self.param(
            "raw_log_vy",
            # param_dtype stays f32 like every flax layer param — model_dtype
            # ('bfloat16 keeps params f32', config.py) is compute-only
            lambda key: jnp.full((self.num_dim,), _vy_init_raw(self.vy_init, jnp.float32)),
        )

    @property
    def is_conv(self) -> bool:
        return True

    def _fused(self) -> bool:
        """Use the s2d formulation for this call?

        ``init`` always traces the standard path so the params are created by
        nn.Conv/nn.ConvTranspose themselves — identical tree, names and
        path-derived init values; the fused path only *reads* them, so
        checkpoints are interchangeable between the two formulations.
        """
        return _s2d_active() and not self.is_initializing()

    def _conv_pool_s2d(self, mod: nn.Module, x: jax.Array, cout: int) -> jax.Array:
        """``max_pool_2x2(relu(mod(x)))`` on the space-to-depth layout."""
        p = mod.variables["params"]
        w = _s2d_conv3_kernel(p["kernel"].astype(self.dtype))
        y = _conv_nhwc(_space_to_depth(x), w) + jnp.tile(p["bias"].astype(self.dtype), 4)
        y = nn.relu(y)
        n, hh, ww, _ = y.shape
        return y.reshape(n, hh, ww, 4, cout).max(axis=3)

    def _deconv_s2d(self, mod: nn.Module, x: jax.Array, cout: int) -> jax.Array:
        """``mod(x)`` (ConvTranspose 4×4/stride-2/SAME) as a block conv."""
        p = mod.variables["params"]
        w = _s2d_deconv4_kernel(p["kernel"].astype(self.dtype))
        y = _conv_nhwc(x, w) + jnp.tile(p["bias"].astype(self.dtype), 4)
        return _depth_to_space(y, cout)

    def encode(self, x: jax.Array, deterministic: bool = True) -> Tuple[jax.Array, jax.Array]:
        """images [N, 36, 36, 1] → (mu, log_var) each [N, L] (VAE.py:90-107)."""
        x = x.astype(self.dtype)
        if self._fused():
            h = self._conv_pool_s2d(self.conv1, x, 16)
            h = self.drop2d(h, deterministic=deterministic)
            h = self._conv_pool_s2d(self.conv2, h, 32)
            h = self.drop2d(h, deterministic=deterministic)
        else:
            h = nn.relu(self.conv1(x))
            h = self.drop2d(_max_pool_2x2(h), deterministic=deterministic)
            h = nn.relu(self.conv2(h))
            h = self.drop2d(_max_pool_2x2(h), deterministic=deterministic)
        h = h.reshape(h.shape[0], -1)  # [N, (hw/4)^2 * 32]
        h = self.drop(nn.relu(self.fc1(h)), deterministic=deterministic)
        h = self.drop(nn.relu(self.fc21(h)), deterministic=deterministic)
        return self.fc211(h), self.fc221(h)

    def decode(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        """latents [N, L] → images [N, 36, 36, 1] (VAE.py:109-124)."""
        z = z.astype(self.dtype)
        h = self.drop(nn.relu(self.fc3(z)), deterministic=deterministic)
        h = self.drop(nn.relu(self.fc31(h)), deterministic=deterministic)
        h = nn.relu(self.fc4(h))
        h = h.reshape(h.shape[0], self._feat_hw, self._feat_hw, 32)
        h = self.drop2d(h, deterministic=deterministic)
        if self._fused():
            h = nn.relu(self._deconv_s2d(self.deconv1, h, 16))
            h = self.drop2d(h, deterministic=deterministic)
            return nn.sigmoid(self._deconv_s2d(self.deconv2, h, 1))
        h = self.drop2d(nn.relu(self.deconv1(h)), deterministic=deterministic)
        return nn.sigmoid(self.deconv2(h))

    def __call__(self, x, rng: Optional[jax.Array] = None, deterministic: bool = True):
        mu, log_var = self.encode(x, deterministic=deterministic)
        if rng is None:
            z = mu
        else:
            z = sample_latent(rng, mu, log_var)
        return self.decode(z, deterministic=deterministic), mu, log_var


class SimpleVAE(nn.Module):
    """MLP VAE for flat data (VAE.py:165-273)."""

    latent_dim: int
    num_dim: int
    vy_init: float = 1.0
    dtype: Any = jnp.float32

    def setup(self):
        self.fc1 = nn.Dense(300, dtype=self.dtype)
        self.fc21 = nn.Dense(30, dtype=self.dtype)
        self.fc211 = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.fc221 = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.fc3 = nn.Dense(30, dtype=self.dtype)
        self.fc31 = nn.Dense(300, dtype=self.dtype)
        self.fc4 = nn.Dense(self.num_dim, dtype=self.dtype)
        self.raw_log_vy = self.param(
            "raw_log_vy",
            # param_dtype stays f32 like every flax layer param — model_dtype
            # ('bfloat16 keeps params f32', config.py) is compute-only
            lambda key: jnp.full((self.num_dim,), _vy_init_raw(self.vy_init, jnp.float32)),
        )

    @property
    def is_conv(self) -> bool:
        return False

    def encode(self, x: jax.Array, deterministic: bool = True):
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        h = nn.relu(self.fc1(x))
        h = nn.relu(self.fc21(h))
        return self.fc211(h), self.fc221(h)

    def decode(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        z = z.astype(self.dtype)
        h = nn.relu(self.fc3(z))
        h = nn.relu(self.fc31(h))
        return nn.sigmoid(self.fc4(h))

    def __call__(self, x, rng: Optional[jax.Array] = None, deterministic: bool = True):
        mu, log_var = self.encode(x, deterministic=deterministic)
        z = mu if rng is None else sample_latent(rng, mu, log_var)
        return self.decode(z, deterministic=deterministic), mu, log_var


def sample_latent(rng: jax.Array, mu: jax.Array, log_var: jax.Array) -> jax.Array:
    """Reparameterised sample ``mu + eps·exp(½ log_var)`` (VAE.py:126-137)."""
    eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
    return mu + eps * jnp.exp(0.5 * log_var)


def vae_loss(
    raw_log_vy: jax.Array,
    recon_x: jax.Array,
    x: jax.Array,
    mask: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Masked reconstruction losses, per sample: (mse [N], nll [N]).

    Reproduces VAE.py:144-162 exactly, including two quirks worth noting:
    the per-sample MSE normalises by the number of *observed* pixels
    (mask_sum, clamped to ≥1), while the NLL adds the Gaussian constant
    ``½(log 2π + raw_log_vy)`` for every pixel (masked or not) and uses the
    *unfloored* raw log-variance.
    """
    n = recon_x.shape[0]
    num_dim = raw_log_vy.shape[0]
    # losses accumulate in the TARGET's dtype (>= f32): with a bf16 compute
    # model the reconstruction is upcast here so sums stay accurate
    tx = x.reshape(n, num_dim)
    rx = recon_x.reshape(n, num_dim).astype(tx.dtype)
    mk = mask.reshape(n, num_dim).astype(tx.dtype)
    se = (rx - tx) ** 2 * mk
    mask_sum = jnp.maximum(jnp.sum(mk, axis=1), 1.0)
    mse = jnp.sum(se, axis=1) / mask_sum
    nll = se / (2.0 * jnp.exp(raw_log_vy.astype(tx.dtype))) + 0.5 * (
        jnp.log(2.0 * jnp.pi) + raw_log_vy.astype(tx.dtype)
    )
    return mse, jnp.sum(nll, axis=1)


def vy_from_params(params) -> jax.Array:
    """Observation variance ``vy`` from a model's params pytree (VAE.py:79-82)."""
    raw = params["params"]["raw_log_vy"]
    return jnp.exp(floored_log_vy(raw))


def make_vae(
    type_nnet: str,
    latent_dim: int,
    num_dim: int,
    vy_init: float = 1.0,
    dropout: float = 0.5,
    dropout_input: float = 0.2,
    dtype=jnp.float32,
    T: Optional[int] = None,
    hidden_dim: int = 64,
    type_rnn: str = "lstm",
):
    """Factory matching the reference's model selection (LVAE.py:137-143)."""
    if type_nnet == "conv":
        hw = int(round(num_dim ** 0.5))
        assert hw * hw == num_dim, f"conv model needs square images, got {num_dim}"
        return ConvVAE(
            latent_dim=latent_dim,
            num_dim=num_dim,
            vy_init=vy_init,
            p=dropout,
            p_input=dropout_input,
            image_hw=hw,
            dtype=dtype,
        )
    if type_nnet == "simple":
        return SimpleVAE(
            latent_dim=latent_dim, num_dim=num_dim, vy_init=vy_init, dtype=dtype
        )
    if type_nnet == "rnn":
        from lvae_tpu.models.rnn import RNNVAE

        assert T is not None and T > 0, "type_nnet='rnn' requires T"
        return RNNVAE(
            latent_dim=latent_dim, num_dim=num_dim, T=T,
            hidden_dim=hidden_dim, type_rnn=type_rnn, vy_init=vy_init,
            dtype=dtype,
        )
    raise ValueError(
        f"Unknown type_nnet {type_nnet!r} (expected 'conv', 'simple' or 'rnn')"
    )
