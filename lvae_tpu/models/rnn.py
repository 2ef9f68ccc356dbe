"""Recurrent VAE encoder family (LSTM/GRU over per-subject sequences).

The reference *declares* an RNN encoder — ``type_nnet='rnn'`` with
``type_rnn ∈ {lstm, gru}`` and ``hidden_dim`` flags (parse_model_args.py:46,
59-62) — but never implements it (SURVEY.md §2.3). This module delivers that
promised capability TPU-natively: a bidirectional recurrent encoder consumes
each subject's time series ``[S, T, D]`` (``nn.RNN`` lowers to ``lax.scan``
over time) and emits per-timepoint variational moments; the decoder is the
MLP mirror, so every training regime, bound and predictor works unchanged.

Inputs arrive flat ``[S·T, ...]`` in subject-major order (the framework's
canonical layout — hensman batches and the array datasets are both
subject-contiguous); the module reshapes by its static ``T``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lvae_tpu.models.vae import _vy_init_raw, sample_latent


class RNNVAE(nn.Module):
    """Recurrent encoder + MLP decoder VAE.

    ``T`` is the (static) number of timepoints per subject; flat batches must
    be subject-major with size divisible by T.
    """

    latent_dim: int
    num_dim: int
    T: int
    hidden_dim: int = 64
    type_rnn: str = "lstm"  # lstm | gru
    vy_init: float = 1.0
    dtype: Any = jnp.float32

    def setup(self):
        if self.type_rnn == "lstm":
            cell = nn.OptimizedLSTMCell
        elif self.type_rnn == "gru":
            cell = nn.GRUCell
        else:
            raise ValueError(f"Unknown type_rnn {self.type_rnn!r}")
        self.rnn_fwd = nn.RNN(cell(features=self.hidden_dim, dtype=self.dtype))
        # keep_order=True re-flips the reversed pass's output back to forward
        # time order so position t sums the forward state over [0..t] with
        # the backward state over [t..T-1] — without it the sum misaligns
        # (position t would see the backward state over [T-1-t..T-1]) and the
        # middle of the sequence is invisible to early timepoints
        self.rnn_bwd = nn.RNN(
            cell(features=self.hidden_dim, dtype=self.dtype),
            reverse=True, keep_order=True,
        )
        self.embed = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.fc_mu = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.fc_lv = nn.Dense(self.latent_dim, dtype=self.dtype)
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
        n = x.shape[0]
        assert n % self.T == 0, (
            f"RNN encoder needs subject-major batches divisible by T={self.T}"
        )
        s = n // self.T
        seq = x.reshape(s, self.T, -1).astype(self.dtype)
        h = nn.tanh(self.embed(seq))
        h = self.rnn_fwd(h) + self.rnn_bwd(h)  # [S, T, hidden]
        h = h.reshape(n, self.hidden_dim)
        return self.fc_mu(h), self.fc_lv(h)

    def decode(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        z = z.astype(self.dtype)
        h = nn.relu(self.fc3(z))
        h = nn.relu(self.fc31(h))
        return nn.sigmoid(self.fc4(h))

    def __call__(self, x, rng: Optional[jax.Array] = None, deterministic: bool = True):
        mu, log_var = self.encode(x, deterministic=deterministic)
        z = mu if rng is None else sample_latent(rng, mu, log_var)
        return self.decode(z, deterministic=deterministic), mu, log_var
