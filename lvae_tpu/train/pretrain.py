"""Standalone VAE pre-training with a standard-normal latent prior.

Rebuild of the reference's pre-training entry point (VAE.py:276-386): Adam
(lr 1e-3) on ``Σ(recon|nll + KLD_N(0,1))`` over shuffled batches of
``min(N, 256)``; the trained weights seed the L-VAE run (LVAE.py:146-150).
The epoch is one jitted ``lax.scan`` over a precomputed permutation.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lvae_tpu.models import vae as mv


class PretrainState(NamedTuple):
    params: Any
    opt_state: Any
    rng: jax.Array
    step: jax.Array


class PretrainMetrics(NamedTuple):
    loss: jax.Array
    recon: jax.Array
    nll: jax.Array
    kld: jax.Array


def std_normal_kld(mu: jax.Array, log_var: jax.Array) -> jax.Array:
    """Per-sample analytic KL(q‖N(0,I)) (VAE.py:362)."""
    return -0.5 * jnp.sum(1.0 + log_var - mu * mu - jnp.exp(log_var), axis=1)


def make_pretrain_epoch_fn(model, optimizer, loss_function: str, dropout: bool,
                           vy_fixed: bool = False):
    def batch_loss(params, x, pixmask, rng):
        k_drop, k_sample = jax.random.split(rng)
        recon, mu, log_var = model.apply(
            params, x, rng=k_sample,
            deterministic=not dropout, rngs={"dropout": k_drop},
        )
        raw_log_vy = params["params"]["raw_log_vy"]
        if vy_fixed:
            raw_log_vy = jax.lax.stop_gradient(raw_log_vy)
        mse_i, nll_i = mv.vae_loss(raw_log_vy, recon, x, pixmask)
        kld_i = std_normal_kld(mu, log_var)
        if loss_function == "nll":
            loss = jnp.sum(nll_i + kld_i)
        else:
            loss = jnp.sum(mse_i + kld_i)
        return loss, PretrainMetrics(
            loss=loss, recon=jnp.sum(mse_i), nll=jnp.sum(nll_i), kld=jnp.sum(kld_i)
        )

    @functools.partial(jax.jit, static_argnums=(3, 4, 5), donate_argnums=(0,))
    def epochs_fn(state, data, pixmask, batch_size: int, n_epochs: int,
                  seq_len: int = 0):
        n = data.shape[0]
        n_batches = n // batch_size

        # flat-view minibatch gather, as in train/hensman.py batch_loss:
        # XLA propagates the conv's batch-minor layout into the whole frame
        # table, turning the per-step row gather into a 23 GB/s strided
        # walk at large N. Flatten ONCE here (outside the scans — XLA does
        # not hoist an in-scan reshape) and restore the frame shape on the
        # small batch. Same shape-keyed gate as the trainer.
        from lvae_tpu.train.hensman import _flat_gather_active

        frame_shape = None
        if data.ndim > 2 and _flat_gather_active(n):
            frame_shape = data.shape[1:]
            data = data.reshape(n, -1)

        def step(state, idx):
            rng, key = jax.random.split(state.rng)
            x = jnp.take(data, idx, axis=0)
            if frame_shape is not None:
                x = x.reshape((x.shape[0],) + frame_shape)
            mk = jnp.take(pixmask, idx, axis=0)
            (loss, metrics), grads = jax.value_and_grad(
                batch_loss, has_aux=True
            )(state.params, x, mk, key)
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                PretrainState(params, opt_state, rng, state.step + 1),
                metrics,
            )

        def one_epoch(state, _):
            rng, perm_key = jax.random.split(state.rng)
            state = state._replace(rng=rng)
            # on-device shuffle (dropping the ragged tail, as the reference's
            # drop_last-free loader effectively sees shuffled batches).
            # A recurrent encoder (seq_len=T) shuffles whole subjects so each
            # batch stays subject-major with intact sequences.
            if seq_len:
                sperm = jax.random.permutation(perm_key, n // seq_len)
                perm = (
                    sperm[:, None] * seq_len + jnp.arange(seq_len)[None, :]
                ).reshape(-1)
            else:
                perm = jax.random.permutation(perm_key, n)
            perm = perm[: n_batches * batch_size]
            state, ms = jax.lax.scan(
                step, state, perm.reshape(n_batches, batch_size)
            )
            return state, jax.tree.map(jnp.sum, ms)

        state, ms = jax.lax.scan(one_epoch, state, None, length=n_epochs)
        return state, ms

    return epochs_fn


class VAEPretrainer:
    """Pre-training driver (VAE.py:340-386 control flow)."""

    def __init__(
        self,
        model,
        dataset,
        loss_function: str = "nll",
        learning_rate: float = 1e-3,
        dropout: bool = True,
        seed: int = 0,
        batch_size: int = 256,
        dtype=jnp.float32,
        vy_fixed: bool = False,
    ):
        self.model = model
        self.data = jnp.asarray(dataset.data, dtype)
        self.pixmask = jnp.asarray(dataset.mask, dtype)
        self.n = len(dataset)
        self.batch_size = min(self.n, batch_size)
        # A recurrent encoder consumes whole subject sequences: batches must
        # be subject-major multiples of T (models/rnn.py RNNVAE.encode).
        self.seq_len = int(getattr(model, "T", 0) or 0)
        if self.seq_len:
            if self.n % self.seq_len:
                raise ValueError(
                    f"RNN pre-training needs subject-major data with N "
                    f"divisible by T={self.seq_len}; got N={self.n}"
                )
            self.batch_size = max(
                self.seq_len, self.batch_size // self.seq_len * self.seq_len
            )
        self.optimizer = optax.adam(learning_rate)
        self.epoch_fn = make_pretrain_epoch_fn(
            model, self.optimizer, loss_function, dropout, vy_fixed
        )
        key = jax.random.key(seed)
        k_init, k_state = jax.random.split(key)
        params = jax.jit(lambda k, x: model.init(k, x, deterministic=True))(
            k_init, self.data[: (self.seq_len or 2)]
        )
        self.state = PretrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            rng=k_state,
            step=jnp.zeros((), jnp.int32),
        )
        self.history: list = []

    def run_epochs(self, n: int):
        self.state, ms = self.epoch_fn(
            self.state, self.data, self.pixmask, self.batch_size, n, self.seq_len
        )
        # one pipelined host transfer for the whole metric tree (see
        # train/standard.py:_materialize_metrics for the measurement)
        host = jax.device_get(ms)
        out = []
        for e in range(n):
            m = jax.tree.map(lambda a: float(a[e]), host)
            self.history.append(m)
            out.append(m)
        return out

    def run_epoch(self):
        return self.run_epochs(1)[0]

    def fit(self, epochs: int, log_every: int = 1, callback=None, chunk: int = 25):
        done = 0
        while done < epochs:
            n = min(max(chunk, 1), epochs - done)
            ms = self.run_epochs(n)
            for i, m in enumerate(ms):
                epoch = done + i + 1
                if log_every and epoch % log_every == 0:
                    # "Average loss" is the RAW epoch sum — a reference
                    # quirk kept verbatim (VAE.py:369-376 accumulates
                    # loss.item() over batches and prints it undivided)
                    print(
                        "====> Epoch: %d - Average loss: %.4f  - KLD loss: %.3f"
                        "  - NLL loss: %.3f  - Recon loss: %.3f"
                        % (epoch, m.loss, m.kld, m.nll, m.recon),
                        flush=True,
                    )
            done += n
            if callback is not None:
                callback(self, done, ms[-1])
        return self.history

    @property
    def params(self):
        return self.state.params
