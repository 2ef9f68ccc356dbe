"""Hensman/SVI training: true mini-batching with natural gradients.

TPU-native rebuild of the reference's primary regime, ``hensman_training``
(training.py:15-237 in SidRama/Longitudinal-VAE). Differences by design:

* The whole epoch is ONE jitted program: a ``lax.scan`` over precomputed
  static-shape subject batches. The reference's per-batch Python loop with
  host→device copies becomes a device-side gather from resident arrays.
* The natural-gradient update of (m, H) (training.py:129-135) happens inside
  the scanned step — no host round trip between batches.
* Fixed-T and varying-T cohorts share one code path via padded blocks +
  validity masks (replacing ``minibatch_KLD_upper_bound_iter``'s subject
  loop); ghost subjects padding the final batch contribute exactly zero and
  the true subject count drives the P/P_batch scaling (training.py:111-118).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lvae_tpu.data.blocks import epoch_batches
from lvae_tpu.models import vae as mv
from lvae_tpu.ops import elbo as eb
from lvae_tpu.ops import kernels as kx
from lvae_tpu.train import state as st


class HensmanConfig(NamedTuple):
    """Static configuration of the jitted step (hashable)."""

    spec0: kx.KernelSpec
    spec1: kx.KernelSpec
    latent_dim: int
    P_tot: int
    N_tot: int
    weight: float
    loss_function: str  # 'mse' | 'nll'
    natural_gradient: bool
    natural_gradient_lr: float
    constrain_scales: bool
    eps: float
    dropout: bool  # apply dropout in training forward passes


class StepMetrics(NamedTuple):
    net: jax.Array
    recon: jax.Array
    nll: jax.Array
    kld: jax.Array


def _noise_from(gp: st.GPParams, cfg: HensmanConfig) -> jax.Array:
    if cfg.constrain_scales:
        # likelihood noise pinned to 1 (LVAE.py:186-188)
        return jnp.ones_like(gp.raw_noise)
    return kx.constrain(gp.raw_noise)


def batch_loss(
    model,
    cfg: HensmanConfig,
    trainables: st.Trainables,
    m_nat: Optional[jax.Array],
    H_nat: Optional[jax.Array],
    tdata: st.TrainData,
    idx: jax.Array,  # [S, T]
    bmask: jax.Array,  # [S, T]
    p_batch: jax.Array,  # scalar
    rng: jax.Array,
) -> Tuple[jax.Array, Tuple[StepMetrics, Optional[eb.NaturalGradients]]]:
    """Net loss of one subject batch (training.py:103-124 semantics)."""
    s, t = idx.shape
    flat_idx = idx.reshape(-1)
    x = jnp.take(tdata.data, flat_idx, axis=0)
    labels = jnp.take(tdata.labels, flat_idx, axis=0)
    pixmask = jnp.take(tdata.pixmask, flat_idx, axis=0)
    valid = bmask.reshape(-1)

    k_drop, k_sample = jax.random.split(rng)
    recon, mu, log_var = model.apply(
        trainables.vae,
        x,
        rng=k_sample,
        deterministic=not cfg.dropout,
        rngs={"dropout": k_drop},
    )
    raw_log_vy = trainables.vae["params"]["raw_log_vy"]
    mse_i, nll_i = mv.vae_loss(raw_log_vy, recon, x, pixmask)
    recon_loss = jnp.sum(mse_i * valid)
    nll_loss = jnp.sum(nll_i * valid)

    gp = trainables.gp
    noise = _noise_from(gp, cfg)
    xb = (labels * valid[:, None]).reshape(s, t, -1)
    ops = eb.gp_block_operators(
        cfg.spec0, cfg.spec1, gp.kp0, gp.kp1, noise, xb, tdata.z,
        mask=bmask, eps=cfg.eps,
    )
    if cfg.natural_gradient:
        m_var, psd_h = m_nat, H_nat
    else:
        m_var = trainables.m
        psd_h = trainables.h_factor @ jnp.swapaxes(trainables.h_factor, -1, -2)

    mu_b = mu.reshape(s, t, cfg.latent_dim)
    lv_b = log_var.reshape(s, t, cfg.latent_dim)
    kld, ng = eb.minibatch_kld(
        ops, m_var, psd_h, mu_b, lv_b,
        P_tot=cfg.P_tot, P_batch=p_batch, N_tot=cfg.N_tot,
        natural_gradient=cfg.natural_gradient,
    )

    scale = cfg.P_tot / p_batch.astype(recon_loss.dtype)
    recon_loss = recon_loss * scale
    nll_loss = nll_loss * scale
    if cfg.loss_function == "nll":
        net = nll_loss + kld
        kld_rep = kld
    else:
        kld_rep = kld / cfg.latent_dim
        net = recon_loss + cfg.weight * kld_rep
    metrics = StepMetrics(net=net, recon=recon_loss, nll=nll_loss, kld=kld_rep)
    return net, (metrics, ng)


def make_epoch_fn(model, cfg: HensmanConfig, optimizer):
    """Build the jitted epoch runner.

    Returns ``epoch_fn(state, tdata, idx [B,S,T], bmask [B,S,T],
    p_batch [B]) -> (state, StepMetrics)`` with metrics averaged over the
    epoch's batches (the reference accumulates ``loss/n_batches``,
    training.py:137-140).
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state, tdata, idx, bmask, p_batch):
        def step(state, batch):
            b_idx, b_mask, b_p = batch
            rng, step_key = jax.random.split(state.rng)

            grad_fn = jax.value_and_grad(
                lambda tr: batch_loss(
                    model, cfg, tr, state.m_nat, state.H_nat,
                    tdata, b_idx, b_mask, b_p, step_key,
                ),
                has_aux=True,
            )
            (net, (metrics, ng)), grads = grad_fn(state.trainables)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.trainables
            )
            trainables = optax.apply_updates(state.trainables, updates)

            m_nat, H_nat = state.m_nat, state.H_nat
            if cfg.natural_gradient:
                m_nat, H_nat = eb.natural_gradient_update(
                    m_nat, H_nat, ng, cfg.natural_gradient_lr
                )
            new_state = st.HensmanState(
                trainables=trainables,
                m_nat=m_nat,
                H_nat=H_nat,
                opt_state=opt_state,
                rng=rng,
                step=state.step + 1,
            )
            return new_state, metrics

        state, ms = jax.lax.scan(step, state, (idx, bmask, p_batch))
        mean = jax.tree.map(lambda a: jnp.mean(a), ms)
        return state, mean

    return epoch_fn


class HensmanTrainer:
    """Python-side orchestration: epochs, validation cadence, best tracking.

    Mirrors the control flow of training.py:84-237 (per-epoch batch loop,
    every-25-epoch validation, best-model checkpoints) around the single
    jitted epoch program.
    """

    def __init__(
        self,
        model,
        cfg: HensmanConfig,
        dataset,
        blocks,
        z: np.ndarray,
        subjects_per_batch: int,
        learning_rate: float = 1e-3,
        seed: int = 0,
        dtype=jnp.float32,
    ):
        self.model = model
        self.cfg = cfg
        self.blocks = blocks
        self.subjects_per_batch = subjects_per_batch
        self.rng = np.random.default_rng(seed)
        self.optimizer = st.make_optimizer(learning_rate)
        self.epoch_fn = make_epoch_fn(model, cfg, self.optimizer)
        self.dtype = dtype

        self.tdata = st.TrainData(
            data=jnp.asarray(dataset.data, dtype),
            labels=jnp.asarray(dataset.labels, dtype),
            pixmask=jnp.asarray(dataset.mask, dtype),
            z=jnp.asarray(z, dtype),
        )

        # init state
        key = jax.random.key(seed)
        k_init, k_state = jax.random.split(key)
        sample_x = self.tdata.data[:2]
        vae_params = jax.jit(
            lambda k, x: model.init(k, x, deterministic=True)
        )(k_init, sample_x)
        gp = st.init_gp_params(
            cfg.spec0, cfg.spec1, cfg.latent_dim,
            constrain_scales=cfg.constrain_scales, dtype=dtype,
        )
        m0, h0 = st.init_variational(
            cfg.latent_dim, z.shape[0], cfg.natural_gradient, seed, dtype
        )
        if cfg.natural_gradient:
            trainables = st.Trainables(vae=vae_params, gp=gp, m=None, h_factor=None)
            m_nat, H_nat = m0, h0
        else:
            trainables = st.Trainables(vae=vae_params, gp=gp, m=m0, h_factor=h0)
            m_nat, H_nat = None, None
        self.state = st.HensmanState(
            trainables=trainables,
            m_nat=m_nat,
            H_nat=H_nat,
            opt_state=self.optimizer.init(trainables),
            rng=k_state,
            step=jnp.zeros((), jnp.int32),
        )
        self.history: list = []

    def run_epoch(self):
        idx, msk, p_b = epoch_batches(self.blocks, self.subjects_per_batch, self.rng)
        self.state, metrics = self.epoch_fn(
            self.state,
            self.tdata,
            jnp.asarray(idx),
            jnp.asarray(msk, self.dtype),
            jnp.asarray(p_b, self.dtype),
        )
        m = jax.tree.map(float, metrics)
        self.history.append(m)
        return m

    def fit(self, epochs: int, log_every: int = 1, callback=None):
        for epoch in range(1, epochs + 1):
            m = self.run_epoch()
            if log_every and (epoch % log_every == 0):
                print(
                    "Iter %d/%d - Loss: %.3f  - GP loss: %.3f  - NLL Loss: %.3f"
                    "  - Recon Loss: %.3f"
                    % (epoch, epochs, m.net, m.kld, m.nll, m.recon),
                    flush=True,
                )
            if callback is not None:
                callback(self, epoch, m)
        return self.history
