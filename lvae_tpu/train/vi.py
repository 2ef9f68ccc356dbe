"""Amortisation-free variational-inference optimisation.

Rebuild of ``variational_inference_optimization`` (training.py:602-764 in
SidRama/Longitudinal-VAE): instead of using the encoder, optimise per-point
variational parameters (mu, log_var) directly against DUBO + decoder
reconstruction; then, freezing the training-set parameters, optimise the
prediction cohort's (mu_pred, log_var_pred) against the *joint* DUBO over the
concatenated cohorts — pure latent-space inference for unseen sequences.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lvae_tpu.models import vae as mv
from lvae_tpu.ops import elbo as eb
from lvae_tpu.ops import kernels as kx
from lvae_tpu.train import state as st


class VIConfig(NamedTuple):
    spec0: kx.KernelSpec
    spec1: kx.KernelSpec
    latent_dim: int
    weight: float
    loss_function: str
    constrain_scales: bool
    eps: float


class VIState(NamedTuple):
    mu: jax.Array  # [N, L] free variational means
    log_var: jax.Array  # [N, L]
    vae: Any  # decoder params (trained jointly, as the reference optimiser
    #          already carries the VAE params, LVAE.py:292)
    gp: st.GPParams
    opt_state: Any
    rng: jax.Array


class VITrainer:
    """Two-phase VI driver (training.py:618-764 control flow)."""

    def __init__(
        self,
        model,
        cfg: VIConfig,
        dataset,
        blocks,
        z: np.ndarray,
        vae_params,
        gp_params: st.GPParams,
        learning_rate: float = 1e-3,
        seed: int = 0,
        dtype=jnp.float32,
    ):
        from lvae_tpu.evaluation.encode import encode_dataset

        self.model = model
        self.cfg = cfg
        self.dtype = dtype
        self.labels = np.asarray(dataset.labels)
        self.blocks = blocks
        self.z_ind = jnp.asarray(z, dtype)
        order = blocks.index.reshape(-1)
        assert blocks.mask.all(), "VI regime expects fixed-T cohorts"
        self.order = order
        # subject-major views, gathered once ON HOST so only the ordered
        # copy is ever device-resident (an earlier version re-gathered the
        # full image tensor on every epoch, and a later one kept both the
        # ordered and unordered copies alive — 2× HBM residency)
        self.data_ordered = jnp.asarray(np.asarray(dataset.data)[order], dtype)
        self.pixmask_ordered = jnp.asarray(np.asarray(dataset.mask)[order], dtype)
        self.xb = jnp.asarray(dataset.labels[order], dtype).reshape(
            blocks.num_subjects, blocks.t_max, -1
        )
        self.block_mask = jnp.asarray(blocks.mask, dtype)

        mu0, lv0 = encode_dataset(model, vae_params, dataset.data)
        # store in subject-major order to match xb blocks
        self.state = VIState(
            mu=jnp.asarray(mu0[order], dtype),
            log_var=jnp.asarray(lv0[order], dtype),
            vae=vae_params,
            gp=gp_params,
            opt_state=None,
            rng=jax.random.key(seed),
        )
        self.optimizer = optax.adam(learning_rate)
        self.state = self.state._replace(
            opt_state=self.optimizer.init(
                (self.state.mu, self.state.log_var, self.state.vae, self.state.gp)
            )
        )

        cfg_ = cfg
        model_ = model

        def step_fn(state: VIState, data, pixmask, xb, block_mask, z_ind):
            rng, key = jax.random.split(state.rng)

            def loss(tr):
                mu, log_var, vae, gp = tr
                zs = mv.sample_latent(key, mu, log_var)
                recon = model_.apply(
                    vae, zs, deterministic=True, method=type(model_).decode
                )
                mse_i, nll_i = mv.vae_loss(
                    vae["params"]["raw_log_vy"], recon, data, pixmask
                )
                recon_loss = jnp.sum(mse_i)
                nll_loss = jnp.sum(nll_i)
                noise = (
                    jnp.ones_like(gp.raw_noise)
                    if cfg_.constrain_scales
                    else kx.constrain(gp.raw_noise)
                )
                p, t = block_mask.shape
                ops = eb.gp_block_operators(
                    cfg_.spec0, cfg_.spec1, gp.kp0, gp.kp1, noise, xb, z_ind,
                    block_mask, cfg_.eps,
                )
                gp_loss = jnp.sum(
                    eb.dubo(
                        ops,
                        mu.reshape(p, t, cfg_.latent_dim),
                        log_var.reshape(p, t, cfg_.latent_dim),
                    )
                ) / cfg_.latent_dim
                if cfg_.loss_function == "mse":
                    net = recon_loss + cfg_.weight * gp_loss
                else:
                    net = nll_loss + gp_loss
                return net, (recon_loss, nll_loss, gp_loss)

            tr = (state.mu, state.log_var, state.vae, state.gp)
            (net, aux), grads = jax.value_and_grad(loss, has_aux=True)(tr)
            updates, opt_state = self.optimizer.update(grads, state.opt_state, tr)
            mu, log_var, vae, gp = optax.apply_updates(tr, updates)
            return (
                VIState(mu, log_var, vae, gp, opt_state, rng),
                (net,) + aux,
            )

        # multi-epoch dispatch: one remote round trip per CHUNK of epochs
        # (an eager per-epoch loop costs seconds/epoch on the remote chip —
        # see train/hensman.py docstring for the dispatch model)
        @functools.partial(jax.jit, static_argnums=(6,), donate_argnums=(0,))
        def epochs_fn(state, data, pixmask, xb, block_mask, z_ind, n_epochs):
            def body(state, _):
                state, metrics = step_fn(
                    state, data, pixmask, xb, block_mask, z_ind
                )
                return state, jnp.stack(metrics)

            return jax.lax.scan(body, state, length=n_epochs)

        # keep the single-step entry point jitted — an eager step is a
        # seconds-long remote round trip per op on the attached chip
        self.step_fn = jax.jit(step_fn, donate_argnums=(0,))
        self.epochs_fn = epochs_fn
        self.history: list = []

    def _dispatch_epochs(self, n: int):
        """Dispatch an ``n``-epoch chunk; return its DEVICE metrics (no sync)."""
        self.state, ms = self.epochs_fn(
            self.state, self.data_ordered, self.pixmask_ordered,
            self.xb, self.block_mask, self.z_ind, n,
        )
        return ms

    def _materialize_log(self, ms, n, done, epochs, log_every):
        ms = np.asarray(ms)  # [n, 4]
        for i in range(n):
            epoch = done + i + 1
            net, recon, nll, gp = (float(v) for v in ms[i])
            m = dict(net=net, recon=recon, nll=nll, gp=gp)
            self.history.append(m)
            if log_every and epoch % log_every == 0:
                print(
                    "Iter %d/%d - Loss: %.3f  - GP loss: %.3f  - NLL "
                    "Loss: %.3f  - Recon Loss: %.3f"
                    % (epoch, epochs, net, gp, nll, recon),
                    flush=True,
                )

    def fit(self, epochs: int, log_every: int = 100, chunk: int = 100, overlap=None):
        # overlapped schedule (train/hensman.use_overlapped_fit): dispatch
        # chunk k+1 before reading chunk k's metrics — the remote execute
        # round trip hides behind device time; values/prints identical
        from lvae_tpu.train.hensman import _overlap_active

        if _overlap_active(overlap):
            dispatched = printed = 0
            pending = None
            while dispatched < epochs or pending is not None:
                nxt = None
                if dispatched < epochs:
                    n = min(max(chunk, 1), epochs - dispatched)
                    nxt = (n, self._dispatch_epochs(n))
                    dispatched += n
                if pending is not None:
                    pn, pms = pending
                    self._materialize_log(pms, pn, printed, epochs, log_every)
                    printed += pn
                pending = nxt
            return self.history
        done = 0
        while done < epochs:
            n = min(max(chunk, 1), epochs - done)
            ms = self._dispatch_epochs(n)
            self._materialize_log(ms, n, done, epochs, log_every)
            done += n
        return self.history

    def _joint_labels(self, prediction_dataset) -> np.ndarray:
        """[prediction rows; trained rows in subject order] — the phase-2
        joint cohort's row layout (training.py:688-707)."""
        return np.concatenate(
            [np.asarray(prediction_dataset.labels), self.labels[self.order]], 0
        )

    def joint_cohort(self, prediction_dataset, mu_pred):
        """(labels, mu) of the jointly-inferred cohort, row-aligned with
        :meth:`optimize_prediction_set`'s internal construction — the
        conditioning set downstream GP prediction/generation must use
        (single source; pipeline.run_vi used to rebuild it by hand)."""
        labels = self._joint_labels(prediction_dataset)
        mu = np.concatenate([np.asarray(mu_pred), np.asarray(self.state.mu)], 0)
        return labels, mu

    def optimize_prediction_set(
        self, prediction_dataset, epochs: int = 1000, learning_rate: float = 1e-3,
        log_every: int = 100, seed: int = 1, chunk: int = 100,
    ):
        """Phase 2 (training.py:688-749): optimise (mu_pred, log_var_pred) for
        an unseen cohort against the joint DUBO with the trained cohort."""
        from lvae_tpu.data.blocks import build_subject_blocks
        from lvae_tpu.evaluation.encode import encode_dataset

        model, cfg, dtype = self.model, self.cfg, self.dtype
        mu0, lv0 = encode_dataset(model, self.state.vae, prediction_dataset.data)
        joint_labels = self._joint_labels(prediction_dataset)
        jblocks = build_subject_blocks(joint_labels, id_covariate=self._id_cov())
        # Ragged joint cohorts are fine HERE (unlike fit(), whose recon loss
        # reads the gathered data_ordered and would double-count padded rows):
        # phase 2's recon loss runs over the flat prediction rows, and the
        # only block-shaped term is the DUBO, which is mask-exact
        # (test_dubo_matches_dense_oracle[ragged]). Padded slots gather row 0
        # but contribute zero value and zero gradient through the mask.
        xb = jnp.asarray(joint_labels[jblocks.index.reshape(-1)], dtype).reshape(
            jblocks.num_subjects, jblocks.t_max, -1
        )
        block_mask = jnp.asarray(jblocks.mask, dtype)
        jindex = jnp.asarray(jblocks.index.reshape(-1))

        data_pred = jnp.asarray(prediction_dataset.data, dtype)
        pixmask_pred = jnp.asarray(prediction_dataset.mask, dtype)
        opt = optax.adam(learning_rate)
        mu_pred = jnp.asarray(mu0, dtype)
        lv_pred = jnp.asarray(lv0, dtype)
        opt_state = opt.init((mu_pred, lv_pred))
        vae, gp = self.state.vae, self.state.gp
        mu_train, lv_train = self.state.mu, self.state.log_var
        z_ind = self.z_ind
        cfg_ = cfg
        model_ = model

        # the GP operators depend only on FROZEN quantities here (gp, xb,
        # block_mask, z) — only (mu_pred, lv_pred) are optimised — so build
        # them ONCE and close over them instead of rebuilding the
        # [L, P_joint, T, T] kernel/Cholesky stacks inside every scanned
        # step (XLA's loop-invariant code motion does not hoist the nested
        # Cholesky chain out of the scan; measured ~half of each phase-2
        # step redundant). gp_block_operators is @_full_precision, so the
        # one-time build keeps the GP-algebra precision invariant.
        noise = (
            jnp.ones_like(gp.raw_noise)
            if cfg_.constrain_scales
            else kx.constrain(gp.raw_noise)
        )
        ops = jax.jit(
            lambda kp0, kp1, nz: eb.gp_block_operators(
                cfg_.spec0, cfg_.spec1, kp0, kp1, nz, xb, z_ind,
                block_mask, cfg_.eps,
            )
        )(gp.kp0, gp.kp1, noise)

        def pred_step(mu_pred, lv_pred, opt_state, key):
            def loss(tr):
                mu_p, lv_p = tr
                zs = mv.sample_latent(key, mu_p, lv_p)
                recon = model_.apply(
                    vae, zs, deterministic=True, method=type(model_).decode
                )
                mse_i, nll_i = mv.vae_loss(
                    vae["params"]["raw_log_vy"], recon, data_pred, pixmask_pred
                )
                recon_loss = jnp.sum(mse_i)
                nll_loss = jnp.sum(nll_i)
                mu_all = jnp.concatenate([mu_p, mu_train], axis=0)
                lv_all = jnp.concatenate([lv_p, lv_train], axis=0)
                mu_b = jnp.take(mu_all, jindex, axis=0).reshape(
                    block_mask.shape[0], block_mask.shape[1], cfg_.latent_dim
                )
                lv_b = jnp.take(lv_all, jindex, axis=0).reshape(
                    block_mask.shape[0], block_mask.shape[1], cfg_.latent_dim
                )
                gp_loss = jnp.sum(eb.dubo(ops, mu_b, lv_b)) / cfg_.latent_dim
                if cfg_.loss_function == "mse":
                    return recon_loss + cfg_.weight * gp_loss, (recon_loss, gp_loss)
                return nll_loss + gp_loss, (recon_loss, gp_loss)

            (net, aux), grads = jax.value_and_grad(loss, has_aux=True)(
                (mu_pred, lv_pred)
            )
            updates, opt_state = opt.update(grads, opt_state)
            mu_pred, lv_pred = optax.apply_updates((mu_pred, lv_pred), updates)
            return mu_pred, lv_pred, opt_state, net, aux

        # chunked multi-step dispatch, as in fit()
        @functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
        def pred_steps(carry, key, n_steps: int):
            def body(carry, k):
                mu_p, lv_p, opt_state = carry
                mu_p, lv_p, opt_state, net, (recon, gp_l) = pred_step(
                    mu_p, lv_p, opt_state, k
                )
                return (mu_p, lv_p, opt_state), jnp.stack((net, recon, gp_l))

            return jax.lax.scan(body, carry, jax.random.split(key, n_steps))

        def log_chunk(ms, done_before):
            ms = np.asarray(ms)
            for i in range(len(ms)):
                epoch = done_before + i + 1
                if log_every and epoch % log_every == 0:
                    net, recon_loss, gp_loss = ms[i]
                    print(
                        "Iter %d/%d - Total Loss: %.3f  - GP Loss: %.3f"
                        "  - Recon Loss: %.3f"
                        % (epoch, epochs, net, gp_loss, recon_loss),
                        flush=True,
                    )

        from lvae_tpu.train.hensman import _overlap_active

        key = jax.random.key(seed)
        carry = (mu_pred, lv_pred, opt_state)
        done = printed = 0
        pending = None  # overlapped schedule, as in fit()
        while done < epochs or pending is not None:
            nxt = None
            if done < epochs:
                n = min(max(chunk, 1), epochs - done)
                key, sub = jax.random.split(key)
                carry, ms = pred_steps(carry, sub, n)
                done += n
                nxt = (n, ms)
            if not _overlap_active(None):
                log_chunk(nxt[1], done - nxt[0])
                continue
            if pending is not None:
                pn, pms = pending
                log_chunk(pms, printed)
                printed += pn
            pending = nxt
        mu_pred, lv_pred, _ = carry
        return np.asarray(mu_pred), np.asarray(lv_pred)

    def _id_cov(self) -> int:
        # the id covariate is recoverable from kernel1's first cat component
        for comp in self.cfg.spec1.components:
            if comp.eq_cols:
                return comp.eq_cols[0]
        raise ValueError("kernel1 has no id covariate component")
