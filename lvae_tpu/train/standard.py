"""Standard (full-batch) training and the GPPVAE-style pseudo-minibatch regime.

Rebuilds of ``standard_training`` (training.py:431-600) and
``minibatch_training`` (training.py:240-429) in SidRama/Longitudinal-VAE.

``standard_training`` supports three KL computations per latent dim:
  * 'closed'          — exact N×N KL against the full additive-GP prior
                        (KL_closed, elbo_functions.py:8-34);
  * 'GPapprox'        — inducing-point ELBO on a latent *sample*
                        (elbo, elbo_functions.py:36-84);
  * 'GPapprox_closed' — the deviance upper bound on mean/variance
                        (deviance_upper_bound, elbo_functions.py:86-142).

``minibatch_training`` in the reference is a manual gradient-stitching dance:
encode everything without grad, differentiate the GP loss w.r.t. the cached
means, then replay the encoder per batch splicing those cotangents in
(training.py:294-399). By the chain rule that *is* the full-batch gradient of
``recon(θ) + gp(μ(θ), logvar(θ))`` — so the TPU-native version is one jitted
full-batch value_and_grad with rematerialisation on the encoder to bound
memory. Same math, no five-phase choreography.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lvae_tpu.models import vae as mv
from lvae_tpu.ops import elbo as eb
from lvae_tpu.ops import kernels as kx
from lvae_tpu.train import state as st


class StandardConfig(NamedTuple):
    spec0: kx.KernelSpec  # for 'closed', holds the FULL joint kernel
    spec1: Optional[kx.KernelSpec]
    latent_dim: int
    P_tot: int
    T: int
    weight: float
    loss_function: str  # 'mse' | 'nll'
    type_KL: str  # 'closed' | 'GPapprox' | 'GPapprox_closed'
    num_samples: int
    constrain_scales: bool
    eps: float
    dropout: bool
    vy_fixed: bool = False


class StandardState(NamedTuple):
    trainables: st.Trainables  # m/h_factor unused (None)
    opt_state: Any
    rng: jax.Array
    step: jax.Array


class StandardMetrics(NamedTuple):
    net: jax.Array
    recon: jax.Array
    nll: jax.Array
    gp: jax.Array


def full_batch_loss(
    model,
    cfg: StandardConfig,
    trainables: st.Trainables,
    tdata: st.TrainData,
    block_mask: jax.Array,  # [P, T]
    rng: jax.Array,
) -> Tuple[jax.Array, StandardMetrics]:
    """One full-batch loss evaluation (training.py:484-573 semantics)."""
    k_drop, k_sample = jax.random.split(rng)
    encoder = functools.partial(
        model.apply,
        trainables.vae,
        deterministic=not cfg.dropout,
        rngs={"dropout": k_drop},
    )
    # remat the fwd pass: trades recompute for HBM on big cohorts
    recon, mu, log_var = jax.checkpoint(
        lambda x: encoder(x, rng=k_sample)
    )(tdata.data)
    raw_log_vy = trainables.vae["params"]["raw_log_vy"]
    if cfg.vy_fixed:
        raw_log_vy = jax.lax.stop_gradient(raw_log_vy)
    mse_i, nll_i = mv.vae_loss(raw_log_vy, recon, tdata.data, tdata.pixmask)
    recon_loss = jnp.sum(mse_i)
    nll_loss = jnp.sum(nll_i)

    gp = trainables.gp
    noise = (
        jnp.ones_like(gp.raw_noise)
        if cfg.constrain_scales
        else kx.constrain(gp.raw_noise)
    )
    p, t = block_mask.shape
    latent = cfg.latent_dim
    xb = tdata.labels.reshape(p, t, -1)
    mu_b = mu.reshape(p, t, latent)
    lv_b = log_var.reshape(p, t, latent)

    if cfg.type_KL == "closed":
        k_prior = kx.kernel_matrix(
            cfg.spec0, gp.kp0, tdata.labels, tdata.labels
        ) + noise[:, None, None] * jnp.eye(tdata.labels.shape[0], dtype=mu.dtype)
        gp_loss = jnp.sum(
            jax.vmap(eb.kl_closed)(k_prior, mu.T, log_var.T)
        )
    elif cfg.type_KL == "GPapprox":
        ops = eb.gp_block_operators(
            cfg.spec0, cfg.spec1, gp.kp0, gp.kp1, noise, xb, tdata.z,
            block_mask, cfg.eps,
        )

        def one_sample(key):
            zb = mv.sample_latent(key, mu_b, lv_b)
            return -jnp.sum(eb.gp_elbo(ops, zb))

        keys = jax.random.split(k_sample, cfg.num_samples)
        gp_loss = jnp.mean(jax.vmap(one_sample)(keys))
    elif cfg.type_KL == "GPapprox_closed":
        ops = eb.gp_block_operators(
            cfg.spec0, cfg.spec1, gp.kp0, gp.kp1, noise, xb, tdata.z,
            block_mask, cfg.eps,
        )
        gp_loss = jnp.sum(eb.dubo(ops, mu_b, lv_b))
    else:
        raise ValueError(f"Unsupported type_KL {cfg.type_KL!r}")

    if cfg.loss_function == "mse":
        gp_rep = gp_loss / cfg.latent_dim
        net = recon_loss + cfg.weight * gp_rep
    else:
        gp_rep = gp_loss
        net = nll_loss + gp_rep
    return net, StandardMetrics(net=net, recon=recon_loss, nll=nll_loss, gp=gp_rep)


def make_standard_step(model, cfg: StandardConfig, optimizer):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state: StandardState, tdata, block_mask):
        rng, key = jax.random.split(state.rng)
        (net, metrics), grads = jax.value_and_grad(
            lambda tr: full_batch_loss(model, cfg, tr, tdata, block_mask, key),
            has_aux=True,
        )(state.trainables)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainables)
        trainables = optax.apply_updates(state.trainables, updates)
        if cfg.constrain_scales:
            # pin likelihood noise back to 1 after the step (training.py:590-592)
            gp = trainables.gp._replace(
                raw_noise=jnp.full_like(
                    trainables.gp.raw_noise, kx.unconstrain(1.0)
                )
            )
            trainables = trainables._replace(gp=gp)
        return (
            StandardState(trainables, opt_state, rng, state.step + 1),
            metrics,
        )

    return step_fn


class StandardTrainer:
    """Full-batch trainer driver (training.py:483-600 / 240-429 control flow).

    With ``pseudo_minibatch=True`` this is the GPPVAE-equivalent regime: the
    gradient is mathematically identical (chain rule over cached encodings),
    computed as one full-batch step with encoder rematerialisation.
    """

    def __init__(
        self,
        model,
        cfg: StandardConfig,
        dataset,
        blocks,
        z: Optional[np.ndarray],
        learning_rate: float = 1e-3,
        seed: int = 0,
        dtype=jnp.float32,
        pseudo_minibatch: bool = False,
    ):
        self.model = model
        self.cfg = cfg
        self.pseudo_minibatch = pseudo_minibatch
        self.optimizer = st.make_optimizer(learning_rate)
        self.step_fn = make_standard_step(model, cfg, self.optimizer)
        self.dtype = dtype
        self.block_mask = jnp.asarray(blocks.mask, dtype)
        n = len(dataset)
        order = blocks.index.reshape(-1)  # subject-major ordering
        assert blocks.mask.all(), (
            "standard regimes require fixed-T cohorts (varying_T needs hensman, "
            "LVAE.py:42)"
        )
        self.tdata = st.TrainData(
            data=jnp.asarray(dataset.data[order], dtype),
            labels=jnp.asarray(dataset.labels[order], dtype),
            pixmask=jnp.asarray(dataset.mask[order], dtype),
            z=jnp.asarray(
                z if z is not None else np.zeros((1, dataset.labels.shape[1])),
                dtype,
            ),
        )
        self.order = order

        key = jax.random.key(seed)
        k_init, k_state = jax.random.split(key)
        vae_params = jax.jit(lambda k, x: model.init(k, x, deterministic=True))(
            k_init, self.tdata.data[: blocks.t_max]
        )
        gp = st.init_gp_params(
            cfg.spec0 if cfg.type_KL != "closed" else cfg.spec0,
            cfg.spec1 if cfg.spec1 is not None else kx.KernelSpec(components=()),
            cfg.latent_dim,
            constrain_scales=cfg.constrain_scales,
            dtype=dtype,
        )
        trainables = st.Trainables(vae=vae_params, gp=gp, m=None, h_factor=None)
        self.state = StandardState(
            trainables=trainables,
            opt_state=self.optimizer.init(trainables),
            rng=k_state,
            step=jnp.zeros((), jnp.int32),
        )
        self.history: list = []

    def run_epoch(self):
        self.state, metrics = self.step_fn(self.state, self.tdata, self.block_mask)
        m = jax.tree.map(float, metrics)
        self.history.append(m)
        return m

    def fit(self, epochs: int, log_every: int = 1, callback=None, chunk: int = 1):
        del chunk  # full-batch epochs are already one dispatch each
        for epoch in range(1, epochs + 1):
            m = self.run_epoch()
            if log_every and epoch % log_every == 0:
                print(
                    "Iter %d/%d - Loss: %.3f  - GP loss: %.3f  - NLL Loss: %.3f"
                    "  - Recon Loss: %.3f" % (epoch, epochs, m.net, m.gp, m.nll, m.recon),
                    flush=True,
                )
            if callback is not None:
                callback(self, epoch, m)
        return self.history
