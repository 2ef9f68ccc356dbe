"""GPPVAE pseudo-minibatch regime (mini_batch=True): literal five phases.

Verifies the rebuild of ``minibatch_training`` (training.py:240-429 in the
reference): the five-phase gradient splice — no-grad encode, GP loss on
cached encodings, cotangent splice through per-subject encoder replays, one
optimiser step — and PROVES the chain-rule claim the reference leaves
implicit: with a deterministic encoder the spliced gradient equals one
full-batch ``jax.grad`` of ``recon(θ) + w/L·gp(μ(θ), logvar(θ))``.
"""

from __future__ import annotations

import functools

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from lvae_tpu.data.blocks import build_subject_blocks
from lvae_tpu.data.datasets import ArrayDataset
from lvae_tpu.models import vae as mv
from lvae_tpu.ops import elbo as eb
from lvae_tpu.ops import kernels as kx
from lvae_tpu.train import standard as ts
from lvae_tpu.train import state as st


def tiny_cohort(p=4, t=3, num_dim=12, seed=0):
    rng = np.random.default_rng(seed)
    n = p * t
    labels = np.stack(
        [
            np.tile(np.arange(t), p).astype(float),
            np.repeat(rng.normal(size=p), t),
            np.repeat(np.arange(p), t).astype(float),
            np.repeat(rng.integers(0, 2, p), t).astype(float),
        ],
        axis=1,
    )
    data = rng.uniform(size=(n, num_dim)).astype(np.float64)
    mask = (rng.uniform(size=(n, num_dim)) > 0.2).astype(np.float64)
    return ArrayDataset(data=data, labels=labels, mask=mask)


def make_cfg(type_KL="GPapprox_closed", p=4, t=3, latent_dim=2):
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2],
        sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    return ts.StandardConfig(
        spec0=spec0,
        spec1=spec1,
        latent_dim=latent_dim,
        P_tot=p,
        T=t,
        weight=0.3,
        loss_function="mse",
        type_KL=type_KL,
        num_samples=2,
        constrain_scales=True,
        eps=1e-5,
        dropout=False,
    )


def build(type_KL="GPapprox_closed", p=4, t=3, num_dim=12):
    ds = tiny_cohort(p=p, t=t, num_dim=num_dim)
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    cfg = make_cfg(type_KL, p=p, t=t)
    model = mv.SimpleVAE(latent_dim=cfg.latent_dim, num_dim=num_dim, dtype=jnp.float64)
    z = st.init_inducing_points(ds.labels, m_inducing=6, seed=0)
    trainer = ts.StandardTrainer(
        model, cfg, ds, blocks, z, seed=0, dtype=jnp.float64,
        pseudo_minibatch=True,
    )
    return ds, blocks, cfg, model, trainer


def test_five_phase_equals_full_batch_gradient():
    """training.py:240-429's splice == one full-batch grad, to f64 precision."""
    ds, blocks, cfg, model, trainer = build()
    p, t = blocks.mask.shape
    tdata = trainer.tdata
    block_mask = trainer.block_mask
    # flax initialises params in f32 (param_dtype default); cast to f64 so the
    # two gradient paths can be compared beyond f32 machine precision.
    trainables = jax.tree.map(
        lambda a: a.astype(jnp.float64), trainer.state.trainables
    )
    key = jax.random.key(7)

    grads_5p, metrics = jax.jit(
        lambda tr: ts.gppvae_grads(model, cfg, tr, tdata, block_mask, key)
    )(trainables)

    # Full-batch comparator: same loss, same per-subject recon sample keys
    # (gppvae_grads splits its rng into (drop1, gp, recon, drop2) and folds
    # the subject index into the recon key).
    _, _, k_recon, _ = jax.random.split(key, 4)
    data_b = tdata.data.reshape((p, t) + tdata.data.shape[1:])
    pix_b = tdata.pixmask.reshape((p, t) + tdata.pixmask.shape[1:])

    def full_loss(tr):
        mu, lv = model.apply(tr.vae, tdata.data, deterministic=True, method="encode")
        noise = jnp.ones_like(tr.gp.raw_noise)
        xb = tdata.labels.reshape(p, t, -1)
        ops = eb.gp_block_operators(
            cfg.spec0, cfg.spec1, tr.gp.kp0, tr.gp.kp1, noise, xb, tdata.z,
            block_mask, cfg.eps,
        )
        gp_raw = jnp.sum(
            eb.dubo(ops, mu.reshape(p, t, -1), lv.reshape(p, t, -1))
        )
        total = cfg.weight * gp_raw / cfg.latent_dim
        raw_log_vy = tr.vae["params"]["raw_log_vy"]
        for i in range(p):
            recon, _, _ = model.apply(
                tr.vae, data_b[i], rng=jax.random.fold_in(k_recon, i),
                deterministic=True,
            )
            mse_i, _ = mv.vae_loss(raw_log_vy, recon, data_b[i], pix_b[i])
            total = total + jnp.sum(mse_i)
        return total

    grads_fb = jax.grad(full_loss)(trainables)

    flat_5p, _ = jax.flatten_util.ravel_pytree(
        (grads_5p.vae, grads_5p.gp.kp0, grads_5p.gp.kp1)
    )
    flat_fb, _ = jax.flatten_util.ravel_pytree(
        (grads_fb.vae, grads_fb.gp.kp0, grads_fb.gp.kp1)
    )
    denom = np.abs(np.asarray(flat_fb)) + 1e-12
    rel = np.max(np.abs(np.asarray(flat_5p) - np.asarray(flat_fb)) / denom)
    assert rel < 1e-10, rel
    # likelihood noise receives no gradient in this regime (training.py:352-355)
    assert np.all(np.asarray(grads_5p.gp.raw_noise) == 0.0)
    assert np.isfinite(float(metrics.net))


def test_gppvae_trainer_decreases_loss():
    _, _, _, _, trainer = build()
    first = trainer.run_epoch()
    for _ in range(15):
        last = trainer.run_epoch()
    assert np.isfinite(last.net)
    assert last.net < first.net, (first, last)
    # noise parameter untouched across the whole run
    assert np.allclose(
        np.asarray(trainer.state.trainables.gp.raw_noise),
        np.asarray(kx.unconstrain(1.0)),
    )


def test_gppvae_gpapprox_sampled_path_runs():
    _, _, _, _, trainer = build(type_KL="GPapprox")
    m = trainer.run_epoch()
    assert np.isfinite(m.net)


def test_gppvae_rejects_closed_kl():
    """The reference asserts GPapprox(_closed) only (training.py:285)."""
    with pytest.raises(ValueError, match="mini_batch"):
        build(type_KL="closed")


def _fresh_trainer(pseudo_minibatch: bool, type_KL="GPapprox_closed"):
    ds = tiny_cohort()
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    cfg = make_cfg(type_KL)
    model = mv.SimpleVAE(latent_dim=cfg.latent_dim, num_dim=12, dtype=jnp.float64)
    z = st.init_inducing_points(ds.labels, m_inducing=6, seed=0)
    return ts.StandardTrainer(
        model, cfg, ds, blocks, z, seed=0, dtype=jnp.float64,
        pseudo_minibatch=pseudo_minibatch,
    )


@pytest.mark.parametrize("pseudo_minibatch", [False, True])
def test_chunked_fit_equals_per_epoch_loop(pseudo_minibatch):
    """fit(chunk=4) (one lax.scan dispatch per chunk, incl. a remainder
    chunk) reproduces the per-epoch run_epoch trajectory exactly — the
    chunked multi-epoch dispatch added so full-batch regimes stop paying one
    remote round trip + host metric sync per epoch (train/hensman.py
    dispatch model)."""
    ref = _fresh_trainer(pseudo_minibatch)
    for _ in range(6):
        ref.run_epoch()

    chunked = _fresh_trainer(pseudo_minibatch)
    cb_epochs = []
    chunked.fit(
        6, log_every=0, chunk=4,
        callback=lambda _t, e, _m: cb_epochs.append(e),
    )
    assert cb_epochs == [4, 6]  # chunk boundaries, hensman fit semantics
    assert len(chunked.history) == len(ref.history) == 6
    for a, b in zip(ref.history, chunked.history):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-10, atol=0
        )
    for pa, pb in zip(
        jax.tree.leaves(ref.state.trainables),
        jax.tree.leaves(chunked.state.trainables),
    ):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=1e-10, atol=1e-12
        )
