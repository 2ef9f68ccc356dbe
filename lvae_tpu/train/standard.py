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

``minibatch_training`` (``mini_batch=True``, the GPPVAE-style pseudo-minibatch
regime) is implemented literally: the five-phase gradient splice of
training.py:294-399 — (1) no-grad full-dataset encode, (2) GP loss on the
cached encodings, (3) its gradients w.r.t. the encodings and kernel params,
(4) per-subject encoder replays that splice the cached cotangents through the
encoder via VJP alongside the reconstruction gradient, (5) one optimiser step
— as :func:`gppvae_grads`. With a deterministic encoder this equals the
full-batch gradient of ``recon(θ) + gp(μ(θ), logvar(θ))`` by the chain rule
(proved to 1e-12 in tests/test_gppvae.py), while bounding peak activation
memory to one subject's batch, exactly the regime's purpose.
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
    spec0: kx.KernelSpec
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
    # three disjoint streams: dropout, encoder reparameterisation, GP-bound
    # latent samples — k_sample must not be re-split after the encoder
    # consumed it (split children share the parent's counter stream, so the
    # GPapprox samples would be deterministically tied to the encoder noise)
    k_drop, k_sample, k_gp = jax.random.split(rng, 3)
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
    # row validity masks ghost alignment padding out of the sums — the NLL
    # adds its Gaussian constant per pixel regardless of the pixel mask
    # (VAE.py:158-160 quirk), so ghost rows would otherwise leak it
    row_valid = block_mask.reshape(-1).astype(mse_i.dtype)
    recon_loss = jnp.sum(mse_i * row_valid)
    nll_loss = jnp.sum(nll_i * row_valid)

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
        # KL_closed sees the FULL additive prior; join the split kernels on
        # the fly so the trainer's params keep the (kp0, kp1) layout every
        # downstream consumer (validate, prediction, generation, serving)
        # expects — the reference's non-split `covar_module` exists only in
        # this loss (training.py:499-513). Ghost rows (block_mask==0 — the
        # sharded wrapper's alignment padding) are decoupled: their prior
        # row/col is the identity and their moments are zeroed, so each
        # contributes exactly 0.5·(1 + 0 − 1 + 0 − 0) = 0 to the KL. With a
        # full mask this reduces verbatim to the unmasked expression.
        spec_full, kp_full = kx.join_specs(cfg.spec0, cfg.spec1, gp.kp0, gp.kp1)
        n_rows = tdata.labels.shape[0]
        valid = block_mask.reshape(n_rows).astype(mu.dtype)
        k_full = kx.kernel_matrix(spec_full, kp_full, tdata.labels, tdata.labels)
        k_full = k_full * (valid[:, None] * valid[None, :])
        diag_add = valid * noise[:, None] + (1.0 - valid)  # [L, N]
        k_prior = k_full + diag_add[:, :, None] * jnp.eye(n_rows, dtype=mu.dtype)
        gp_loss = jnp.sum(
            jax.vmap(eb.kl_closed)(k_prior, mu.T * valid, log_var.T * valid)
        )
    elif cfg.type_KL == "GPapprox":
        ops = eb.gp_block_operators(
            cfg.spec0, cfg.spec1, gp.kp0, gp.kp1, noise, xb, tdata.z,
            block_mask, cfg.eps,
        )

        def one_sample(key):
            zb = mv.sample_latent(key, mu_b, lv_b)
            return -jnp.sum(eb.gp_elbo(ops, zb))

        keys = jax.random.split(k_gp, cfg.num_samples)
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


def gppvae_grads(
    model,
    cfg: StandardConfig,
    trainables: st.Trainables,
    tdata: st.TrainData,
    block_mask: jax.Array,
    rng: jax.Array,
) -> Tuple[st.Trainables, StandardMetrics]:
    """Literal five-phase GPPVAE pseudo-minibatch gradient (training.py:240-429).

    Phase 1 — encode the whole dataset without gradients (training.py:301-311).
    Phases 2-3 — GP loss on the cached ``full_mu``/``full_log_var`` leaves;
    gradients w.r.t. those leaves and the kernel hyper-parameters
    (training.py:321-360). The likelihood noise receives no gradient — the
    reference's ``param_list`` collects only ``covar_module`` parameters
    (training.py:352-355).
    Phase 4 — replay the encoder per batch (batch = one subject: the reference
    uses ``batch_size=T, shuffle=False``, training.py:282-284), splicing the
    cached cotangents through ``mu``/``log_var`` with a VJP while accumulating
    the reconstruction gradient (training.py:365-387).
    Phase 5 is the caller's single optimiser step (training.py:399).
    """
    p, t = block_mask.shape
    latent = cfg.latent_dim
    k_drop1, k_gp, k_recon, k_drop2 = jax.random.split(rng, 4)

    # Phase 1: no-grad full-dataset encode.
    full_mu, full_lv = jax.lax.stop_gradient(
        model.apply(
            trainables.vae,
            tdata.data,
            deterministic=not cfg.dropout,
            rngs={"dropout": k_drop1},
            method="encode",
        )
    )

    # Phases 2-3: GP loss on the cached encodings.
    def gp_loss_fn(gp: st.GPParams, mu_flat, lv_flat):
        noise = (
            jnp.ones_like(gp.raw_noise)
            if cfg.constrain_scales
            else kx.constrain(jax.lax.stop_gradient(gp.raw_noise))
        )
        xb = tdata.labels.reshape(p, t, -1)
        mu_b = mu_flat.reshape(p, t, latent)
        lv_b = lv_flat.reshape(p, t, latent)
        ops = eb.gp_block_operators(
            cfg.spec0, cfg.spec1, gp.kp0, gp.kp1, noise, xb, tdata.z,
            block_mask, cfg.eps,
        )
        if cfg.type_KL == "GPapprox":
            def one_sample(key):
                zb = mv.sample_latent(key, mu_b, lv_b)
                return -jnp.sum(eb.gp_elbo(ops, zb))

            keys = jax.random.split(k_gp, cfg.num_samples)
            gp_raw = jnp.mean(jax.vmap(one_sample)(keys))
        elif cfg.type_KL == "GPapprox_closed":
            gp_raw = jnp.sum(eb.dubo(ops, mu_b, lv_b))
        else:
            # the reference asserts these two regimes (training.py:285)
            raise ValueError(f"mini_batch supports GPapprox(_closed), got {cfg.type_KL!r}")
        # mse path scales BEFORE differentiation so the spliced cotangents
        # carry weight/latent_dim (training.py:356-358)
        scaled = (
            cfg.weight * gp_raw / latent if cfg.loss_function == "mse" else gp_raw
        )
        return scaled, gp_raw

    (gp_scaled, gp_raw), (gp_grads, mu_ct, lv_ct) = jax.value_and_grad(
        gp_loss_fn, argnums=(0, 1, 2), has_aux=True
    )(trainables.gp, full_mu, full_lv)

    # Phase 4: per-subject encoder replay + cotangent splice.
    data_b = tdata.data.reshape((p, t) + tdata.data.shape[1:])
    pix_b = tdata.pixmask.reshape((p, t) + tdata.pixmask.shape[1:])
    mu_ct_b = mu_ct.reshape(p, t, latent)
    lv_ct_b = lv_ct.reshape(p, t, latent)

    def batch_grad(vae_acc, inp):
        i, xb_, pixm, mct, lct = inp
        k_i = jax.random.fold_in(k_recon, i)
        kd_i = jax.random.fold_in(k_drop2, i)

        def fwd(vp):
            recon, mu, lv = model.apply(
                vp, xb_, rng=k_i,
                deterministic=not cfg.dropout, rngs={"dropout": kd_i},
            )
            raw_log_vy = vp["params"]["raw_log_vy"]
            if cfg.vy_fixed:
                raw_log_vy = jax.lax.stop_gradient(raw_log_vy)
            mse_i, nll_i = mv.vae_loss(raw_log_vy, recon, xb_, pixm)
            recon_l = jnp.sum(mse_i)
            nll_l = jnp.sum(nll_i)
            primal = recon_l if cfg.loss_function == "mse" else nll_l
            return (primal, mu, lv), (recon_l, nll_l)

        (primal, mu, lv), vjp_fn, aux = jax.vjp(fwd, trainables.vae, has_aux=True)
        # 1·d(recon)/dθ + mu.backward(mu_grads) + log_var.backward(lv_grads)
        # (training.py:378-384)
        (g,) = vjp_fn((jnp.ones_like(primal), mct, lct))
        return jax.tree.map(jnp.add, vae_acc, g), aux

    zero_vae = jax.tree.map(jnp.zeros_like, trainables.vae)
    vae_grads, (recon_ls, nll_ls) = jax.lax.scan(
        batch_grad,
        zero_vae,
        (jnp.arange(p), data_b, pix_b, mu_ct_b, lv_ct_b),
    )

    recon_sum = jnp.sum(recon_ls)
    nll_sum = jnp.sum(nll_ls)
    gp_rep = gp_raw / latent if cfg.loss_function == "mse" else gp_raw
    net = (
        recon_sum + cfg.weight * gp_rep
        if cfg.loss_function == "mse"
        else nll_sum + gp_rep
    )
    grads = st.Trainables(vae=vae_grads, gp=gp_grads, m=None, h_factor=None)
    metrics = StandardMetrics(net=net, recon=recon_sum, nll=nll_sum, gp=gp_rep)
    return grads, metrics


def make_gppvae_step(model, cfg: StandardConfig, optimizer):
    """One pseudo-minibatch epoch: five phases + one optimiser step.

    Returns the UN-jitted epoch body; :class:`StandardTrainer` wraps it both
    as a jitted single step and as a multi-epoch ``lax.scan`` chunk.
    """

    def step_fn(state: StandardState, tdata, block_mask):
        rng, key = jax.random.split(state.rng)
        grads, metrics = gppvae_grads(
            model, cfg, state.trainables, tdata, block_mask, key
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainables)
        trainables = optax.apply_updates(state.trainables, updates)
        # No noise re-pinning here: minibatch_training never resets the
        # likelihood (contrast training.py:590-592), and the GP loss gives it
        # no gradient, so raw_noise simply stays at its initial value.
        return (
            StandardState(trainables, opt_state, rng, state.step + 1),
            metrics,
        )

    return step_fn


def make_standard_step(model, cfg: StandardConfig, optimizer):
    """One full-batch epoch body (un-jitted; see :func:`make_gppvae_step`)."""

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

    With ``pseudo_minibatch=True`` each epoch runs the literal five-phase
    GPPVAE gradient splice (:func:`gppvae_grads`) instead of one full-batch
    ``value_and_grad`` — behaviourally distinct (per-subject encoder batches,
    bounded activation memory, no likelihood-noise gradient), and proved
    chain-rule-equal to the full-batch gradient in tests/test_gppvae.py.
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
        if cfg.spec1 is None:
            # normalise once so every loss path can dereference cfg.spec1
            # (an un-normalised None used to survive until the first jitted
            # step and die there as an opaque trace-time AttributeError)
            cfg = cfg._replace(spec1=kx.KernelSpec(components=()))
        self.cfg = cfg
        if pseudo_minibatch and cfg.type_KL not in ("GPapprox", "GPapprox_closed"):
            # the reference asserts the same (training.py:285)
            raise ValueError(
                f"mini_batch supports GPapprox(_closed), got {cfg.type_KL!r}"
            )
        self.pseudo_minibatch = pseudo_minibatch
        self.optimizer = st.make_optimizer(learning_rate)
        body = (
            make_gppvae_step(model, cfg, self.optimizer)
            if pseudo_minibatch
            else make_standard_step(model, cfg, self.optimizer)
        )
        self.step_fn = jax.jit(body, donate_argnums=(0,))

        # multi-epoch dispatch: one remote round trip per CHUNK of epochs —
        # a per-epoch loop pays dispatch + host metric sync per epoch, which
        # dominates on the remote-attached chip (train/hensman.py docstring)
        @functools.partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
        def epochs_fn(state, tdata, block_mask, n_epochs):
            def scan_body(s, _):
                return body(s, tdata, block_mask)

            return jax.lax.scan(scan_body, state, length=n_epochs)

        self.epochs_fn = epochs_fn
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
            cfg.spec0,
            cfg.spec1,
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

    def _dispatch_epochs(self, n: int):
        """Dispatch an ``n``-epoch chunk; return its DEVICE metrics (no sync)."""
        self.state, ms = self.epochs_fn(self.state, self.tdata, self.block_mask, n)
        return ms

    def _materialize_metrics(self, ms, n: int):
        # device_get issues copy_to_host_async on every leaf BEFORE blocking;
        # a per-leaf np.asarray loop pays one serial relay round trip per
        # metric on the remote chip (measured: tools/overlap_probe.py —
        # lag1 23.96 vs lag1_deviceget 13.53 ms/epoch at chunk=5)
        ms = jax.device_get(ms)  # [n]-stacked StandardMetrics
        out = [StandardMetrics(*(float(a[i]) for a in ms)) for i in range(n)]
        self.history.extend(out)
        return out

    def run_epochs(self, n: int):
        """Run ``n`` epochs as ONE dispatch; one host metric transfer total."""
        return self._materialize_metrics(self._dispatch_epochs(n), n)

    def _log_chunk(self, ms, done: int, epochs: int, log_every: int):
        for i, m in enumerate(ms):
            epoch = done + i + 1
            if log_every and epoch % log_every == 0:
                print(
                    "Iter %d/%d - Loss: %.3f  - GP loss: %.3f  - NLL Loss: %.3f"
                    "  - Recon Loss: %.3f"
                    % (epoch, epochs, m.net, m.gp, m.nll, m.recon),
                    flush=True,
                )

    def fit(
        self,
        epochs: int,
        log_every: int = 1,
        callback=None,
        chunk: int = 25,
        overlap=None,
    ):
        # chunk semantics match HensmanTrainer.fit: `chunk` epochs per
        # dispatch, per-epoch logs from the stacked metrics, callback at
        # chunk boundaries (the pipeline gcd-aligns chunk to its cadences).
        # Without a callback the overlapped schedule applies (one-chunk lag
        # on metric reads — train/hensman.use_overlapped_fit, same measured
        # rationale: the remote execute round trip hides behind device time).
        from lvae_tpu.train.hensman import _overlap_active

        if callback is None and _overlap_active(overlap):
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
                    self._log_chunk(
                        self._materialize_metrics(pms, pn), printed, epochs,
                        log_every,
                    )
                    printed += pn
                pending = nxt
            return self.history
        done = 0
        while done < epochs:
            n = min(max(chunk, 1), epochs - done)
            ms = self.run_epochs(n)
            self._log_chunk(ms, done, epochs, log_every)
            done += n
            if callback is not None:
                if callback(self, done, ms[-1]) == "rollback":
                    # failure recovery restored the previous chunk's
                    # snapshot — replay these epochs (pipeline._recover)
                    done -= n
        return self.history
