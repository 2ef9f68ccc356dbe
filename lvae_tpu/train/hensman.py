"""Hensman/SVI training: true mini-batching with natural gradients.

TPU-native rebuild of the reference's primary regime, ``hensman_training``
(training.py:15-237 in SidRama/Longitudinal-VAE). Differences by design:

* Whole epochs — and multi-epoch chunks — are ONE jitted program: subject
  permutations are drawn ON DEVICE from the carried PRNG key and batches are
  gathers from resident arrays. (The reference's per-batch Python loop ships
  every batch host→device; on a remote-attached TPU each transfer costs a
  full round trip, which dominated early profiles of this trainer.)
* The natural-gradient update of (m, H) (training.py:129-135) happens inside
  the scanned step — no host round trip between batches.
* Fixed-T and varying-T cohorts share one code path via padded blocks +
  validity masks (replacing ``minibatch_KLD_upper_bound_iter``'s subject
  loop); ghost subjects padding the final batch contribute exactly zero and
  the true subject count drives the P/P_batch scaling (training.py:111-118).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lvae_tpu.models import vae as mv
from lvae_tpu.ops import elbo as eb
from lvae_tpu.ops import kernels as kx
from lvae_tpu.ops import linalg as la
from lvae_tpu.train import state as st

# Pre-gather each epoch's shuffled batches ONCE: three whole-table takes at
# the top of the epoch build [n_batches, S·T, ...] stacks that the batch scan
# consumes as xs (lax.scan slices each step's block with a dynamic-slice),
# replacing three per-step jnp.take gathers plus the layout copies XLA
# inserted between the row-major gather outputs and the conv path's NHWC
# tiling (~12 ms of the 329 ms measured 25-epoch chunk,
# tools/measure_roofline.py r3). Values match exactly: gathering the permuted
# cohort then slicing batch i ≡ gathering batch i's rows (conv metrics may
# differ by reduction reassociation only). MEASURED NEGATIVE on the v5e
# flagship epoch (tools/ab_fastpaths.py --arms nopregather,pregather,
# 2026-08-19): 14.58 vs 13.15 ms device, measured HBM 1.54 → 2.02 GB/epoch —
# the epoch-wide xs stacks round-trip HBM (written by the gathers, re-read by
# the scan) while per-step gather outputs feed the conv directly; the copy
# elimination doesn't pay for the extra traffic. Default stays OFF; kept as
# an opt-in (LVAE_PREGATHER=1) for gather-bound workloads. Multi-device mesh
# traces always keep the per-step gathers (the epoch-wide stacks would need
# their own data-axis placements and would muddy the compiled-HLO partition
# proofs, tests/test_sharding.py).
use_epoch_pregather: Optional[bool] = None
PREGATHER_AUTO_DEFAULT = False  # by the measured on-chip A/B above
_pg_env = os.environ.get("LVAE_PREGATHER", "").strip().lower()
if _pg_env in ("1", "true", "on"):
    use_epoch_pregather = True
elif _pg_env in ("0", "false", "off"):
    use_epoch_pregather = False
elif _pg_env:
    raise ValueError(
        f"LVAE_PREGATHER={os.environ['LVAE_PREGATHER']!r}: expected 0/1"
    )


def _pregather_active(mesh) -> bool:
    if mesh is not None and mesh.size > 1:
        return False
    if use_epoch_pregather is not None:
        return use_epoch_pregather
    return PREGATHER_AUTO_DEFAULT


# Flat-view minibatch gather: gather frame rows from a 2-D [N, H·W] view of
# the table and reshape the small batch back to NHWC, instead of gathering
# from the 4-D table directly. XLA propagates the conv's batch-minor layout
# ({0,3,2,1}) into the whole table, which turns the row gather into a
# strided walk — the P=1000 trace's #1 self-time op (fusion.626: 414 µs
# /batch at 23 GB/s, 12 % of the epoch). The 2-D view keeps rows contiguous
# (the gather runs near memcpy speed); the batch pays one small relayout
# copy into the conv layout instead (measured 576 GB/s). The table is
# flattened ONCE at the top of epochs_fn — an in-scan reshape is NOT
# hoisted by XLA and ran the whole-table copy per step (measured 3×
# regression at P=10k). Values identical (pure layout). On-chip A/B
# (benchmarks/README.md "fast-path A/B round 10"): P=1000 68.9 →
# 58.2 ms/epoch (−15.5 %), P=10k 784 → 693 ms, but P=200 slightly worse
# (op-latency-bound, the extra copy op costs more than the small table's
# gather) — so the auto gate is SHAPE-KEYED: flat gather engages when the
# frame table has ≥ FLATGATHER_MIN_ROWS rows (between the two measured
# scales). Env override LVAE_FLATGATHER=0/1 forces either way.
use_flat_gather: Optional[bool] = None
FLATGATHER_MIN_ROWS = 10_000  # 4k rows measured negative, 20k positive
_fg_env = os.environ.get("LVAE_FLATGATHER", "").strip().lower()
if _fg_env in ("1", "true", "on"):
    use_flat_gather = True
elif _fg_env in ("0", "false", "off"):
    use_flat_gather = False
elif _fg_env:
    raise ValueError(
        f"LVAE_FLATGATHER={os.environ['LVAE_FLATGATHER']!r}: expected 0/1"
    )


def _flat_gather_active(n_rows: int) -> bool:
    if use_flat_gather is not None:
        return use_flat_gather
    return n_rows >= FLATGATHER_MIN_ROWS


# Overlapped chunk dispatch: ``fit`` without a callback dispatches chunk k+1
# BEFORE materialising chunk k's metrics (a one-chunk lag). The remote-relay
# execute round trip (~103.5 ms/dispatch, tools/chunk_sweep.py) then overlaps
# the next chunk's device execution instead of serialising with it. Values
# are identical — the dispatch sequence (programs, order, inputs) is
# unchanged; only WHEN the host reads the metrics moves. The callback path
# keeps the synced loop: the callback contract hands it a trainer whose state
# is current at the chunk boundary (checkpoint/validate/rollback).
# Env override LVAE_OVERLAP=0/1 for A/B.
#
# Default ON by the measured on-chip probe (tools/overlap_probe.py,
# 2026-08-19, K=8 chunks × 25 epochs, interleaved reps): sync 17.90 →
# lag1 13.95 ms/epoch wall (device ≈ 13.15; dispatch-return latency ~1 ms,
# i.e. the relay accepts a second execute while the first runs). Backend-
# agnostic and value-identical, so it stays on for CPU too.
use_overlapped_fit: Optional[bool] = None
OVERLAP_AUTO_DEFAULT = True
_ov_env = os.environ.get("LVAE_OVERLAP", "").strip().lower()
if _ov_env in ("1", "true", "on"):
    use_overlapped_fit = True
elif _ov_env in ("0", "false", "off"):
    use_overlapped_fit = False
elif _ov_env:
    raise ValueError(
        f"LVAE_OVERLAP={os.environ['LVAE_OVERLAP']!r}: expected 0/1"
    )


def _overlap_active(explicit: Optional[bool]) -> bool:
    if explicit is not None:
        return explicit
    if use_overlapped_fit is not None:
        return use_overlapped_fit
    return OVERLAP_AUTO_DEFAULT


# bf16 FRAME TABLE: when the VAE computes in bf16 (models/vae.auto_model_
# dtype), store the device-resident frame/pixmask tables in bf16 too. The
# conv path is value-identical (the bf16 compute model casts its input to
# bf16 anyway — pre-quantizing the table is the same cast done once), and
# the per-step row gather — a top HBM op of the P=1000 budget
# (tools/device_budget.py gather_layout) — moves half the bytes. The loss
# TARGET is upcast back to f32 in batch_loss, so the only numerics change
# is the MSE/NLL target quantized to the bf16 grid (≤1 ulp ≈ 0.4 % of a
# unit pixel) — the same order as the bf16 compute change itself,
# re-validated by the armed accuracy protocol. Labels/z (the GP side)
# ALWAYS stay in the GP dtype. Env override LVAE_TABLE_BF16=0/1.
# MEASURED NEGATIVE on the P=1000/bf16 flagship (2026-08-20, fresh process
# per arm, spb=100): 42.93 → 45.56 ms/epoch (+6 %) — the f32 upcast of the
# loss target adds an op per step and the half-width gather rows (2.6 KB)
# DMA worse than the f32 rows; the byte saving doesn't pay. Auto default
# stays OFF; kept as an opt-in for gather-dominated workloads where the
# frame table dwarfs VMEM (P>=10k pretraining-style epochs).
use_bf16_table: Optional[bool] = None
TABLE_BF16_AUTO_DEFAULT = False
_tb_env = os.environ.get("LVAE_TABLE_BF16", "").strip().lower()
if _tb_env in ("1", "true", "on"):
    use_bf16_table = True
elif _tb_env in ("0", "false", "off"):
    use_bf16_table = False
elif _tb_env:
    raise ValueError(
        f"LVAE_TABLE_BF16={os.environ['LVAE_TABLE_BF16']!r}: expected 0/1"
    )


def _bf16_table_active(model, dtype) -> bool:
    if getattr(model, "dtype", None) != jnp.bfloat16 or dtype != jnp.float32:
        return False
    if use_bf16_table is not None:
        return use_bf16_table
    return TABLE_BF16_AUTO_DEFAULT


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
    vy_fixed: bool = False  # freeze the observation noise (VAE.py:41-42)
    learn_inducing: bool = False  # optimise inducing points (LVAE.py:208 intent)


class StepMetrics(NamedTuple):
    net: jax.Array
    recon: jax.Array
    nll: jax.Array
    kld: jax.Array


class BlockTable(NamedTuple):
    """Device-resident padded subject-block table (P padded to a multiple of
    the batch size; ghost rows carry zero mask)."""

    index: jax.Array  # [P_pad, T] int32
    mask: jax.Array  # [P_pad, T]
    num_real: int  # true subject count P


def _noise_from(gp: st.GPParams, cfg: HensmanConfig) -> jax.Array:
    if cfg.constrain_scales:
        # Likelihood noise pinned to 1 with raw_noise frozen (LVAE.py:186-188:
        # `likelihoods.noise = 1; raw_noise.requires_grad = False`). Because
        # the loss never reads raw_noise on this branch its gradient is
        # exactly zero, so Adam leaves it at its init value unconstrain(1.0)
        # (st.init_gp_params) — the same fixed point as the reference's
        # requires_grad=False, verified in tests/test_training.py.
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
    mesh=None,
    pre: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
    frame_shape: Optional[Tuple[int, ...]] = None,
) -> Tuple[jax.Array, Tuple[StepMetrics, Optional[eb.NaturalGradients]]]:
    """Net loss of one subject batch (training.py:103-124 semantics).

    With ``mesh`` set, the per-subject batch tensors carry explicit
    ``with_sharding_constraint``s putting the subject axis on 'data' (and,
    via propagation, the latent axis of every [L, S, T, ·] kernel stack on
    'latent') — so GSPMD provably partitions the block Cholesky chains
    instead of replicating them, and the KLD's subject sums lower to psum
    over the data axis (SURVEY.md §2.2). Verified against compiled HLO in
    tests/test_sharding.py.
    """
    s, t = idx.shape
    if pre is None:
        flat_idx = idx.reshape(-1)
        x = jnp.take(tdata.data, flat_idx, axis=0)
        labels = jnp.take(tdata.labels, flat_idx, axis=0)
        pixmask = jnp.take(tdata.pixmask, flat_idx, axis=0)
    else:
        # epoch pre-gather (``use_epoch_pregather``): the scan already sliced
        # this batch's rows out of the whole-epoch stacks — same values
        x, labels, pixmask = pre
    if frame_shape is not None and x.ndim == 2:
        # flat-view gather (``use_flat_gather``): the table was flattened
        # ONCE at the top of epochs_fn — restore the frame shape on the
        # small batch only (the conv relayout then touches the batch, not
        # the table)
        x = x.reshape((x.shape[0],) + frame_shape)
    # bf16 frame table (``use_bf16_table``): the conv consumes the bf16
    # batch directly (the bf16 compute model casts its input anyway), but
    # losses/GP algebra accumulate in the GP dtype — upcast the loss
    # TARGET here (labels always stay in the GP dtype)
    f32 = labels.dtype
    x_tgt = x.astype(f32) if x.dtype != f32 else x
    pixmask = pixmask.astype(f32) if pixmask.dtype != f32 else pixmask
    valid = bmask.reshape(-1)

    k_drop, k_sample = jax.random.split(rng)
    recon, mu, log_var = model.apply(
        trainables.vae,
        x,
        rng=k_sample,
        deterministic=not cfg.dropout,
        rngs={"dropout": k_drop},
    )
    # a reduced-precision (bf16) compute model hands back bf16 moments; the
    # GP algebra needs full f32 (labels carry the GP dtype — x may be a
    # bf16 table row)
    mu = mu.astype(f32)
    log_var = log_var.astype(f32)
    raw_log_vy = trainables.vae["params"]["raw_log_vy"]
    if cfg.vy_fixed:
        raw_log_vy = jax.lax.stop_gradient(raw_log_vy)
    mse_i, nll_i = mv.vae_loss(raw_log_vy, recon, x_tgt, pixmask)
    recon_loss = jnp.sum(mse_i * valid)
    nll_loss = jnp.sum(nll_i * valid)

    gp = trainables.gp
    noise = _noise_from(gp, cfg)
    z_pts = (
        trainables.z
        if (cfg.learn_inducing and trainables.z is not None)
        else tdata.z
    )
    xb = (labels * valid[:, None]).reshape(s, t, -1)
    mu_b0 = mu.reshape(s, t, cfg.latent_dim)
    lv_b0 = log_var.reshape(s, t, cfg.latent_dim)
    if mesh is not None and "data" in mesh.axis_names:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def cst(a, spec):
            return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

        xb = cst(xb, P("data", None, None))
        bmask = cst(bmask, P("data", None))
        mu_b0 = cst(mu_b0, P("data", None, None))
        lv_b0 = cst(lv_b0, P("data", None, None))
    if cfg.natural_gradient:
        m_var, psd_h = m_nat, H_nat
    else:
        m_var = trainables.m
        psd_h = st.psd_from_factor(trainables.h_factor)

    # hand H to the operator build so K0zz and H factorise in ONE stacked
    # cholesky_and_inverse call (ops/elbo.use_stacked_mm_chol; identical
    # per-matrix values — the measured epoch is op-latency-bound). Multi-
    # device mesh programs keep the separate calls: the [2L, M, M] stack's
    # local shard would muddy the compiled-HLO partition proofs
    # (tests/test_sharding.py) and the win is a single-chip
    # custom-call-count effect.
    multi_device = mesh is not None and mesh.size > 1
    extra_spd = (
        psd_h
        if eb.use_stacked_mm_chol
        and not multi_device
        and not la.pallas_suppress_active()
        else None
    )
    ops = eb.gp_block_operators(
        cfg.spec0, cfg.spec1, gp.kp0, gp.kp1, noise, xb, z_pts,
        mask=bmask, eps=cfg.eps, extra_spd=extra_spd,
    )

    kld, ng = eb.minibatch_kld(
        ops, m_var, psd_h, mu_b0, lv_b0,
        P_tot=cfg.P_tot, P_batch=p_batch, N_tot=cfg.N_tot,
        natural_gradient=cfg.natural_gradient,
        H_factor=(
            (ops.extra_chol, ops.extra_inv)
            if ops.extra_chol is not None
            else None
        ),
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


def make_epochs_fn(
    model,
    cfg: HensmanConfig,
    optimizer,
    tables,
    subjects_per_batch: int,
    mesh=None,
):
    """Build the jitted multi-epoch runner.

    Returns ``epochs_fn(state, tdata, n_epochs) -> (state, StepMetrics[E])``.
    ``n_epochs`` is static (one compile per distinct chunk size). Per epoch a
    fresh on-device subject permutation is drawn from the carried key; ghost
    rows fill the ragged tail so every batch is ``[S, T]``.

    ``tables`` is one ``BlockTable`` or a tuple of them — one per T-length
    bucket (SURVEY §7 step 7; the TPU-shaped replacement for the reference's
    per-subject ragged loop, elbo_functions.py:219-307). With buckets, one
    epoch visits every bucket in turn: each gets its own in-program
    ``lax.scan`` at its own static ``[S, T_bucket]`` batch shape, so short
    subjects never pay the longest subject's T³ Cholesky blocks. The whole
    multi-bucket epoch remains ONE compiled program / ONE dispatch (the
    remote-chip round-trip economics in the module docstring). With a single
    table the trace is identical to the unbucketed trainer.
    """
    if isinstance(tables, BlockTable):
        tables = (tables,)
    s = subjects_per_batch

    @functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
    def epochs_fn(state, tdata, n_epochs: int):
        # flat-view gather (``use_flat_gather``): flatten the frame table
        # ONCE here, outside both scans — the relayout copy away from the
        # conv's batch-minor layout is paid per dispatch, not per step
        # (measured: an in-scan reshape was NOT hoisted by XLA and cost 3×
        # at P=10k). batch_loss restores ``frame_shape`` on each batch.
        frame_shape = None
        if tdata.data.ndim > 2 and _flat_gather_active(tdata.data.shape[0]):
            frame_shape = tdata.data.shape[1:]
            tdata = tdata._replace(
                data=tdata.data.reshape(tdata.data.shape[0], -1)
            )

        def make_step(table, pregather: bool):
            p_real = table.num_real

            def step(state, xs):
                if pregather:
                    order_rows, b_idx, b_mask, x, labels, pixmask = xs
                    pre = (x, labels, pixmask)
                else:
                    order_rows = xs
                    b_idx = jnp.take(table.index, order_rows, axis=0)
                    b_mask = jnp.take(table.mask, order_rows, axis=0)
                    pre = None
                p_batch = jnp.sum(order_rows < p_real).astype(b_mask.dtype)
                rng, step_key = jax.random.split(state.rng)

                grad_fn = jax.value_and_grad(
                    lambda tr: batch_loss(
                        model, cfg, tr, state.m_nat, state.H_nat,
                        tdata, b_idx, b_mask, p_batch, step_key, mesh=mesh,
                        pre=pre, frame_shape=frame_shape,
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

            return step

        pregather = _pregather_active(mesh)

        def one_epoch(state, _):
            bucket_ms = []
            for table in tables:
                p_pad = table.index.shape[0]
                p_real = table.num_real
                n_batches = p_pad // s
                rng, perm_key = jax.random.split(state.rng)
                state = state._replace(rng=rng)
                perm = jax.random.permutation(perm_key, p_real)
                if p_pad > p_real:
                    perm = jnp.concatenate(
                        [perm, jnp.arange(p_real, p_pad, dtype=perm.dtype)]
                    )
                order = perm.reshape(n_batches, s)
                if pregather:
                    t_dim = table.index.shape[1]
                    rows = jnp.take(table.index, perm, axis=0)  # [P_pad, T]
                    bmask_all = jnp.take(table.mask, perm, axis=0)
                    flat = rows.reshape(-1)
                    xs = (
                        order,
                        rows.reshape(n_batches, s, t_dim),
                        bmask_all.reshape(n_batches, s, t_dim),
                        jnp.take(tdata.data, flat, axis=0).reshape(
                            (n_batches, s * t_dim) + tdata.data.shape[1:]
                        ),
                        jnp.take(tdata.labels, flat, axis=0).reshape(
                            n_batches, s * t_dim, tdata.labels.shape[-1]
                        ),
                        jnp.take(tdata.pixmask, flat, axis=0).reshape(
                            (n_batches, s * t_dim) + tdata.pixmask.shape[1:]
                        ),
                    )
                else:
                    xs = order
                state, ms = jax.lax.scan(make_step(table, pregather), state, xs)
                bucket_ms.append(ms)
            # epoch metric = mean over ALL batches of the epoch (bucketed or
            # not) — the reference averages its per-batch losses uniformly
            ms_cat = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *bucket_ms
            )
            return state, jax.tree.map(jnp.mean, ms_cat)

        state, ms = jax.lax.scan(one_epoch, state, None, length=n_epochs)
        if mesh is not None:
            state = _pin_state_sharding(state, mesh, cfg.latent_dim)
        return state, ms

    return epochs_fn


def _pin_state_sharding(state, mesh, latent_dim: int):
    """Constrain the returned state to the placement the sharded trainer
    feeds in (parallel/mesh.py shard_hensman_state: leading-[L] leaves on
    'latent', the rest replicated). Without this GSPMD is free to hand back
    e.g. the VAE latent-head kernels latent-sharded; the next chunk's AOT
    ``Compiled`` call (HensmanTrainer._executable_for) then REJECTS the
    state whose shardings no longer match the lowered in_shardings — plain
    jit would have silently recompiled every chunk instead."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_lat = mesh.shape["latent"]

    def pin(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x  # scalars (step, rng key) can only be replicated
        if x.shape[0] == latent_dim and latent_dim % n_lat == 0:
            spec = P("latent", *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return jax.tree.map(pin, state)


def build_block_table(blocks, subjects_per_batch: int, dtype=jnp.float32) -> BlockTable:
    """Pad the host block table to a batch multiple and move it on device."""
    p = blocks.num_subjects
    s = subjects_per_batch
    n_batches = (p + s - 1) // s
    p_pad = n_batches * s
    index = np.zeros((p_pad, blocks.t_max), np.int32)
    mask = np.zeros((p_pad, blocks.t_max), np.float32)
    index[:p] = blocks.index
    mask[:p] = blocks.mask
    return BlockTable(
        index=jnp.asarray(index),
        mask=jnp.asarray(mask, dtype),
        num_real=p,
    )


class HensmanTrainer:
    """Python-side orchestration: epochs, validation cadence, best tracking.

    Mirrors the control flow of training.py:84-237 (per-epoch batch loop,
    every-25-epoch validation, best-model checkpoints) around the jitted
    multi-epoch program. ``fit`` dispatches whole chunks of epochs between
    callbacks — on a remote-attached TPU the dispatch+transfer round trip
    costs more than several epochs of compute.
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
        t_buckets: int = 1,
    ):
        import os

        t_model = int(getattr(model, "T", 0) or 0)
        if t_model:
            lens = np.unique(np.asarray(blocks.t_lens))
            if lens.size != 1 or int(lens[0]) != t_model:
                # the recurrence has no validity masking: a short subject's
                # padded slots gather dataset row 0's frames and the
                # bidirectional state would carry them into the REAL
                # timesteps' moments — silently wrong, so refuse loudly
                raise ValueError(
                    f"RNN encoder (T={t_model}) requires a fixed-T cohort "
                    f"with exactly T rows per subject; got subject lengths "
                    f"{sorted(set(np.asarray(blocks.t_lens).tolist()))}. "
                    "Use the MLP/conv encoders for ragged (varying_T) "
                    "cohorts."
                )
        self.model = model
        self.cfg = cfg
        self.blocks = blocks
        self.subjects_per_batch = subjects_per_batch
        self.optimizer = st.make_optimizer(learning_rate)
        # fingerprint of everything the optimizer bakes into the trace but
        # that neither cfg nor the avals capture (AOT cache keying)
        self._opt_key = (learning_rate, os.environ.get("LVAE_OPT", "adam"))
        if t_buckets > 1:
            from lvae_tpu.data import blocks as bk

            bucket_blocks = bk.bucket_subject_blocks(blocks, t_buckets)
        else:
            bucket_blocks = [blocks]
        self.tables = tuple(
            build_block_table(b, subjects_per_batch, dtype) for b in bucket_blocks
        )
        self.epochs_fn = make_epochs_fn(
            model, cfg, self.optimizer, self.tables, subjects_per_batch
        )
        self.dtype = dtype

        # chunked upload for big cohorts: one giant device_put through the
        # remote relay times out at ~GB scale (P=20k's 2 GB frame table,
        # utils/transfer.py); identical values, bounded request sizes.
        # Frame/pixmask tables drop to bf16 when the model computes bf16
        # (``use_bf16_table`` — halves the per-step gather bytes); the GP
        # side (labels, z) always keeps the GP dtype.
        from lvae_tpu.utils.transfer import to_device_chunked

        table_dtype = (
            jnp.bfloat16 if _bf16_table_active(model, dtype) else dtype
        )
        self.tdata = st.TrainData(
            data=to_device_chunked(dataset.data, table_dtype),
            labels=to_device_chunked(dataset.labels, dtype),
            pixmask=to_device_chunked(dataset.mask, table_dtype),
            z=jnp.asarray(z, dtype),
        )

        # init state
        key = jax.random.key(seed)
        k_init, k_state = jax.random.split(key)
        # one full subject block — sequence models (RNN) need T-aligned input
        sample_x = self.tdata.data[: blocks.t_max]
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
        z_train = jnp.asarray(z, dtype) if cfg.learn_inducing else None
        if cfg.natural_gradient:
            trainables = st.Trainables(
                vae=vae_params, gp=gp, m=None, h_factor=None, z=z_train
            )
            m_nat, H_nat = m0, h0
        else:
            trainables = st.Trainables(
                vae=vae_params, gp=gp, m=m0, h_factor=h0, z=z_train
            )
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
        self._aot: dict = {}  # n_epochs -> loaded/compiled executable

    def _executable_for(self, n: int):
        """AOT-cached executable for an ``n``-epoch chunk.

        Cold-start path (utils/aot_cache.py): a fresh process deserializes
        the pickled executable in seconds instead of re-tracing the
        multi-epoch program (~66 s measured) — the r3 answer to the ~500 s
        cold-start cliff. Any source/shape/config change misses the key and
        falls back to the normal jit path, repopulating the cache."""
        fn = self._aot.get(n)
        if fn is not None:
            return fn
        from lvae_tpu.utils import aot_cache

        key = self._aot_key(n) if aot_cache.enabled() else None
        if key is not None:
            fn = aot_cache.load(key)
        if fn is None:
            fn = self.epochs_fn.lower(self.state, self.tdata, n).compile()
            if key is not None:
                aot_cache.save(key, fn)
        self._aot[n] = fn
        return fn

    def _aot_key(self, n: int) -> str:
        """Cache key for the ``n``-epoch executable. Beyond the avals
        (shapes/dtypes/shardings) it must cover every constant the trace
        BAKES IN: the block tables' contents (``jnp.take`` constant-folds
        them — two cohorts with identical shapes but different subject
        orderings compile different programs), the optimizer's lr/kind
        (closed over, not a cfg field), and module-global model switches."""
        from lvae_tpu.kernels_pallas import b_chain as bc
        from lvae_tpu.kernels_pallas import cholesky as kc
        from lvae_tpu.ops import linalg as la
        from lvae_tpu.utils import aot_cache

        return aot_cache.cache_key(
            "hensman_epochs",
            repr(self.model),
            self.cfg,
            self.subjects_per_batch,
            len(self.tables),
            aot_cache.avals((self.state, self.tdata, self.tables)),
            aot_cache.content_digest(self.tables),
            self._opt_key,
            mv.use_reshape_max_pool,
            (mv.use_s2d_convs, mv._s2d_active()),
            la.use_pallas_cholesky,
            kx.use_pallas_kernel_matrix,
            kx.use_pallas_block_pair,
            (kx.use_pallas_b_chain, kx.B_CHAIN_AUTO_DEFAULT),
            # mesh-traced programs pin the XLA paths (the sharded facade's
            # pallas guard) except the self-partitioning Cholesky; the key
            # must distinguish them from a hypothetically identical
            # unsuppressed trace and cover the partitioned-route switches
            la.pallas_suppress_active(),
            (kc.use_partitioned_cholesky, kc._partition_interpret),
            bc.use_partitioned_b_chain,
            (bc.use_batch_major_out, bc.B_CHAIN_BM_AUTO_DEFAULT),
            (bc.use_long_t_halves, bc.LONG_T_AUTO_DEFAULT, bc.MAX_T),
            eb.use_stacked_mm_chol,
            (use_epoch_pregather, PREGATHER_AUTO_DEFAULT),
            (use_flat_gather, FLATGATHER_MIN_ROWS),
            n,
        )

    def _dispatch_epochs(self, n: int):
        """Dispatch an ``n``-epoch chunk; return its DEVICE metrics (no sync).

        ``self.state`` advances to the chunk's output immediately — the
        state dependency chains on device, so back-to-back dispatches need
        no host round trip between them (``fit``'s overlapped path)."""
        self.state, ms = self._executable_for(n)(self.state, self.tdata)
        if self.cfg.learn_inducing and self.state.trainables.z is not None:
            # keep the serving/eval view (tdata.z) in sync with the learned
            # points so every downstream consumer sees the optimised basis
            self.tdata = self.tdata._replace(z=self.state.trainables.z)
        return ms

    def _materialize_metrics(self, ms, n: int):
        """Fetch a dispatched chunk's metrics to host floats (blocks)."""
        out = []
        # device_get pipelines the per-leaf transfers (copy_to_host_async on
        # all leaves, then block); a np.asarray tree.map is one SERIAL relay
        # round trip per metric leaf — measured 23.96 vs 13.53 ms/epoch at
        # chunk=5 on the remote chip (tools/overlap_probe.py lag1 vs
        # lag1_deviceget; nosync floor 13.51)
        host = jax.device_get(ms)
        for e in range(n):
            m = jax.tree.map(lambda a: float(a[e]), host)
            self.history.append(m)
            out.append(m)
        return out

    def run_epochs(self, n: int):
        """Run ``n`` epochs in one dispatch; returns per-epoch metrics."""
        return self._materialize_metrics(self._dispatch_epochs(n), n)

    def run_epoch(self):
        return self.run_epochs(1)[0]

    def _log_chunk(self, ms, done: int, epochs: int, log_every: int):
        for i, m in enumerate(ms):
            epoch = done + i + 1
            if log_every and (epoch % log_every == 0):
                print(
                    "Iter %d/%d - Loss: %.3f  - GP loss: %.3f"
                    "  - NLL Loss: %.3f  - Recon Loss: %.3f"
                    % (epoch, epochs, m.net, m.kld, m.nll, m.recon),
                    flush=True,
                )

    def fit(
        self,
        epochs: int,
        log_every: int = 1,
        callback=None,
        chunk: int = 25,
        overlap: Optional[bool] = None,
    ):
        """Train ``epochs`` epochs in ``chunk``-epoch dispatches.

        ``overlap`` (default: module switch ``use_overlapped_fit``) enables
        the one-chunk-lag schedule when no ``callback`` is registered:
        chunk k+1 is dispatched before chunk k's metrics are read, hiding
        the remote-execute round trip behind device time. Identical values
        and print order; a callback forces the synced loop (its contract is
        a state-current trainer at every chunk boundary)."""
        if callback is None and _overlap_active(overlap):
            return self._fit_overlapped(epochs, log_every, chunk)
        done = 0
        while done < epochs:
            n = min(max(chunk, 1), epochs - done)
            ms = self.run_epochs(n)
            self._log_chunk(ms, done, epochs, log_every)
            done += n
            if callback is not None:
                if callback(self, done, ms[-1]) == "rollback":
                    # failure recovery restored the previous chunk's
                    # snapshot — REPLAY these epochs instead of silently
                    # training fewer than reported (pipeline._recover)
                    done -= n
        return self.history

    def _fit_overlapped(self, epochs: int, log_every: int, chunk: int):
        dispatched = 0
        printed = 0
        pending = None  # (n, device metrics) of the chunk in flight
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
