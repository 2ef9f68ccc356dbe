"""Device meshes and sharding layouts for L-VAE training.

The reference is single-process single-device (SURVEY.md §2.2: no
torch.distributed anywhere); scale-out here is a first-class TPU-native
design over a 2-D ``Mesh('data', 'latent')``:

* **data axis** — subjects. Every per-subject quantity (the batch gather
  indices ``[B, S, T]``, the block kernel stacks ``[L, P, T, T]``, the
  recon/NLL per-sample losses) is sharded over subjects. The KLD A–F terms
  (elbo_functions.py:188-196) are *sums over subjects*, so GSPMD lowers them
  to ``psum`` over ICI; T×T blocks never cross subjects, so no halo exchange
  is ever needed.
* **latent axis** — the L independent GPs. Kernel hyperparams ``[L, C]``,
  the variational state ``m [L, M, 1]`` / ``H [L, M, M]`` and every
  ``[L, ...]`` kernel stack shard over latent dims; the total KLD sums over
  L → one more all-reduce. The natural-gradient update is elementwise in L,
  so it runs fully local.
* VAE parameters are replicated (tens of MB); their gradients all-reduce over
  the data axis — plain data parallelism.

Everything goes through ``NamedSharding`` placement + jit: XLA GSPMD
propagates the layouts through the whole epoch scan and inserts the
collectives. The same code runs on 1 chip (trivial mesh) or a pod slice.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lvae_tpu.train import state as st


def make_mesh(
    data: int = 1, latent: int = 1, devices: Optional[list] = None
) -> Mesh:
    """A 2-D ``(data, latent)`` mesh over the first data*latent devices."""
    devices = devices if devices is not None else jax.devices()
    n = data * latent
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(data, latent)
    return Mesh(dev, axis_names=("data", "latent"))


def _put(x, mesh: Mesh, spec: P):
    sh = NamedSharding(mesh, spec)
    if sh.is_fully_addressable:
        return jax.device_put(x, sh)
    # Multi-process (DCN) mesh: device_put cannot target non-addressable
    # devices; assemble the global array from the (identical) process-local
    # copy instead — each process materialises exactly its own shards.
    if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
        data = np.asarray(jax.random.key_data(x))
        garr = jax.make_array_from_callback(data.shape, sh, lambda idx: data[idx])
        return jax.random.wrap_key_data(garr)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])


def shard_train_data(tdata: st.TrainData, mesh: Mesh) -> st.TrainData:
    """Dataset arrays are replicated (they are gathered by batch indices)."""
    rep = P()
    return st.TrainData(
        data=_put(tdata.data, mesh, rep),
        labels=_put(tdata.labels, mesh, rep),
        pixmask=_put(tdata.pixmask, mesh, rep),
        z=_put(tdata.z, mesh, rep),
    )


def _shard_latent_leaf(x, mesh: Mesh, latent_dim: int):
    """Shard a leaf on its leading L axis when it has one (and L divides the
    mesh axis); else replicate."""
    if (
        hasattr(x, "ndim")
        and x.ndim >= 1
        and x.shape[0] == latent_dim
        and latent_dim % mesh.shape["latent"] == 0
    ):
        return _put(x, mesh, P("latent", *([None] * (x.ndim - 1))))
    return _put(x, mesh, P())


def shard_hensman_state(
    state: st.HensmanState, mesh: Mesh, latent_dim: int
) -> st.HensmanState:
    """Place the training state: GP/[L,...] leaves over 'latent', rest replicated."""
    return jax.tree.map(
        lambda x: _shard_latent_leaf(x, mesh, latent_dim), state
    )


class _ShardedTrainer:
    """Shared facade for the mesh trainer wrappers.

    Attribute access delegates to the inner trainer; ``state`` assignment
    re-places the new leaves on the mesh (checkpoint resume, pre-trained
    VAE loads and auto-recovery all write through it); ``fit`` hands THIS
    wrapper to callbacks so their state writes re-shard too (the pipeline's
    recovery callback would otherwise silently drop the mesh placement).
    """

    def __init__(self, trainer, mesh: Mesh):
        self.inner = trainer
        self.mesh = mesh

    _OWN_ATTRS = ("inner", "mesh", "_place")

    def __getattr__(self, name):
        if name == "inner":  # not set yet during __init__
            raise AttributeError(name)
        return getattr(self.inner, name)

    def __setattr__(self, name, value):
        # writes to delegated attributes go THROUGH to the inner trainer —
        # landing them in the wrapper's __dict__ would shadow the name while
        # the trainer's methods keep reading the stale inner value
        if name in self._OWN_ATTRS or isinstance(
            getattr(type(self), name, None), property
        ):
            super().__setattr__(name, value)
        else:
            setattr(self.inner, name, value)

    def _reshard_state(self, value):
        return shard_hensman_state(value, self.mesh, self.inner.cfg.latent_dim)

    @property
    def state(self):
        return self.inner.state

    @state.setter
    def state(self, value):
        self.inner.state = self._reshard_state(value)

    def _pallas_guard(self):
        """Mark every trace dispatched by this facade as a mesh program.

        The partitioner has no sharding rule for bare Pallas custom calls, so
        the non-partitionable fast paths (kernel builders, fused Adam) must
        not enter a program compiled for a multi-device mesh — the XLA
        chain's partitioning is what the compiled-HLO tests prove
        (tests/test_sharding.py). The batched Cholesky and the fused B-chain
        are self-partitioning (custom_partitioning rules in
        kernels_pallas/{cholesky,b_chain}.py) and stay on the kernels,
        launched per-shard. Tracing happens inside the first dispatch, so the
        facade enters this context around every compute entry point. Trivial
        1-device meshes keep the direct Pallas kernels.

        The guard deliberately stays active across user callbacks inside
        ``fit``: the pipeline's validation/recovery callbacks compute over
        the trainer's MESH-PLACED state, so their traces need the same
        pinning. (Same numbers either way — suppression only selects the
        XLA implementations.)
        """
        from lvae_tpu.ops import linalg as la

        return la.pallas_suppressed(self.mesh.size > 1)

    def run_epoch(self):
        with self._pallas_guard():
            return self.inner.run_epoch()

    def run_epochs(self, n: int):
        with self._pallas_guard():
            return self.inner.run_epochs(n)

    def fit(self, epochs: int, log_every: int = 1, callback=None, chunk=None):
        cb = (
            None
            if callback is None
            else (lambda _inner, epoch, m: callback(self, epoch, m))
        )
        kwargs = {} if chunk is None else {"chunk": chunk}
        with self._pallas_guard():
            return self.inner.fit(epochs, log_every, cb, **kwargs)


class ShardedStandardTrainer(_ShardedTrainer):
    """StandardTrainer variant whose state and cohort live on a mesh.

    The full-batch regimes are the natural data-parallel fit: the whole
    cohort's rows (subject-major ``[N=P·T, ...]``) shard over 'data' in
    whole-subject chunks (P must divide the data axis — the ``[P, T, ...]``
    block reshape then stays device-local, no halo), the per-GP ``[L, ...]``
    hyperparameters over 'latent', VAE params replicated. GSPMD propagates
    the layouts through ``full_batch_loss``: the encoder runs data-parallel,
    the block-Cholesky stacks partition on both axes, and the loss sums
    lower to psum over ICI.

    The GPPVAE pseudo-minibatch regime is excluded: its per-subject scan
    exists to BOUND activation memory, which data-parallel replication of
    the scan would defeat.
    """

    def __init__(self, trainer, mesh: Mesh):
        if getattr(trainer, "pseudo_minibatch", False):
            raise ValueError(
                "mini_batch=True (GPPVAE) is a memory-bounding regime; use "
                "the plain sharded full-batch path instead"
            )
        super().__init__(trainer, mesh)
        latent = trainer.cfg.latent_dim
        p_subjects, t_len = trainer.block_mask.shape
        trainer.state = shard_hensman_state(trainer.state, mesh, latent)
        n_data = mesh.shape["data"]
        ghosts = (-p_subjects) % n_data
        if ghosts:
            # Alignment padding: append fully-masked ghost subjects so the
            # subject axis divides the mesh instead of silently replicating
            # the cohort. Ghosts contribute exactly zero to every term — the
            # block masks zero them in the GP bounds (ops/elbo.py masking
            # invariants; closed-KL decouples them to unit prior rows in
            # train/standard.py) and their pixel masks zero the recon/NLL.
            print(
                f"ShardedStandardTrainer: padding P={p_subjects} with "
                f"{ghosts} ghost subject(s) to align the {n_data}-way data "
                "axis (ghosts are fully masked; all losses unchanged)"
            )

            def pad_rows(x):
                a = np.asarray(x)
                pad = np.zeros((ghosts * t_len,) + a.shape[1:], a.dtype)
                return np.concatenate([a, pad], axis=0)

            trainer.tdata = trainer.tdata._replace(
                data=pad_rows(trainer.tdata.data),
                labels=pad_rows(trainer.tdata.labels),
                pixmask=pad_rows(trainer.tdata.pixmask),
            )
            trainer.block_mask = np.concatenate(
                [
                    np.asarray(trainer.block_mask),
                    np.zeros((ghosts, t_len), np.asarray(trainer.block_mask).dtype),
                ],
                axis=0,
            )

        def put_rows(x):
            # whole-subject row chunks per device (alignment guaranteed above)
            return _put(x, mesh, P("data", *([None] * (x.ndim - 1))))

        trainer.tdata = st.TrainData(
            data=put_rows(trainer.tdata.data),
            labels=put_rows(trainer.tdata.labels),
            pixmask=put_rows(trainer.tdata.pixmask),
            z=_put(trainer.tdata.z, mesh, P()),
        )
        trainer.block_mask = _put(trainer.block_mask, mesh, P("data", None))


class ShardedVITrainer(_ShardedTrainer):
    """VITrainer variant whose state and cohort live on a mesh.

    The amortisation-free VI regime is full-batch over the cohort, so it
    shards like :class:`ShardedStandardTrainer`: the free per-point
    variational moments ``mu/log_var [N, L]`` and the subject-major data
    tensors shard their row axis over 'data' in whole-subject chunks; GP
    hyperparameters ``[L, ...]`` over 'latent'; decoder params replicated.
    Phase 2 (prediction-set optimisation) stays single-device — it builds a
    new joint cohort whose blocks need not align with the mesh.
    """

    def __init__(self, trainer, mesh: Mesh):
        super().__init__(trainer, mesh)
        latent = trainer.cfg.latent_dim
        p_subjects = trainer.block_mask.shape[0]
        aligned = p_subjects % mesh.shape["data"] == 0
        if not aligned:
            import warnings

            warnings.warn(
                f"ShardedVITrainer: P={p_subjects} does not divide the "
                f"{mesh.shape['data']}-way data axis; the cohort and the free "
                "variational moments are REPLICATED (no data parallelism). "
                "Pad the cohort to a multiple of the data axis to shard it.",
                stacklevel=2,
            )

        n_rows = trainer.data_ordered.shape[0]  # P·T subject-major rows

        def place(x):
            # rows over 'data' (whole-subject chunks), [L,...] over 'latent',
            # everything else replicated; optimizer moments mirror their
            # parameters' shapes, so they land on the same axes (donation-
            # and layout-consistent)
            if not hasattr(x, "ndim") or x.ndim == 0:
                return _put(x, mesh, P())
            if aligned and x.shape[0] in (n_rows, p_subjects):
                return _put(x, mesh, P("data", *([None] * (x.ndim - 1))))
            return _shard_latent_leaf(x, mesh, latent)

        trainer.data_ordered = place(trainer.data_ordered)
        trainer.pixmask_ordered = place(trainer.pixmask_ordered)
        trainer.xb = place(trainer.xb)
        trainer.block_mask = place(trainer.block_mask)
        trainer.z_ind = _put(trainer.z_ind, mesh, P())
        self._place = place
        trainer.state = jax.tree.map(place, trainer.state)

    def _reshard_state(self, value):
        # VI state mixes row-sharded moments with latent-sharded GP leaves;
        # re-apply the same placement rule (resume/recovery writes)
        return jax.tree.map(self._place, value)

    def fit(self, epochs: int, log_every: int = 100, chunk: int = 100):
        # VITrainer.fit has no callback parameter
        with self._pallas_guard():
            return self.inner.fit(epochs, log_every=log_every, chunk=chunk)

    def optimize_prediction_set(self, *args, **kwargs):
        # phase 2 builds a fresh joint cohort but CLOSES OVER the mesh-placed
        # GP/decoder/moment leaves, so its trace is a multi-device program
        # too — it needs the same XLA pinning as the epoch programs
        with self._pallas_guard():
            return self.inner.optimize_prediction_set(*args, **kwargs)


def _put_axis_or_replicate(x, mesh: Mesh, axis: str):
    """Shard the leading dim over ``axis`` when it divides evenly; else
    replicate (GSPMD still partitions downstream where profitable) — with a
    warning, so a user asking for N-way parallelism on an unaligned cohort
    learns they got 1-way instead of silently paying replication."""
    n = mesh.shape[axis]
    if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n == 0:
        return _put(x, mesh, P(axis, *([None] * (x.ndim - 1))))
    if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] > 1:
        import warnings

        warnings.warn(
            f"leading dim {x.shape[0]} does not divide the {n}-way "
            f"'{axis}' mesh axis; replicating (no '{axis}' parallelism for "
            "this array)",
            stacklevel=2,
        )
    return _put(x, mesh, P())


def sharded_gp_predict(
    spec0, spec1, kp0, kp1, noise, inputs, z, mesh: Mesh, eps: float = 1e-6
):
    """Mesh-parallel :func:`~lvae_tpu.ops.predict.gp_predict`.

    The serving counterpart of :class:`ShardedHensmanTrainer`
    (SURVEY.md §2.2): training-cohort blocks ``xb/mask/mu_b [P, ...]`` and
    query blocks ``Xb/Xmask/align [Pq, ...]`` shard their subject axes over
    'data' (the H = K0zz + Σ_s K0zx_s B_s⁻¹ K0xz_s reduction lowers to psum
    over ICI; the per-query aligned-block gather becomes a collective
    gather); kernel hyperparameters and noise ``[L, ...]`` shard over
    'latent' (each GP's posterior is independent). Inducing points are
    replicated. Subject axes that don't divide the mesh stay replicated —
    GSPMD still splits the latent-batched algebra.
    """
    latent_dim = noise.shape[0]
    kp0 = jax.tree.map(lambda a: _shard_latent_leaf(a, mesh, latent_dim), kp0)
    kp1 = jax.tree.map(lambda a: _shard_latent_leaf(a, mesh, latent_dim), kp1)
    noise = _shard_latent_leaf(noise, mesh, latent_dim)
    inputs = jax.tree.map(
        lambda a: _put_axis_or_replicate(a, mesh, "data"), inputs
    )
    z = _put(z, mesh, P())
    from lvae_tpu.ops import linalg as la

    with mesh, la.pallas_suppressed(mesh.size > 1):
        return _gp_predict_jit()(spec0, spec1, kp0, kp1, noise, inputs, z, eps)


def _gp_predict_jit():
    # the shared jitted predictor (ops.predict owns the cache so the
    # single-device path reuses the exact same wrapper)
    from lvae_tpu.ops.predict import gp_predict_jit

    return gp_predict_jit()


class ShardedHensmanTrainer(_ShardedTrainer):
    """HensmanTrainer variant whose state lives on a mesh.

    Drop-in: same multi-epoch program (train/hensman.py); only array
    *placement* differs — [L, ...] leaves over 'latent', dataset/table
    replicated — and XLA GSPMD partitions the computation to match. The
    on-device batch gathers inherit a 'data'-axis layout from the KLD
    contractions, whose subject sums lower to psum over ICI.
    """

    def __init__(self, trainer, mesh: Mesh):
        super().__init__(trainer, mesh)
        latent = trainer.cfg.latent_dim
        trainer.tdata = shard_train_data(trainer.tdata, mesh)
        trainer.state = shard_hensman_state(trainer.state, mesh, latent)
        # the epoch program closes over the block table(s): replicate them
        from lvae_tpu.train.hensman import BlockTable, make_epochs_fn

        trainer.tables = tuple(
            BlockTable(
                index=_put(t.index, mesh, P()),
                mask=_put(t.mask, mesh, P()),
                num_real=t.num_real,
            )
            for t in trainer.tables
        )
        trainer.epochs_fn = make_epochs_fn(
            trainer.model, trainer.cfg, trainer.optimizer, trainer.tables,
            trainer.subjects_per_batch, mesh=mesh,
        )
        # drop any executables compiled for the pre-sharded program (the AOT
        # key also covers shardings via aot_cache.avals, so disk entries from
        # the unsharded trainer can never be loaded here)
        trainer._aot = {}
