"""Serving-side inference API.

The reference has no deployment story — evaluation happens inline in the
training scripts. This module packages a trained L-VAE into a standalone
predictor with jit-compiled, reusable entry points for the three product
capabilities:

* :meth:`LVAEPredictor.impute` — reconstruct missing pixels of observed
  frames (the imputation task, README.MD:7);
* :meth:`LVAEPredictor.predict_trajectory` — given any observed frames of a
  subject (even one never seen in training), predict its frames at arbitrary
  query covariates — future timepoints, counterfactual covariates
  (utils.py:115-211 → decode);
* :meth:`LVAEPredictor.encode` / :meth:`decode` — raw latent access.

State loads from this framework's checkpoints (utils/checkpoint.py) written
by the pipeline, keeping the training cohort's covariates + encoded means as
the GP regression basis.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lvae_tpu.evaluation.encode import decode_latents, encode_dataset
from lvae_tpu.ops import kernels as kx
from lvae_tpu.ops.predict import predict_latents
from lvae_tpu.train.state import GPParams


@functools.lru_cache(maxsize=None)
def _fold_basis_jit(spec0, spec1, eps):
    """Module-level jitted basis fold, keyed on the hashable statics.

    Per-call ``jax.jit(lambda ...)`` wrappers defeat jit's in-process
    cache (a fresh function object never hits), so every fold/refresh paid
    a full retrace+lower — and a first-in-process backend compile on the
    remote chip (10-500 s) — despite the "no recompile" serving contract.
    Hoisting the wrapper here makes repeat calls with same-shaped cohorts
    hit jax.jit's cache; only genuinely new shapes trace."""
    from lvae_tpu.ops.predict import precompute_predict_basis

    return jax.jit(
        functools.partial(precompute_predict_basis, spec0, spec1, eps=eps)
    )


@functools.lru_cache(maxsize=None)
def _extend_basis_jit(spec0, spec1):
    """Module-level jitted incremental basis extension (see _fold_basis_jit)."""
    from lvae_tpu.ops.predict import extend_predict_basis

    return jax.jit(functools.partial(extend_predict_basis, spec0, spec1))


class LVAEPredictor(NamedTuple):
    """A frozen, trained L-VAE ready for serving."""

    model: object
    vae_params: dict
    gp_params: GPParams
    noise: jax.Array
    spec0: kx.KernelSpec
    spec1: kx.KernelSpec
    z: jax.Array
    id_covariate: int
    basis_labels: np.ndarray  # training/reference cohort covariates [N, Q]
    basis_mu: np.ndarray  # their encoded latent means [N, L]
    # default matches config.eps / the ops-layer defaults so hand-built
    # predictors apply the SAME K0zz jitter training used (train/serve
    # bit-consistency; from_pipeline forwards cfg.eps regardless)
    eps: float = 1e-6
    mesh: object = None  # device mesh → GP posterior runs mesh-parallel

    # ------------------------------------------------------------- factories
    @classmethod
    def from_pipeline(cls, pipeline) -> "LVAEPredictor":
        """Package a trained :class:`~lvae_tpu.pipeline.LVAEPipeline`."""
        if not hasattr(getattr(pipeline.trainer, "state", None), "trainables"):
            # VI-regime pipelines train free per-point latents, not an
            # encoder — the amortised serving path would silently use the
            # stale pre-trained encoder. The reference predicts VI models
            # by optimising the prediction set's latents jointly
            # (training.py:602-764) — use VITrainer.optimize_prediction_set.
            raise TypeError(
                "LVAEPredictor.from_pipeline needs an amortised trainer "
                f"(got {type(pipeline.trainer).__name__}); for the VI "
                "regime use VITrainer.optimize_prediction_set instead"
            )
        vae_params, gp_params, noise = pipeline.current_params()
        mu, _ = encode_dataset(pipeline.model, vae_params, pipeline.dataset.data)
        return cls(
            model=pipeline.model,
            vae_params=vae_params,
            gp_params=gp_params,
            noise=noise,
            spec0=pipeline.spec0,
            spec1=pipeline.spec1,
            z=pipeline.trainer.tdata.z,
            id_covariate=pipeline.cfg.id_covariate,
            basis_labels=np.asarray(pipeline.dataset.labels),
            basis_mu=mu,
            eps=pipeline.cfg.eps,
            # a sharded trainer's mesh carries over to serving-side GP
            # prediction (parallel.mesh.sharded_gp_predict)
            mesh=getattr(pipeline.trainer, "mesh", None),
        )

    @classmethod
    def from_checkpoint(
        cls, path: str, pipeline_cfg, dataset=None
    ) -> "LVAEPredictor":
        """Rebuild from a pipeline checkpoint + its config (+ train data).

        Dispatches on the artifact layout like the pipeline's own resume
        path (pipeline._load_ckpt): orbax snapshots are DIRECTORIES, pickle
        snapshots files — serving must load whichever backend the training
        run was configured with (`--checkpoint_backend`)."""
        from lvae_tpu.pipeline import LVAEPipeline

        pipeline = LVAEPipeline(
            pipeline_cfg, {"train": dataset} if dataset is not None else None
        )
        trainer = pipeline.build_trainer()
        state = pipeline._load_ckpt(path, like=trainer.state)
        if state is None:
            raise FileNotFoundError(
                f"could not load checkpoint {path!r} (see log above)"
            )
        trainer.state = state
        return cls.from_pipeline(pipeline)

    # ------------------------------------------------------------ primitives
    def encode(self, data) -> np.ndarray:
        """Data → latent means [N, L]."""
        mu, _ = encode_dataset(self.model, self.vae_params, np.asarray(data))
        return mu

    def decode(self, latents) -> np.ndarray:
        """Latents [N, L] → data space."""
        return decode_latents(self.model, self.vae_params, np.asarray(latents))

    # ---------------------------------------------------------- capabilities
    def impute(self, data, mask=None) -> np.ndarray:
        """Reconstruct frames; where ``mask`` marks pixels observed, keep the
        observation and fill only the missing entries with the model."""
        data = np.asarray(data)
        recon = self.decode(self.encode(data))
        if mask is None:
            return recon
        mask = np.asarray(mask, np.float32).reshape(recon.shape)
        return data * mask + recon * (1.0 - mask)

    def predict_latent_trajectory(
        self,
        observed_data,
        observed_labels,
        query_labels,
    ) -> np.ndarray:
        """GP posterior latents at ``query_labels`` [Nq, Q] → [Nq, L].

        ``observed_*`` extend the regression basis — typically a new subject's
        observed timepoints; queries for that subject ride its id kernel,
        queries for unseen subjects get the population (shared-kernel) mean.
        """
        obs_mu = self.encode(observed_data)
        basis_labels = np.concatenate(
            [np.asarray(observed_labels), self.basis_labels], axis=0
        )
        basis_mu = np.concatenate([obs_mu, self.basis_mu], axis=0)
        return predict_latents(
            self.spec0, self.spec1, self.gp_params.kp0, self.gp_params.kp1,
            self.noise, basis_labels, basis_mu,
            np.asarray(query_labels), self.z, self.id_covariate, self.eps,
            mesh=self.mesh,
        )

    def predict_trajectory(
        self, observed_data, observed_labels, query_labels
    ) -> np.ndarray:
        """Predicted frames at the query covariates (decode of the above)."""
        z_pred = self.predict_latent_trajectory(
            observed_data, observed_labels, query_labels
        )
        return self.decode(z_pred)

    def aot_compile(
        self,
        batch_size: int = 256,
        t_obs: Optional[int] = None,
        n_query: Optional[int] = None,
        k_subjects: int = 1,
    ) -> "CompiledServing":
        """AOT-compile the hot serving paths at a fixed batch size.

        With ``t_obs``/``n_query`` set, also compiles the trajectory path:
        the cohort's GP operators are folded once (ops/predict.py
        precompute_predict_basis) and each request runs one fixed-shape
        executable — encode → low-rank GP extension → decode.
        ``k_subjects`` sizes the request: K new subjects scored together
        (gp_predict_extend_batch — the clinic batch-scoring case), cost
        ~O(K) in the T×T block solves and flat in the cohort size P.
        """
        return CompiledServing(
            self, batch_size, t_obs=t_obs, n_query=n_query,
            k_subjects=k_subjects,
        )


class CompiledServing:
    """Ahead-of-time compiled serving bundle (fixed batch size).

    ``LVAEPredictor.aot_compile`` lowers and compiles the hot serving entry
    points (encode / decode / impute-reconstruct) at a fixed batch size, so
    the first request pays zero compile latency — the deployment property
    the training-time jit cache cannot give a fresh process. Requests of any
    length are served by internal fixed-size chunking with tail padding
    (static shapes: one executable per bundle, never a recompile).
    """

    def __init__(
        self,
        predictor: "LVAEPredictor",
        batch_size: int,
        t_obs: Optional[int] = None,
        n_query: Optional[int] = None,
        k_subjects: int = 1,
    ):
        self.batch_size = int(batch_size)
        self.predictor = predictor
        model = predictor.model
        params = predictor.vae_params
        latent = predictor.basis_mu.shape[1]
        # recurrent encoders consume whole subject sequences: the fixed
        # batch must be a multiple of T (zero tail padding then forms
        # complete fake subjects, as in evaluation.encode.encode_dataset)
        self.seq_len = int(getattr(model, "T", 0) or 0)
        if self.seq_len:
            self.batch_size = max(
                self.seq_len, self.batch_size // self.seq_len * self.seq_len
            )
        if getattr(model, "is_conv", False):
            hw = int(np.sqrt(model.num_dim))
            in_shape = (self.batch_size, hw, hw, 1)
        else:
            in_shape = (self.batch_size, model.num_dim)
        x_aval = jax.ShapeDtypeStruct(in_shape, jnp.float32)
        z_aval = jax.ShapeDtypeStruct((self.batch_size, latent), jnp.float32)

        def _encode(p, x):
            return model.apply(p, x, deterministic=True, method="encode")

        def _decode(p, z):
            return model.apply(p, z, deterministic=True, method="decode")

        def _recon(p, x):
            mu, _ = _encode(p, x)
            return _decode(p, mu)

        self._encode = jax.jit(_encode).lower(params, x_aval).compile()
        self._decode = jax.jit(_decode).lower(params, z_aval).compile()
        self._recon = jax.jit(_recon).lower(params, x_aval).compile()
        self._in_shape = in_shape

        self.t_obs, self.n_query = t_obs, n_query
        self.k_subjects = int(k_subjects)
        if t_obs is not None and n_query is not None:
            if self.seq_len and t_obs != self.seq_len:
                # the trajectory request is ONE subject's observed frames;
                # an RNN encoder must see them as ONE recurrence — t_obs of
                # k·T would silently split the sequence into k independent
                # recurrences, t_obs < T can't form one at all
                raise ValueError(
                    f"RNN trajectory serving requires t_obs == T="
                    f"{self.seq_len} (one whole subject sequence); got "
                    f"t_obs={t_obs}"
                )
            self._compile_trajectory(t_obs, n_query)

    def for_k_subjects(self, k_subjects: int) -> "CompiledServing":
        """A sibling bundle serving ``k_subjects``-sized requests.

        Shares this bundle's batch executables (encode/decode/impute) and
        the folded O(P) cohort basis; compiles ONLY the K-shaped trajectory
        executable. Adding a request size to a serving fleet therefore
        costs one small compile, not a full ``CompiledServing`` rebuild
        (on the remote chip the batch-path compiles alone run 10-500 s).
        """
        if self.t_obs is None or self.n_query is None:
            raise ValueError(
                "bundle compiled without trajectory support: pass "
                "t_obs/n_query to aot_compile"
            )
        import copy

        sib = copy.copy(self)
        sib.k_subjects = int(k_subjects)
        sib._compile_traj_executable(self.t_obs, self.n_query)
        return sib

    def _compile_trajectory(self, t_obs: int, n_query: int) -> None:
        """One executable per request: encode → GP low-rank extend → decode.

        The cohort-level block solves (O(P) subjects) happen HERE, once;
        request cost is independent of the basis cohort size.
        """
        self._fold_basis()
        self._compile_traj_executable(t_obs, n_query)

    def _fold_basis(self) -> None:
        from lvae_tpu.data.blocks import build_subject_blocks

        pr = self.predictor
        blocks = build_subject_blocks(pr.basis_labels, pr.id_covariate)
        xb = np.asarray(pr.basis_labels, np.float32)[blocks.index]
        xb = xb * blocks.mask[..., None]
        mu_b = np.asarray(pr.basis_mu, np.float32)[blocks.index]
        mu_b = mu_b * blocks.mask[..., None]
        self._basis = _fold_basis_jit(pr.spec0, pr.spec1, pr.eps)(
            pr.gp_params.kp0, pr.gp_params.kp1, pr.noise,
            jnp.asarray(xb), jnp.asarray(blocks.mask, jnp.float32),
            jnp.asarray(mu_b), jnp.asarray(pr.z, jnp.float32),
        )
        jax.block_until_ready(self._basis)

    def refresh_basis(self, new_data, new_labels) -> None:
        """Fold new TRAINING subjects into the serving basis, in place.

        Cohort growth without the O(P) refold: the cohort operators (H, c)
        are sums over subject blocks, so the new subjects' blocks are
        encoded and added incrementally (ops/predict.py
        extend_predict_basis — equals a full refold at 1e-6). The compiled
        request executables stay valid: the basis is a runtime argument of
        fixed ``[L,M,M]/[L,M]`` shape, so no recompile. The extension
        itself runs under a module-cached jit wrapper (``_extend_basis_jit``),
        so repeat refreshes with same-shaped cohorts hit jax.jit's
        in-process cache instead of paying a retrace per call.

        Contract (see extend_predict_basis): ``new_labels`` must carry
        subject ids NOT already in the basis, and once folded, a subject is
        a training subject — don't re-send it as "new" in a request.
        Sibling bundles (``for_k_subjects``) hold their own basis reference:
        refresh each sibling, or create siblings after refreshing.
        """
        from lvae_tpu.data.blocks import build_subject_blocks

        pr = self.predictor
        new_labels = np.asarray(new_labels, np.float32)
        known = set(np.asarray(pr.basis_labels)[:, pr.id_covariate].tolist())
        dup = sorted(
            {float(s) for s in new_labels[:, pr.id_covariate]} & known
        )
        if dup:
            raise ValueError(
                f"refresh_basis: subject ids {dup[:5]} are already in the "
                "basis — folding them again would double-count their blocks"
            )
        mu_new = self.encode(new_data)[: new_labels.shape[0]]
        blocks = build_subject_blocks(new_labels, pr.id_covariate)
        xb = new_labels[blocks.index] * blocks.mask[..., None]
        mu_b = np.asarray(mu_new, np.float32)[blocks.index]
        mu_b = mu_b * blocks.mask[..., None]
        self._basis = _extend_basis_jit(pr.spec0, pr.spec1)(
            pr.gp_params.kp0, pr.gp_params.kp1, pr.noise, self._basis,
            jnp.asarray(xb, jnp.float32),
            jnp.asarray(blocks.mask, jnp.float32),
            jnp.asarray(mu_b, jnp.float32),
            jnp.asarray(pr.z, jnp.float32),
        )
        jax.block_until_ready(self._basis)
        # keep THIS bundle's predictor view consistent (full-recompute path,
        # later _fold_basis calls, siblings created from now on); the
        # predictor NamedTuple is immutable, so rebind a grown copy
        self.predictor = pr._replace(
            basis_labels=np.concatenate([pr.basis_labels, new_labels]),
            basis_mu=np.concatenate(
                [pr.basis_mu, np.asarray(mu_new, pr.basis_mu.dtype)]
            ),
        )

    def _compile_traj_executable(self, t_obs: int, n_query: int) -> None:
        from lvae_tpu.ops.predict import gp_predict_extend_batch

        pr = self.predictor
        model, params = pr.model, pr.vae_params
        q = pr.basis_labels.shape[1]
        k = self.k_subjects

        def _traj(p, basis, kp0, kp1, nz, z_, obs_x, obs_mask, obs_lab, query_lab):
            # encoder consumes the K subjects' frames as one flat batch
            flat = obs_x.reshape((k * t_obs,) + obs_x.shape[2:])
            mu_obs, _ = model.apply(p, flat, deterministic=True, method="encode")
            mu_obs = mu_obs.reshape(k, t_obs, -1)
            ones_q = jnp.ones((k, n_query), jnp.float32)
            z_pred = gp_predict_extend_batch(
                pr.spec0, pr.spec1, kp0, kp1, nz, basis,
                obs_lab, obs_mask, mu_obs, query_lab, ones_q, z_,
            )
            return model.apply(
                p, z_pred.reshape(k * n_query, -1),
                deterministic=True, method="decode",
            ).reshape((k, n_query) + self._in_shape[1:])

        obs_aval = jax.ShapeDtypeStruct(
            (k, t_obs) + self._in_shape[1:], jnp.float32
        )
        self._traj = (
            jax.jit(_traj)
            .lower(
                params, self._basis, pr.gp_params.kp0, pr.gp_params.kp1,
                pr.noise, jax.ShapeDtypeStruct(pr.z.shape, jnp.float32),
                obs_aval, jax.ShapeDtypeStruct((k, t_obs), jnp.float32),
                jax.ShapeDtypeStruct((k, t_obs, q), jnp.float32),
                jax.ShapeDtypeStruct((k, n_query, q), jnp.float32),
            )
            .compile()
        )

    def predict_trajectories(
        self, observed_data, observed_labels, query_labels, observed_mask=None
    ):
        """K-subject batch trajectory prediction: one fixed-shape executable.

        ``observed_data [K, t_obs, ...]`` / ``observed_labels [K, t_obs, Q]``
        — each row one NEW subject's observed frames; ``query_labels
        [K, n_query, Q]`` — queries for that subject (or a data-free row:
        zero ``observed_mask`` → population mean). Returns decoded frames
        ``[K, n_query, ...]``. Cost ~O(K) in the T×T block solves, flat in
        the basis cohort size (ops/predict.py gp_predict_extend_batch).
        """
        assert self.t_obs is not None, (
            "bundle compiled without trajectory support: pass t_obs/n_query "
            "to aot_compile"
        )
        pr = self.predictor
        k = self.k_subjects
        obs = np.asarray(observed_data, np.float32).reshape(
            (k, self.t_obs) + self._in_shape[1:]
        )
        if observed_mask is None:
            observed_mask = np.ones((k, self.t_obs), np.float32)
        out = self._traj(
            pr.vae_params, self._basis, pr.gp_params.kp0, pr.gp_params.kp1,
            pr.noise, jnp.asarray(pr.z, jnp.float32), jnp.asarray(obs),
            jnp.asarray(observed_mask, jnp.float32),
            jnp.asarray(observed_labels, jnp.float32).reshape(k, self.t_obs, -1),
            jnp.asarray(query_labels, jnp.float32).reshape(k, self.n_query, -1),
        )
        return np.asarray(out)

    def predict_trajectory(self, observed_data, observed_labels, query_labels):
        """Fixed-shape single-subject trajectory prediction (see
        :func:`~lvae_tpu.ops.predict.gp_predict_extend` for scope). With a
        K>1 bundle, the request is padded with data-free ghost subjects."""
        k = self.k_subjects
        pr = self.predictor
        q = pr.basis_labels.shape[1]
        obs = np.zeros((k, self.t_obs) + self._in_shape[1:], np.float32)
        obs[0] = np.asarray(observed_data, np.float32).reshape(
            (self.t_obs,) + self._in_shape[1:]
        )
        labs = np.zeros((k, self.t_obs, q), np.float32)
        labs[0] = np.asarray(observed_labels, np.float32)
        queries = np.zeros((k, self.n_query, q), np.float32)
        queries[0] = np.asarray(query_labels, np.float32)
        mask = np.zeros((k, self.t_obs), np.float32)
        mask[0] = 1.0
        return self.predict_trajectories(obs, labs, queries, observed_mask=mask)[0]

    def _check_seq_rows(self, n: int) -> None:
        if self.seq_len and n % self.seq_len:
            raise ValueError(
                f"RNN serving needs subject-major requests with N divisible "
                f"by T={self.seq_len}; got N={n} (a partial subject would be "
                f"zero-padded into its own recurrence)"
            )

    def _chunked(self, fn, x: np.ndarray) -> np.ndarray:
        n, b = x.shape[0], self.batch_size
        outs = []
        for i in range(0, n, b):
            chunk = x[i : i + b]
            pad = b - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            out = np.asarray(fn(self.predictor.vae_params, jnp.asarray(chunk)))
            outs.append(out[: b - pad] if pad else out)
        if not outs:  # empty input: run one zero batch for the output shape
            zero = np.zeros((b,) + x.shape[1:], x.dtype)
            return np.asarray(fn(self.predictor.vae_params, jnp.asarray(zero)))[:0]
        return np.concatenate(outs)

    def encode(self, data) -> np.ndarray:
        data = np.asarray(data, np.float32).reshape((-1,) + self._in_shape[1:])
        self._check_seq_rows(data.shape[0])
        return self._chunked(
            lambda params, chunk: self._encode(params, chunk)[0], data
        )

    def decode(self, latents) -> np.ndarray:
        return self._chunked(self._decode, np.asarray(latents, np.float32))

    def impute(self, data, mask=None) -> np.ndarray:
        data = np.asarray(data, np.float32).reshape((-1,) + self._in_shape[1:])
        self._check_seq_rows(data.shape[0])
        recon = self._chunked(self._recon, data)
        if mask is None:
            return recon
        mask = np.asarray(mask, np.float32).reshape(recon.shape)
        return data.reshape(recon.shape) * mask + recon * (1.0 - mask)
