"""Multi-device sharding tests on the 8-virtual-CPU mesh.

Checks that the sharded Hensman trainer computes the SAME numbers as the
single-device path (GSPMD partitioning must be semantics-preserving) across
data-parallel, latent-parallel and 2-D meshes.
"""

import jax
import numpy as np
import pytest

from lvae_tpu.data.blocks import build_subject_blocks
from lvae_tpu.models import vae as mv
from lvae_tpu.parallel.mesh import ShardedHensmanTrainer, make_mesh
from lvae_tpu.train import hensman as th
from lvae_tpu.train import state as st
from tests.test_training import make_cfg, tiny_cohort


def build_trainer(p=8, t=4, latent_dim=4, seed=0):
    import jax.numpy as jnp

    ds = tiny_cohort(p=p, t=t, seed=seed)
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    cfg = make_cfg(True, p=p, t=t, latent_dim=latent_dim)
    model = mv.SimpleVAE(latent_dim=latent_dim, num_dim=20, dtype=jnp.float64)
    z = st.init_inducing_points(ds.labels, m_inducing=6, seed=0)
    # f64 so that any observed divergence is a sharding-semantics bug, not
    # f32 reduction-order noise amplified by the inverse-space (m, H) update
    return th.HensmanTrainer(
        model, cfg, ds, blocks, z, subjects_per_batch=4, seed=seed,
        dtype=jnp.float64,
    )


def run_epochs(trainer, n=3):
    out = []
    for _ in range(n):
        out.append(trainer.run_epoch())
    return out


@pytest.mark.parametrize("mesh_shape", [(2, 1), (1, 2), (4, 2)])
def test_sharded_matches_single_device(mesh_shape):
    ref = build_trainer()
    ref_hist = run_epochs(ref)

    trainer = build_trainer()
    mesh = make_mesh(*mesh_shape)
    sharded = ShardedHensmanTrainer(trainer, mesh)
    got_hist = run_epochs(sharded)

    for a, b in zip(ref_hist, got_hist):
        np.testing.assert_allclose(a.net, b.net, rtol=1e-8)
        np.testing.assert_allclose(a.kld, b.kld, rtol=1e-8)

    # states agree too (m/H live on the latent axis)
    if ref.cfg.natural_gradient:
        np.testing.assert_allclose(
            np.asarray(ref.state.H_nat), np.asarray(trainer.state.H_nat), rtol=1e-6, atol=1e-9
        )


def test_state_sharding_layout():
    trainer = build_trainer()
    mesh = make_mesh(2, 2)
    sharded = ShardedHensmanTrainer(trainer, mesh)
    h = trainer.state.H_nat
    spec = h.sharding.spec
    assert spec[0] == "latent", f"H should shard over latent, got {spec}"
    # VAE params replicated
    leaf = jax.tree.leaves(trainer.state.trainables.vae)[0]
    assert leaf.sharding.is_fully_replicated


def test_mesh_validation():
    with pytest.raises(ValueError):
        make_mesh(16, 1)  # more than the 8 virtual devices


def test_global_mesh_helper():
    from lvae_tpu.parallel.distributed import initialize_distributed, make_global_mesh

    assert initialize_distributed() == 8  # no coordinator → local devices
    mesh = make_global_mesh(latent=2)
    assert dict(mesh.shape) == {"data": 4, "latent": 2}


def test_debug_health_and_finite_guard():
    import jax.numpy as jnp

    from lvae_tpu.ops import elbo as eb
    from lvae_tpu.utils.debug import assert_state_finite, gp_health
    from tests.test_elbo import EPS, make_problem

    pr = make_problem(np.random.default_rng(0))
    ops = eb.gp_block_operators(
        pr["spec0"], pr["spec1"], pr["kp0"], pr["kp1"], pr["noise"],
        pr["xb"], pr["z"], pr["mask"], eps=EPS,
    )
    h = gp_health(ops)
    assert bool(h["finite_B"]) and float(h["min_LB_pivot"]) > 0

    assert_state_finite({"a": jnp.ones(3)})  # fine
    with pytest.raises(FloatingPointError, match="Non-finite"):
        assert_state_finite({"a": jnp.asarray([1.0, float("nan")])}, where="test")


def test_compiled_program_actually_partitions():
    """Inspect the compiled sharded epoch (HLO) — GSPMD must PARTITION the
    [L, S, T, T] block stacks across both mesh axes and insert collectives,
    not silently all-gather everything onto one device (SURVEY.md §2.2)."""
    trainer = build_trainer()  # L=4, S=4 (subjects_per_batch), T=4, M=6
    mesh = make_mesh(2, 2)
    ShardedHensmanTrainer(trainer, mesh)
    compiled = trainer.epochs_fn.lower(trainer.state, trainer.tdata, 1).compile()
    txt = compiled.as_text()

    # collectives present: the KLD's subject/latent sums lower to all-reduce
    assert txt.count("all-reduce") > 0

    # the [L, M, M] variational/kernel stacks live at their LOCAL shape
    # (L/latent = 2): the global shape must not appear as a compute buffer
    assert "f64[2,6,6]" in txt, "H/K0zz stacks not partitioned over 'latent'"
    assert "f64[4,6,6]" not in txt, "found an unpartitioned [L,M,M] buffer"

    # the [L, S, T, T] block-Cholesky stacks partition over BOTH axes:
    # local [L/2, S/2, T, T]
    assert "f64[2,2,4,4]" in txt, "B stacks not partitioned over 'data'x'latent'"
    assert "f64[4,4,4,4]" not in txt and "f64[2,4,4,4]" not in txt, (
        "found a block stack replicated on an axis"
    )

    # compiled output shardings keep (m, H) on the latent axis
    out_state = jax.tree.leaves_with_path(compiled.output_shardings[0])
    by_name = {jax.tree_util.keystr(p): s for p, s in out_state}
    assert by_name[".H_nat"].spec[0] == "latent"
    assert by_name[".m_nat"].spec[0] == "latent"


@pytest.mark.parametrize("mesh_shape", [(2, 1), (1, 2), (4, 2)])
def test_sharded_gp_predict_matches_single_device(mesh_shape):
    """Mesh-parallel prediction (parallel.mesh.sharded_gp_predict) equals
    the single-device gp_predict bit-for-bit-tolerance on every mesh."""
    import jax.numpy as jnp

    from lvae_tpu.ops import kernels as kx
    from lvae_tpu.ops.predict import build_predict_inputs, gp_predict
    from lvae_tpu.parallel.mesh import sharded_gp_predict

    rng = np.random.default_rng(0)
    p, t, latent_dim = 8, 4, 4
    train = tiny_cohort(p=p, t=t, seed=0)
    test = tiny_cohort(p=4, t=t, seed=1)
    test.labels[:, 2] += 6  # ids 6,7 align with training; 8,9 are unseen
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    gp = st.init_gp_params(spec0, spec1, latent_dim, constrain_scales=False)
    # randomise so nothing cancels
    gp = gp._replace(
        kp0=gp.kp0._replace(
            raw_scale=jnp.asarray(rng.normal(0.5, 0.2, gp.kp0.raw_scale.shape))
        )
    )
    noise = jnp.asarray(rng.uniform(0.4, 0.9, (latent_dim,)))
    mu = rng.normal(size=(len(train), latent_dim))
    z = jnp.asarray(
        st.init_inducing_points(train.labels, m_inducing=6, seed=0), jnp.float64
    )

    inputs, _, _ = build_predict_inputs(
        train.labels, mu, test.labels, id_covariate=2, dtype=np.float64
    )
    ref = np.asarray(
        gp_predict(spec0, spec1, gp.kp0, gp.kp1, noise, inputs, z, 1e-6)
    )
    mesh = make_mesh(*mesh_shape)
    got = np.asarray(
        sharded_gp_predict(
            spec0, spec1, gp.kp0, gp.kp1, noise, inputs, z, mesh, eps=1e-6
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-12)


def test_sharded_gp_predict_partitions():
    """The compiled sharded predictor must partition the query work over
    'data' and the per-GP algebra over 'latent', with collectives for the
    cross-subject H reduction."""
    import jax.numpy as jnp

    from lvae_tpu.ops import kernels as kx
    from lvae_tpu.ops.predict import build_predict_inputs
    from lvae_tpu.parallel import mesh as pm

    latent_dim = 4
    train = tiny_cohort(p=8, t=4, seed=0)
    test = tiny_cohort(p=4, t=4, seed=1)
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    gp = st.init_gp_params(spec0, spec1, latent_dim, constrain_scales=False)
    noise = jnp.ones((latent_dim,), jnp.float64)
    mu = np.zeros((len(train), latent_dim))
    z = jnp.asarray(
        st.init_inducing_points(train.labels, m_inducing=6, seed=0), jnp.float64
    )
    inputs, _, _ = build_predict_inputs(
        train.labels, mu, test.labels, id_covariate=2, dtype=np.float64
    )
    mesh = make_mesh(2, 2)
    kp0 = jax.tree.map(lambda a: pm._shard_latent_leaf(a, mesh, latent_dim), gp.kp0)
    kp1 = jax.tree.map(lambda a: pm._shard_latent_leaf(a, mesh, latent_dim), gp.kp1)
    noise_s = pm._shard_latent_leaf(noise, mesh, latent_dim)
    inputs_s = jax.tree.map(
        lambda a: pm._put_axis_or_replicate(a, mesh, "data"), inputs
    )
    z_s = pm._put(z, mesh, pm.P())
    with mesh:
        txt = (
            pm._gp_predict_jit()
            .lower(spec0, spec1, kp0, kp1, noise_s, inputs_s, z_s, 1e-6)
            .compile()
            .as_text()
        )
    assert txt.count("all-reduce") > 0 or txt.count("all-gather") > 0
    # the [L, P, T, M] K0xz stack must live at its LOCAL shape
    # (L/latent=2, P/data=4): the full [4, 8, 4, 6] buffer must not appear
    assert "f64[2,4,4,6]" in txt, "K0xz not partitioned over both axes"
    assert "f64[4,8,4,6]" not in txt, "found an unpartitioned K0xz buffer"


def test_pipeline_mesh_flags_end_to_end(tmp_path):
    """--data_mesh/--latent_mesh through the pipeline: sharded training AND
    the mesh-parallel GP test path produce the same result_error.csv as the
    single-device run."""
    from lvae_tpu.pipeline import LVAEPipeline
    from tests.test_pipeline import healthmnist_like, make_cfg

    def run(out, **over):
        cfg = make_cfg(
            out, epochs=2, run_validation=False, generate_images=False,
            run_tests=True, latent_dim=4, M=6, subjects_per_batch=4,
            checkpoint_every=2, **over,
        )
        datasets = {
            "train": healthmnist_like(p=8, t=5, seed=0),
            "test": healthmnist_like(p=4, t=5, seed=2),
            "prediction": healthmnist_like(p=8, t=5, seed=0),
        }
        pipeline = LVAEPipeline(cfg, datasets)
        result = pipeline.run()
        return pipeline, result

    p_ref, r_ref = run(str(tmp_path / "single"))
    p_mesh, r_mesh = run(str(tmp_path / "mesh"), data_mesh=2, latent_mesh=2)
    assert type(p_mesh.trainer).__name__ == "ShardedHensmanTrainer"
    np.testing.assert_allclose(r_mesh.vae_mse, r_ref.vae_mse, rtol=1e-4)
    np.testing.assert_allclose(r_mesh.gp_mse, r_ref.gp_mse, rtol=1e-4)


def build_standard_trainer(type_kl="GPapprox_closed", p=8, t=4, latent_dim=4):
    import jax.numpy as jnp

    from lvae_tpu.ops import kernels as kx
    from lvae_tpu.train.standard import StandardConfig, StandardTrainer

    ds = tiny_cohort(p=p, t=t, seed=0)
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    cfg = StandardConfig(
        spec0=spec0, spec1=spec1, latent_dim=latent_dim, P_tot=p, T=t,
        weight=0.5, loss_function="mse", type_KL=type_kl, num_samples=2,
        constrain_scales=True, eps=1e-6, dropout=False,
    )
    model = mv.SimpleVAE(latent_dim=latent_dim, num_dim=20, dtype=jnp.float64)
    z = st.init_inducing_points(ds.labels, m_inducing=6, seed=0)
    return StandardTrainer(model, cfg, ds, blocks, z, dtype=jnp.float64)


@pytest.mark.parametrize("type_kl", ["closed", "GPapprox", "GPapprox_closed"])
def test_sharded_standard_matches_single_device(type_kl):
    from lvae_tpu.parallel.mesh import ShardedStandardTrainer

    ref = build_standard_trainer(type_kl)
    ref_hist = run_epochs(ref)

    trainer = build_standard_trainer(type_kl)
    sharded = ShardedStandardTrainer(trainer, make_mesh(4, 2))
    got_hist = run_epochs(sharded)

    for a, b in zip(ref_hist, got_hist):
        np.testing.assert_allclose(a.net, b.net, rtol=1e-8)
        np.testing.assert_allclose(a.gp, b.gp, rtol=1e-8)
    for x, y in zip(
        jax.tree.leaves(ref.state.trainables.gp),
        jax.tree.leaves(trainer.state.trainables.gp),
    ):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-7)


def test_sharded_standard_partitions():
    """The compiled full-batch step must partition the [L,P,T,T] block
    stacks over both mesh axes and insert collectives."""
    from lvae_tpu.parallel.mesh import ShardedStandardTrainer

    trainer = build_standard_trainer("GPapprox_closed")  # L=4, P=8, T=4
    ShardedStandardTrainer(trainer, make_mesh(4, 2))
    txt = (
        trainer.step_fn.lower(trainer.state, trainer.tdata, trainer.block_mask)
        .compile()
        .as_text()
    )
    assert txt.count("all-reduce") > 0
    # B stacks at local shape [L/2, P/4, T, T]
    assert "f64[2,2,4,4]" in txt, "block stacks not partitioned on both axes"
    assert "f64[4,8,4,4]" not in txt, "found an unpartitioned [L,P,T,T] buffer"


def test_sharded_standard_rejects_gppvae():
    from lvae_tpu.parallel.mesh import ShardedStandardTrainer

    trainer = build_standard_trainer("GPapprox_closed")
    trainer.pseudo_minibatch = True
    with pytest.raises(ValueError, match="mini_batch"):
        ShardedStandardTrainer(trainer, make_mesh(2, 1))


def test_pipeline_mesh_flags_standard_regime(tmp_path):
    """--data_mesh with hensman=False routes through ShardedStandardTrainer."""
    from lvae_tpu.pipeline import LVAEPipeline
    from tests.test_pipeline import healthmnist_like, make_cfg

    cfg = make_cfg(
        str(tmp_path), hensman=False, natural_gradient=False, epochs=2,
        run_validation=False, generate_images=False, run_tests=False,
        latent_dim=4, M=6, data_mesh=2, latent_mesh=2,
    )
    pipeline = LVAEPipeline(cfg, {"train": healthmnist_like(p=8, t=5, seed=0)})
    pipeline.build_trainer()
    assert type(pipeline.trainer).__name__ == "ShardedStandardTrainer"
    hist = pipeline.train()
    assert np.isfinite(hist[-1].net)


def test_sharded_vi_matches_single_device():
    """ShardedVITrainer == single-device VITrainer (f64, 4x2 mesh), through
    both the training phase and the prediction-set phase."""
    import jax.numpy as jnp

    from lvae_tpu.ops import kernels as kx
    from lvae_tpu.parallel.mesh import ShardedVITrainer
    from lvae_tpu.train.vi import VIConfig, VITrainer

    def build():
        ds = tiny_cohort(p=8, t=4, seed=0)
        blocks = build_subject_blocks(ds.labels, id_covariate=2)
        spec0, spec1 = kx.split_kernel_spec(
            cat_kernel=[2], sqexp_kernel=[0],
            cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
            id_covariate=2,
        )
        model = mv.SimpleVAE(latent_dim=3, num_dim=20, dtype=jnp.float64)
        params = jax.jit(lambda k, x: model.init(k, x, deterministic=True))(
            jax.random.key(0), jnp.asarray(ds.data[:2], jnp.float64)
        )
        gp = st.init_gp_params(
            spec0, spec1, 3, constrain_scales=True, dtype=jnp.float64
        )
        cfg = VIConfig(
            spec0=spec0, spec1=spec1, latent_dim=3, weight=0.5,
            loss_function="mse", constrain_scales=True, eps=1e-6,
        )
        z = st.init_inducing_points(ds.labels, m_inducing=6, seed=0)
        return VITrainer(
            model, cfg, ds, blocks, z, params, gp, dtype=jnp.float64
        )

    ref = build()
    ref.fit(4, log_every=0, chunk=2)

    trainer = build()
    sharded = ShardedVITrainer(trainer, make_mesh(4, 2))
    sharded.fit(4, log_every=0, chunk=2)

    for a, b in zip(ref.history, trainer.history):
        np.testing.assert_allclose(a["net"], b["net"], rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(ref.state.mu), np.asarray(trainer.state.mu), rtol=1e-7
    )

    # phase 2 on the sharded state
    pred = tiny_cohort(p=4, t=4, seed=5)
    pred.labels[:, 2] += 100
    mu_ref, _ = ref.optimize_prediction_set(pred, epochs=6, log_every=0)
    mu_got, _ = sharded.optimize_prediction_set(pred, epochs=6, log_every=0)
    np.testing.assert_allclose(mu_got, mu_ref, rtol=1e-7, atol=1e-10)


def test_pipeline_mesh_flags_vi_regime(tmp_path):
    """--data_mesh with variational_inference_training routes through
    ShardedVITrainer inside run_vi()."""
    from lvae_tpu.pipeline import LVAEPipeline
    from tests.test_pipeline import healthmnist_like, make_cfg

    cfg = make_cfg(
        str(tmp_path), hensman=False, natural_gradient=False,
        variational_inference_training=True, epochs=3, latent_dim=2,
        run_validation=False, run_tests=False, generate_images=False,
        data_mesh=2, latent_mesh=2,
    )
    pipeline = LVAEPipeline(cfg, {"train": healthmnist_like(p=4, t=5, seed=0)})
    pipeline.run_vi(pred_epochs=2)
    assert type(pipeline.trainer).__name__ == "ShardedVITrainer"
    assert np.isfinite(pipeline.trainer.history[-1]["net"])


def test_sharded_wrappers_reshard_on_state_writes():
    """fit() hands the WRAPPER to callbacks, and state assignment re-places
    leaves on the mesh — so checkpoint-resume and auto-recovery writes
    (numpy leaves) keep the requested parallelism instead of silently
    dropping it."""
    from lvae_tpu.parallel.mesh import ShardedStandardTrainer

    trainer = build_standard_trainer("GPapprox_closed")
    sharded = ShardedStandardTrainer(trainer, make_mesh(4, 2))
    seen = []
    sharded.fit(1, log_every=0, callback=lambda t, e, m: seen.append(t))
    assert seen and seen[0] is sharded  # wrapper, not the inner trainer

    # a state write with host (numpy) leaves comes back mesh-placed
    host_state = jax.tree.map(
        lambda a: np.asarray(a)
        if not jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key)
        else a,
        sharded.state,
    )
    sharded.state = host_state
    gp_leaf = sharded.state.trainables.gp.kp0.raw_scale
    assert gp_leaf.sharding.spec[0] == "latent"


def test_sharded_vi_resume_reshards(tmp_path):
    """run_vi's gp_model_folder resume writes through the VI wrapper's
    setter and the resumed state stays mesh-placed."""
    import jax.numpy as jnp

    from lvae_tpu.parallel.mesh import ShardedVITrainer
    from lvae_tpu.ops import kernels as kx
    from lvae_tpu.train.vi import VIConfig, VITrainer

    ds = tiny_cohort(p=8, t=4, seed=0)
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    model = mv.SimpleVAE(latent_dim=4, num_dim=20)
    params = jax.jit(lambda k, x: model.init(k, x, deterministic=True))(
        jax.random.key(0), jnp.asarray(ds.data[:2])
    )
    gp = st.init_gp_params(spec0, spec1, 4, constrain_scales=True)
    cfg = VIConfig(spec0=spec0, spec1=spec1, latent_dim=4, weight=0.5,
                   loss_function="mse", constrain_scales=True, eps=1e-6)
    z = st.init_inducing_points(ds.labels, m_inducing=6, seed=0)
    trainer = VITrainer(model, cfg, ds, blocks, z, params, gp)
    sharded = ShardedVITrainer(trainer, make_mesh(4, 2))

    host_state = jax.tree.map(
        lambda a: np.asarray(a)
        if not jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key)
        else a,
        sharded.state,
    )
    sharded.state = host_state
    assert sharded.state.mu.sharding.spec[0] == "data"
    assert sharded.state.gp.kp0.raw_scale.sharding.spec[0] == "latent"
    sharded.fit(1, log_every=0)  # still trains after the resharded write
    assert np.isfinite(trainer.history[-1]["net"])


def test_predictor_from_sharded_pipeline_uses_mesh(tmp_path):
    """LVAEPredictor built from a sharded pipeline carries the mesh and the
    serving-side GP prediction runs mesh-parallel, matching the
    single-device predictor."""
    from lvae_tpu.inference import LVAEPredictor
    from lvae_tpu.pipeline import LVAEPipeline
    from tests.test_pipeline import healthmnist_like, make_cfg

    def run(out, **over):
        cfg = make_cfg(
            out, epochs=2, run_validation=False, generate_images=False,
            run_tests=False, latent_dim=4, M=6, subjects_per_batch=4,
            **over,
        )
        pipeline = LVAEPipeline(cfg, {"train": healthmnist_like(p=8, t=5, seed=0)})
        pipeline.build_trainer()
        pipeline.train()
        return LVAEPredictor.from_pipeline(pipeline)

    ref = run(str(tmp_path / "single"))
    pred = run(str(tmp_path / "mesh"), data_mesh=2, latent_mesh=2)
    assert ref.mesh is None and pred.mesh is not None

    new = healthmnist_like(p=1, t=5, seed=9)
    new.labels[:, 2] = 777.0
    a = ref.predict_trajectory(new.data[:3], new.labels[:3], new.labels[3:])
    b = pred.predict_trajectory(new.data[:3], new.labels[:3], new.labels[3:])
    assert a.shape == b.shape and np.isfinite(b).all()
    # the models are trained independently, so compare each against ITS OWN
    # single-device recompute instead: rebuild the mesh predictor without a
    # mesh and require identical numbers
    b_single = pred._replace(mesh=None).predict_trajectory(
        new.data[:3], new.labels[:3], new.labels[3:]
    )
    np.testing.assert_allclose(b, b_single, rtol=1e-4, atol=1e-5)


def test_sharded_wrapper_attribute_writes_reach_inner():
    """Writes to delegated attributes go through to the inner trainer —
    landing in the wrapper's __dict__ would silently shadow the name while
    the trainer computes on the stale inner value."""
    from lvae_tpu.parallel.mesh import ShardedStandardTrainer

    trainer = build_standard_trainer("GPapprox_closed")
    sharded = ShardedStandardTrainer(trainer, make_mesh(2, 1))
    new_mask = trainer.block_mask + 0  # any array
    sharded.block_mask = new_mask
    assert trainer.block_mask is new_mask  # reached the inner trainer
    assert "block_mask" not in vars(sharded)  # no wrapper-side shadow


def _ghost_pad_standard(trainer, n_data):
    """Apply the wrapper's alignment padding WITHOUT a mesh (test control)."""
    import jax.numpy as jnp

    p, t = trainer.block_mask.shape
    ghosts = (-p) % n_data
    assert ghosts > 0

    def pad_rows(x, fill=0.0):
        a = np.asarray(x)
        pad = np.full((ghosts * t,) + a.shape[1:], fill, a.dtype)
        return jnp.asarray(np.concatenate([a, pad], axis=0))

    trainer.tdata = trainer.tdata._replace(
        data=pad_rows(trainer.tdata.data),
        labels=pad_rows(trainer.tdata.labels),
        pixmask=pad_rows(trainer.tdata.pixmask),
    )
    trainer.block_mask = jnp.asarray(
        np.concatenate(
            [np.asarray(trainer.block_mask), np.zeros((ghosts, t))], axis=0
        ),
        trainer.block_mask.dtype,
    )
    return trainer


@pytest.mark.parametrize("type_kl", ["closed", "GPapprox_closed"])
def test_sharded_standard_unaligned_ghost_padding(type_kl, capsys):
    """P=9 on a 4-way data axis: the wrapper pads 3 fully-masked ghost
    subjects and SHARDS (r2 silently replicated). Equality vs a single-device
    trainer with identical padding at 1e-8, and the compiled step partitions
    the padded subject axis."""
    from lvae_tpu.parallel.mesh import ShardedStandardTrainer

    ref = _ghost_pad_standard(build_standard_trainer(type_kl, p=9), 4)
    ref_hist = run_epochs(ref)

    trainer = build_standard_trainer(type_kl, p=9)
    sharded = ShardedStandardTrainer(trainer, make_mesh(4, 2))
    assert "ghost subject" in capsys.readouterr().out
    assert trainer.block_mask.shape[0] == 12  # 9 + 3 ghosts
    got_hist = run_epochs(sharded)

    for a, b in zip(ref_hist, got_hist):
        np.testing.assert_allclose(a.net, b.net, rtol=1e-8)
        np.testing.assert_allclose(a.gp, b.gp, rtol=1e-8)

    txt = (
        trainer.step_fn.lower(trainer.state, trainer.tdata, trainer.block_mask)
        .compile()
        .as_text()
    )
    assert txt.count("all-reduce") > 0
    # block stacks at local shape [L/2, 12/4, T, T] — sharded, not replicated
    if type_kl == "GPapprox_closed":
        assert "f64[2,3,4,4]" in txt, "padded subject axis not partitioned"
        assert "f64[4,12,4,4]" not in txt, "found a replicated block stack"


@pytest.mark.parametrize("type_kl", ["closed", "GPapprox_closed"])
def test_ghost_rows_contribute_exactly_zero(type_kl):
    """Ghost-content independence: the same padded trainer with garbage in
    the ghost rows produces identical losses — ghosts cannot influence any
    term (incl. the per-pixel NLL constant and the closed-KL prior)."""
    from lvae_tpu.train.standard import full_batch_loss

    t_a = _ghost_pad_standard(build_standard_trainer(type_kl, p=9), 4)
    t_b = build_standard_trainer(type_kl, p=9)
    p, t = t_b.block_mask.shape
    t_b = _ghost_pad_standard(t_b, 4)
    # poison the ghost rows of variant b
    data = np.array(t_b.tdata.data)
    labels = np.array(t_b.tdata.labels)
    data[p * t:] = 7.5
    labels[p * t:] = 3.0
    t_b.tdata = t_b.tdata._replace(
        data=np.asarray(data), labels=np.asarray(labels)
    )

    key = jax.random.key(42)
    _, m_a = full_batch_loss(
        t_a.model, t_a.cfg, t_a.state.trainables, t_a.tdata, t_a.block_mask, key
    )
    _, m_b = full_batch_loss(
        t_b.model, t_b.cfg, t_b.state.trainables, t_b.tdata, t_b.block_mask, key
    )
    np.testing.assert_allclose(float(m_a.net), float(m_b.net), rtol=1e-12)
    np.testing.assert_allclose(float(m_a.gp), float(m_b.gp), rtol=1e-12)
    np.testing.assert_allclose(float(m_a.nll), float(m_b.nll), rtol=1e-12)

    # and the deterministic GP term is padding-invariant vs NO padding at all
    t_c = build_standard_trainer(type_kl, p=9)
    _, m_c = full_batch_loss(
        t_c.model, t_c.cfg, t_c.state.trainables, t_c.tdata, t_c.block_mask, key
    )
    np.testing.assert_allclose(float(m_a.gp), float(m_c.gp), rtol=1e-9)


def test_unaligned_predict_inputs_warn():
    """_put_axis_or_replicate warns when it falls back to replication."""
    import warnings as w

    from lvae_tpu.parallel import mesh as pm

    mesh = make_mesh(4, 2)
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        pm._put_axis_or_replicate(np.zeros((9, 3)), mesh, "data")
    assert any("does not divide" in str(r.message) for r in rec)


def test_sharded_matches_single_device_flat_gather():
    """The flat-view minibatch gather (train/hensman.use_flat_gather — the
    P=1000 layout fix; its shape-keyed auto gate never fires on test-sized
    cohorts, so force it) is semantics-preserving under a mesh: the sharded
    trainer still reproduces the single-device numbers. SimpleVAE data is
    2-D (the gather is a no-op reshape), so use a conv cohort."""
    import jax.numpy as jnp

    def build(flag):
        old = th.use_flat_gather
        th.use_flat_gather = flag
        try:
            ds = tiny_cohort(p=8, t=4, conv=True)
            blocks = build_subject_blocks(ds.labels, id_covariate=2)
            cfg = make_cfg(True, p=8, t=4, latent_dim=4)
            model = mv.ConvVAE(latent_dim=4, num_dim=36 * 36, p=0.0,
                               dtype=jnp.float64)
            z = st.init_inducing_points(ds.labels, m_inducing=6, seed=0)
            tr = th.HensmanTrainer(
                model, cfg, ds, blocks, z, subjects_per_batch=4, seed=0,
                dtype=jnp.float64,
            )
            return tr
        finally:
            th.use_flat_gather = old

    old = th.use_flat_gather
    th.use_flat_gather = True
    try:
        ref = build(True)
        ref_hist = run_epochs(ref, n=2)
        trainer = build(True)
        sharded = ShardedHensmanTrainer(trainer, make_mesh(4, 2))
        got_hist = run_epochs(sharded, n=2)
    finally:
        th.use_flat_gather = old
    for a, b in zip(ref_hist, got_hist):
        np.testing.assert_allclose(a.net, b.net, rtol=1e-8)
        np.testing.assert_allclose(a.kld, b.kld, rtol=1e-8)
