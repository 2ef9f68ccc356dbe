"""Bucketed ragged-T batching (SURVEY §7 step 7).

The reference handles ragged cohorts with an exact per-subject Python loop
(elbo_functions.py:219-307, utils.py:89-113 — cost ∝ Σ T_s³). The TPU build
pads subjects into ≤K T-length buckets; masking makes the padding exact, so
bucketing must change COST only, never values. The invariance test here
proves exactly that: every GP bound, the closed-form natural gradients and
the autodiff gradients are identical (1e-8..1e-10 in x64) whether a subject
batch is padded to its bucket cap or to the global T_max.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lvae_tpu.data import blocks as bk
from lvae_tpu.data.datasets import ArrayDataset
from lvae_tpu.models import vae as mv
from lvae_tpu.train import hensman as th
from lvae_tpu.train import state as st
from tests.test_training import make_cfg, tiny_cohort


def ragged_cohort(p_short=6, t_short=3, p_long=2, t_long=8, d=20, seed=0):
    """Physionet-like bimodal length distribution: many short, few long."""
    rng = np.random.default_rng(seed)
    rows = []
    for s in range(p_short + p_long):
        t = t_short if s < p_short else t_long
        for i in range(t):
            rows.append([float(i), rng.normal(), float(s), float(s % 2)])
    labels = np.asarray(rows)
    n = len(labels)
    data = rng.uniform(size=(n, d)).astype(np.float32)
    mask = (rng.uniform(size=(n, d)) > 0.25).astype(np.float32)
    return ArrayDataset(data=data, labels=labels, mask=mask)


def test_bucket_boundaries_properties():
    t_lens = np.asarray([3] * 50 + [5] * 20 + [9] * 5 + [90])
    caps = bk.bucket_boundaries(t_lens, max_buckets=3)
    assert len(caps) <= 3
    assert caps[-1] == 90
    assert caps == sorted(caps)
    # the lone 90-length subject must not drag the 50 short subjects up:
    # the cheapest merges keep a small first cap
    assert caps[0] <= 5
    # degenerate cases
    assert bk.bucket_boundaries(t_lens, max_buckets=1) == [90]
    fixed = bk.bucket_boundaries(np.full(10, 4), max_buckets=4)
    assert fixed == [4]


def test_bucket_partition_exact():
    ds = ragged_cohort()
    blocks = bk.build_subject_blocks(ds.labels, id_covariate=2)
    buckets = bk.bucket_subject_blocks(blocks, max_buckets=2)
    assert len(buckets) == 2
    assert buckets[0].t_max == 3 and buckets[1].t_max == 8
    # every subject lands in exactly one bucket
    all_ids = np.concatenate([b.subject_ids for b in buckets])
    assert sorted(all_ids.tolist()) == sorted(blocks.subject_ids.tolist())
    # indices + masks are the original rows, truncated to the cap
    for b in buckets:
        for r, sid in enumerate(b.subject_ids):
            orig = int(np.flatnonzero(blocks.subject_ids == sid)[0])
            tl = int(blocks.t_lens[orig])
            np.testing.assert_array_equal(
                b.index[r, :tl], blocks.index[orig, :tl]
            )
            assert b.mask[r, :tl].sum() == tl and b.mask[r, tl:].sum() == 0
    # a single bucket degenerates to the original table
    (one,) = bk.bucket_subject_blocks(blocks, max_buckets=1)
    np.testing.assert_array_equal(one.index, blocks.index)
    np.testing.assert_array_equal(one.mask, blocks.mask)


def _make_trainer(ds, blocks, t_buckets, seed=0, dtype=jnp.float32):
    p = blocks.num_subjects
    cfg = make_cfg(True, p=p)._replace(N_tot=len(ds), P_tot=p)
    model = mv.SimpleVAE(latent_dim=cfg.latent_dim, num_dim=20, dtype=dtype)
    z = st.init_inducing_points(ds.labels, m_inducing=8, seed=0)
    return th.HensmanTrainer(
        model, cfg, ds, blocks, z, subjects_per_batch=3, seed=seed,
        t_buckets=t_buckets, dtype=dtype,
    )


def test_bucketed_equals_global_padding():
    """The load-bearing invariance: bucket-T padding == T_max padding.

    The same ragged subject batch, once padded to its bucket cap and once
    re-padded to a larger global T_max, must produce identical GP bounds,
    natural gradients AND autodiff gradients — the masked bounds are exact
    under any padding length (ops/elbo.py masking invariants; reference
    semantics elbo_functions.py:219-307). This is exactly the value-level
    guarantee that lets the bucketed trainer change COST without changing
    the optimisation problem. (Trainer-level bitwise equality is impossible
    by design: the latent-sample eps draw is shaped by the padded batch.)
    """
    import jax

    from lvae_tpu.ops import elbo as eb
    from lvae_tpu.ops import kernels as kx
    from tests.test_elbo import EPS, make_problem

    rng = np.random.default_rng(3)
    pr = make_problem(rng, P=5, T=4, L=3, M=5, ragged=True)
    t_small = pr["xb"].shape[1]
    t_big = t_small + 5  # simulate the global T_max a long subject would force

    def repad(a, t_new):
        out = np.zeros((a.shape[0], t_new) + a.shape[2:], dtype=np.asarray(a).dtype)
        out[:, : a.shape[1]] = np.asarray(a)
        return jnp.asarray(out)

    m0 = jnp.asarray(rng.normal(size=(pr["L"], pr["M"], 1)))
    h_half = rng.normal(size=(pr["L"], pr["M"], pr["M"]))
    h0 = jnp.asarray(h_half @ np.swapaxes(h_half, -1, -2) + 0.5 * np.eye(pr["M"]))

    def kld_all(kp0, kp1, xb, mask, mu_b, lv_b):
        ops = eb.gp_block_operators(
            pr["spec0"], pr["spec1"], kp0, kp1, pr["noise"], xb, pr["z"],
            mask, eps=EPS,
        )
        kld, ng = eb.minibatch_kld(
            ops, m0, h0, mu_b, lv_b, P_tot=11, P_batch=5, N_tot=40,
            natural_gradient=True,
        )
        return kld, (ng, eb.dubo(ops, mu_b, lv_b), eb.gp_elbo(ops, mu_b))

    args_small = (pr["xb"], pr["mask"], pr["mu_b"], pr["lv_b"])
    args_big = tuple(repad(a, t_big) for a in args_small)

    grad_fn = jax.grad(
        lambda kp0, kp1, mu_b, lv_b, xb, mask: kld_all(kp0, kp1, xb, mask, mu_b, lv_b)[0],
        argnums=(0, 1, 2, 3),
        has_aux=False,
    )
    kld_s, (ng_s, dubo_s, elbo_s) = kld_all(pr["kp0"], pr["kp1"], *args_small[:2], *args_small[2:])
    kld_b, (ng_b, dubo_b, elbo_b) = kld_all(pr["kp0"], pr["kp1"], *args_big[:2], *args_big[2:])
    np.testing.assert_allclose(np.asarray(kld_s), np.asarray(kld_b), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(dubo_s), np.asarray(dubo_b), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(elbo_s), np.asarray(elbo_b), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(ng_s.grad_m), np.asarray(ng_b.grad_m), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ng_s.grad_H), np.asarray(ng_b.grad_H), rtol=1e-9, atol=1e-12
    )

    g_s = grad_fn(pr["kp0"], pr["kp1"], args_small[2], args_small[3], args_small[0], args_small[1])
    g_b = grad_fn(pr["kp0"], pr["kp1"], args_big[2], args_big[3], args_big[0], args_big[1])
    # kernel-hyperparameter grads are padding-invariant
    for a, b in zip(jax.tree.leaves(g_s[:2]), jax.tree.leaves(g_b[:2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-12)
    # moment grads: the real (unpadded) region matches; padded region is 0
    for a, b in zip(jax.tree.leaves(g_s[2:]), jax.tree.leaves(g_b[2:])):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b[:, :t_small], rtol=1e-8, atol=1e-12)
        mask_np = np.asarray(pr["mask"])
        np.testing.assert_allclose(
            b[:, t_small:], 0.0, atol=1e-12,
        )
        # padding inside the small layout is also zero-grad
        np.testing.assert_allclose(a[mask_np == 0], 0.0, atol=1e-12)


def test_bucketed_training_decreases_loss():
    ds = ragged_cohort(p_short=8, t_short=3, p_long=3, t_long=7)
    blocks = bk.build_subject_blocks(ds.labels, id_covariate=2)
    trainer = _make_trainer(ds, blocks, t_buckets=2)
    first = trainer.run_epoch()
    for _ in range(10):
        last = trainer.run_epoch()
    assert np.isfinite(last.net) and last.net < first.net
    assert bool(st.tree_finite(trainer.state.trainables))
    eigs = np.linalg.eigvalsh(np.asarray(trainer.state.H_nat))
    assert eigs.min() > 0


def test_bucketed_fixed_T_degenerates():
    """On a fixed-T cohort, t_buckets>1 yields one bucket == the plain path."""
    ds = tiny_cohort()
    blocks = bk.build_subject_blocks(ds.labels, id_covariate=2)
    tr_a = _make_trainer(ds, blocks, t_buckets=1)
    tr_b = _make_trainer(ds, blocks, t_buckets=3)
    assert len(tr_b.tables) == 1
    a = tr_a.run_epoch()
    b = tr_b.run_epoch()
    np.testing.assert_allclose(a.net, b.net, rtol=1e-12)


def test_config_validation_guards():
    from lvae_tpu.config import LVAEConfig

    LVAEConfig(hensman=True, T_buckets=3).validate()
    with pytest.raises(AssertionError):
        LVAEConfig(hensman=False, T_buckets=2).validate()
    with pytest.raises(AssertionError):
        LVAEConfig(hensman=True, T_buckets=2, type_nnet="rnn").validate()
    with pytest.raises(AssertionError):
        LVAEConfig(hensman=True, T_buckets=0).validate()


def test_pipeline_bucketed_e2e(tmp_path):
    """varying_T + T_buckets through the full pipeline incl. GP test path."""
    from tests.test_pipeline import healthmnist_like, make_cfg as mk
    from lvae_tpu.pipeline import LVAEPipeline

    ds = healthmnist_like(p=6, t=5, seed=0)
    keep = np.ones(len(ds), bool)
    keep[[4, 9, 14, 27, 3, 8]] = False
    ragged = ArrayDataset(ds.data[keep], ds.labels[keep], ds.mask[keep])
    cfg = mk(
        str(tmp_path), varying_T=True, T_buckets=2, epochs=2,
        run_validation=False, generate_images=False, run_tests=True,
        checkpoint_every=10,
    )
    datasets = {
        "train": ragged,
        "test": healthmnist_like(p=3, t=5, seed=2),
        "prediction": ragged,
    }
    pipeline = LVAEPipeline(cfg, datasets)
    result = pipeline.run()
    assert len(pipeline.trainer.tables) == 2  # bucketing actually engaged
    assert pipeline.trainer.tables[0].index.shape[1] < blocks_tmax(ragged)
    assert np.isfinite(result.vae_mse) and np.isfinite(result.gp_mse)


def blocks_tmax(ds):
    return bk.build_subject_blocks(ds.labels, id_covariate=2).t_max


def test_sharded_bucketed_matches_single_device():
    """Bucketed tables × mesh placement: sharded == single-device at 1e-8."""
    from lvae_tpu.parallel.mesh import ShardedHensmanTrainer, make_mesh

    ds = ragged_cohort(p_short=6, t_short=3, p_long=2, t_long=6)
    blocks = bk.build_subject_blocks(ds.labels, id_covariate=2)
    tr_a = _make_trainer(ds, blocks, t_buckets=2, dtype=jnp.float64)
    tr_b = _make_trainer(ds, blocks, t_buckets=2, dtype=jnp.float64)
    sharded = ShardedHensmanTrainer(tr_b, make_mesh(2, 2))
    for _ in range(2):
        a = tr_a.run_epoch()
        b = sharded.run_epoch()
        np.testing.assert_allclose(a.net, b.net, rtol=1e-8)
        np.testing.assert_allclose(a.kld, b.kld, rtol=1e-8)
