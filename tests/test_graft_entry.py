"""Driver-hook regression tests for ``__graft_entry__.py``.

The driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip(8)`` on virtual devices; neither was covered by the
suite, so an import error or trace-time breakage in either hook would
only surface in the driver run. These tests stay at trace/lowering level
(``jax.eval_shape`` / ``.lower()``) so they add seconds, not the minutes
a full dryrun execution costs on the single-core CI host — the executed
dryrun remains the driver's job.
"""

import sys

import jax
import numpy as np

sys.path.insert(0, ".")

import __graft_entry__ as ge  # noqa: E402


def test_entry_traces_and_is_scalar():
    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == ()
    assert out.dtype in (np.float32, np.float64)


def test_entry_args_are_jittable_pytrees():
    _, args = ge.entry()
    # every example arg must be a pytree of arrays (no Python scalars the
    # driver-side jit would treat as tracers of weak type surprises)
    leaves = jax.tree_util.tree_leaves(args)
    assert leaves, "entry() example args are empty"
    for leaf in leaves:
        assert hasattr(leaf, "shape") and hasattr(leaf, "dtype"), leaf


def test_dryrun_problem_is_ragged_and_bucketed():
    """The dryrun must exercise production layouts (VERDICT r2 item 9):
    ConvVAE 36x36, latent>=8, a ragged cohort that buckets into 2 tables."""
    from lvae_tpu.train.hensman import HensmanTrainer

    model, cfg, ds, blocks, z = ge._dryrun_problem(
        p_short=12, t_short=4, p_long=4, t_long=8, latent_dim=8
    )
    assert cfg.latent_dim >= 8
    assert ds.data.shape[1:] == (36, 36, 1)
    trainer = HensmanTrainer(
        model, cfg, ds, blocks, z, subjects_per_batch=4, t_buckets=2
    )
    assert len(trainer.tables) == 2
    t_lens = sorted(tab.index.shape[1] for tab in trainer.tables)
    assert t_lens == [4, 8]


def test_dryrun_epoch_lowers_on_mesh():
    """Trace + lower (no backend compile) the full sharded dryrun epoch on
    the suite's 8-device mesh — catches sharding-rule and shape breakage
    without paying the XLA compile the driver run pays."""
    from lvae_tpu.parallel.mesh import ShardedHensmanTrainer, make_mesh
    from lvae_tpu.train.hensman import HensmanTrainer

    model, cfg, ds, blocks, z = ge._dryrun_problem(
        p_short=12, t_short=4, p_long=4, t_long=8, latent_dim=8
    )
    trainer = HensmanTrainer(
        model, cfg, ds, blocks, z, subjects_per_batch=4, t_buckets=2
    )
    mesh = make_mesh(data=4, latent=2)
    sharded = ShardedHensmanTrainer(trainer, mesh)
    lowered = sharded.epochs_fn.lower(sharded.state, sharded.tdata, 1)
    assert lowered is not None
