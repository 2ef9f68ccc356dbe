"""Combinatorial regime smoke matrix.

Every reference flag combination a user can reach from a flag file should
at least train a couple of epochs and (where applicable) validate without
crashing (LVAE.py:27-434 dispatch surface × parse_model_args.py flags).
Numerical depth lives in the per-regime tests; this file pins the
*wiring* — regimes × losses × model families × scale/noise flags.
"""

import numpy as np
import pytest

from lvae_tpu.pipeline import LVAEPipeline
from tests.test_pipeline import healthmnist_like, make_cfg

MATRIX = [
    # (id, overrides)
    ("hensman_nll", dict(loss_function="nll")),
    ("hensman_no_natgrad", dict(natural_gradient=False)),
    ("hensman_free_scales", dict(constrain_scales=False)),
    ("hensman_vy_fixed", dict(vy_fixed=True)),
    ("hensman_simple", dict(type_nnet="simple")),
    ("hensman_dropout", dict(dropout=0.3)),
    ("standard_gpapprox_nll",
     dict(hensman=False, natural_gradient=False, type_KL="GPapprox",
          loss_function="nll")),
    ("standard_closed_nll",
     dict(hensman=False, natural_gradient=False, type_KL="closed",
          loss_function="nll", latent_dim=2)),
    ("gppvae_minibatch",
     dict(hensman=False, natural_gradient=False, mini_batch=True,
          type_KL="GPapprox_closed")),
    ("gppvae_minibatch_nll",
     dict(hensman=False, natural_gradient=False, mini_batch=True,
          type_KL="GPapprox", loss_function="nll")),
    ("standard_free_scales",
     dict(hensman=False, natural_gradient=False, constrain_scales=False)),
    ("hensman_rnn", dict(type_nnet="rnn", hidden_dim=8)),
    ("hensman_rnn_gru_nll",
     dict(type_nnet="rnn", hidden_dim=8, type_rnn="gru",
          loss_function="nll")),
]


@pytest.mark.parametrize("name,over", MATRIX, ids=[m[0] for m in MATRIX])
def test_regime_matrix_trains_and_validates(tmp_path, name, over):
    over = dict(over)  # parametrize shares the MATRIX dicts by reference
    cfg = make_cfg(
        str(tmp_path), epochs=2, run_tests=False, generate_images=False,
        run_validation=True, test_freq=1, checkpoint_every=1,
        latent_dim=over.pop("latent_dim", 3), M=6, **over,
    )
    datasets = {
        "train": healthmnist_like(p=4, t=5, seed=0),
        "validation": healthmnist_like(p=3, t=5, seed=1),
    }
    pipeline = LVAEPipeline(cfg, datasets)
    pipeline.build_trainer()
    pipeline.train()
    hist = pipeline.trainer.history
    assert len(hist) == cfg.epochs
    last = hist[-1]
    net = last.net if hasattr(last, "net") else last["net"]
    assert np.isfinite(net)
    # the validation callback ran and tracked a best model
    assert np.isfinite(pipeline.best["val"])
