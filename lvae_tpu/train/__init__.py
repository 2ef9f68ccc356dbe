"""Training regimes: Hensman SVI, standard full-batch, GPPVAE-style, VI, pretrain."""

from lvae_tpu.train.state import GPParams, TrainData  # noqa: F401
