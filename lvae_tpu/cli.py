"""Command-line entry points.

``python -m lvae_tpu.cli --f=config.txt``        — L-VAE training (LVAE.py)
``python -m lvae_tpu.cli pretrain --f=cfg.txt``  — VAE pre-training (VAE.py)
``python -m lvae_tpu.cli generate ...``          — Health MNIST generation

Flag files use the reference's exact format (one ``--flag=value`` per line,
kernel structure as Python literals; parse_model_args.py:9-15, 74-79), so a
reference user's configs work unchanged.
"""

from __future__ import annotations

import sys

from lvae_tpu.config import LVAEConfig, VAEConfig, parse_flag_lines


def _print_config(cfg) -> None:
    import dataclasses

    for f in dataclasses.fields(cfg):
        print(f"{f.name}: {getattr(cfg, f.name)}")


def main_lvae(argv) -> int:
    cfg, unknown = parse_flag_lines(argv, LVAEConfig)
    for k, v in unknown.items():
        print(f"WARNING: unknown flag --{k}={v}")
    _print_config(cfg)
    import jax

    print(f"Running on device: {jax.devices()[0]}")
    from lvae_tpu.pipeline import LVAEPipeline

    pipeline = LVAEPipeline(cfg)
    pipeline.run()  # routes the VI regime through run_vi() internally
    return 0


def main_pretrain(argv) -> int:
    cfg, unknown = parse_flag_lines(argv, VAEConfig)
    for k, v in unknown.items():
        print(f"WARNING: unknown flag --{k}={v}")
    _print_config(cfg)
    assert cfg.loss_function in ("mse", "nll")
    import os

    from lvae_tpu.data.datasets import load_dataset
    from lvae_tpu.models.vae import make_vae
    from lvae_tpu.train.pretrain import VAEPretrainer
    from lvae_tpu.utils.checkpoint import save_checkpoint

    dataset = load_dataset(cfg, "train")
    print(f"Length of dataset:  {len(dataset)}")
    model = make_vae(
        cfg.type_nnet, cfg.latent_dim, cfg.num_dim or dataset.num_dim,
        vy_init=cfg.vy_init, dropout=cfg.dropout, dropout_input=cfg.dropout_input,
        T=cfg.T or None, hidden_dim=cfg.hidden_dim, type_rnn=cfg.type_rnn,
    )
    pre = VAEPretrainer(
        model, dataset, loss_function=cfg.loss_function,
        learning_rate=cfg.learning_rate, dropout=cfg.dropout > 0, seed=cfg.seed,
        vy_fixed=cfg.vy_fixed,
    )
    test_dataset = load_dataset(cfg, "test") if cfg.run_tests else None

    def callback(trainer, epoch, metrics):
        # VAE.py:378-383: periodic test MSE + reconstruction plot + checkpoint
        if epoch % 25 == 0:
            if cfg.run_tests and test_dataset is not None:
                from lvae_tpu.evaluation.generation import vae_output
                from lvae_tpu.evaluation.testing import vae_test

                vae_test(model, trainer.params, test_dataset)
                vae_output(model, trainer.params, dataset, epoch, cfg.save_path)
            save_checkpoint(
                os.path.join(cfg.save_path, f"model_params_vae_{epoch}.ckpt"),
                trainer.params,
            )

    pre.fit(cfg.epochs, callback=callback)
    save_checkpoint(os.path.join(cfg.save_path, "model_params_vae.ckpt"), pre.params)
    return 0


def main(argv=None) -> int:
    # Persistent XLA compile cache for every CLI invocation: remote-chip
    # compiles run 10-500 s, so a timed-out/retried run must not pay twice
    # (same policy as the benchmark drivers; see utils/compile_cache.py).
    from lvae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "pretrain":
        return main_pretrain(argv[1:])
    if argv and argv[0] == "generate":
        from lvae_tpu.data.healthmnist import main as gen_main

        gen_main(argv[1:])
        return 0
    return main_lvae(argv)


if __name__ == "__main__":
    raise SystemExit(main())
