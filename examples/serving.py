"""Serving example: train briefly, then serve with the AOT bundle.

Covers the three production paths:
  * chunked encode/decode/impute at a fixed batch size (zero per-request
    compiles — every executable is AOT-compiled at bundle build);
  * single-subject trajectory prediction via the precomputed low-rank GP
    basis (ops/predict.py PredictBasis + gp_predict_extend): the training
    cohort's block solves are folded ONCE, each request is one fixed-shape
    executable;
  * checkpoint-driven serving (LVAEPredictor.from_checkpoint) for loading
    a model trained elsewhere.

    PYTHONPATH=. python examples/serving.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from lvae_tpu.inference import LVAEPredictor  # noqa: E402
from lvae_tpu.pipeline import LVAEPipeline  # noqa: E402
from tests.test_pipeline import healthmnist_like, make_cfg  # noqa: E402


def main(out="/tmp/lvae_serving_example"):
    cfg = make_cfg(out, epochs=10, run_validation=False, generate_images=False,
                   run_tests=False, latent_dim=4, M=8)
    cohort = healthmnist_like(p=8, t=5, seed=0)
    pipeline = LVAEPipeline(cfg, {"train": cohort})
    pipeline.build_trainer()
    pipeline.train()

    pred = LVAEPredictor.from_pipeline(pipeline)
    bundle = pred.aot_compile(batch_size=16, t_obs=3, n_query=2)

    # 1. imputation: observed pixels kept bit-exact, missing filled
    frames, mask = cohort.data[:10], cohort.mask[:10]
    imputed = bundle.impute(frames, mask)
    print("imputed:", imputed.shape, "finite:", bool(np.isfinite(imputed).all()))

    # 2. trajectory prediction for a NEW subject: observe 3 frames,
    #    query the 2 unseen future timepoints
    new = healthmnist_like(p=1, t=5, seed=9)
    new.labels[:, 2] = 777.0  # unseen id
    future = bundle.predict_trajectory(
        new.data[:3], new.labels[:3], new.labels[3:]
    )
    print("future frames:", future.shape, "finite:", bool(np.isfinite(future).all()))

    # 3. latent encoding at arbitrary N (chunked through the fixed batch)
    mu = bundle.encode(cohort.data[:13])
    print("latents:", mu.shape)
    return bundle


if __name__ == "__main__":
    main()
    print("serving example OK")
