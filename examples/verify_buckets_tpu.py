"""On-chip drive of the bucketed ragged-T Hensman trainer (T_buckets path)."""

import numpy as np

from lvae_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp  # noqa: E402

from lvae_tpu.data import blocks as bk  # noqa: E402
from lvae_tpu.data.datasets import ArrayDataset  # noqa: E402
from lvae_tpu.models import vae as mv  # noqa: E402
from lvae_tpu.ops import kernels as kx  # noqa: E402
from lvae_tpu.train import hensman as th  # noqa: E402
from lvae_tpu.train import state as st  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    rows = []
    p_short, t_short, p_long, t_long = 20, 5, 4, 16
    for s in range(p_short + p_long):
        t = t_short if s < p_short else t_long
        for i in range(t):
            rows.append([float(i), rng.normal(), float(s), float(s % 2)])
    labels = np.asarray(rows)
    n = len(labels)
    d = 64
    ds = ArrayDataset(
        data=rng.uniform(size=(n, d)).astype(np.float32),
        labels=labels,
        mask=(rng.uniform(size=(n, d)) > 0.25).astype(np.float32),
    )
    blocks = bk.build_subject_blocks(ds.labels, id_covariate=2)
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2], sqexp_kernel=[0],
        cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
        id_covariate=2,
    )
    p = blocks.num_subjects
    cfg = th.HensmanConfig(
        spec0=spec0, spec1=spec1, latent_dim=4, P_tot=p, N_tot=n,
        weight=0.5, loss_function="mse", natural_gradient=True,
        natural_gradient_lr=0.01, constrain_scales=True, eps=1e-5,
        dropout=False,
    )
    model = mv.SimpleVAE(latent_dim=4, num_dim=d)
    z = st.init_inducing_points(ds.labels, m_inducing=10, seed=0)
    trainer = th.HensmanTrainer(
        model, cfg, ds, blocks, z, subjects_per_batch=4, seed=0, t_buckets=2,
    )
    assert len(trainer.tables) == 2, trainer.tables
    print("bucket T caps:", [t.index.shape[1] for t in trainer.tables])
    ms = trainer.run_epochs(6)
    for i, m in enumerate(ms):
        print(f"epoch {i}: net={m.net:.4f} kld={m.kld:.4f}")
    assert np.isfinite(ms[-1].net)
    assert ms[-1].net < ms[0].net, (ms[0].net, ms[-1].net)
    eigs = np.linalg.eigvalsh(np.asarray(trainer.state.H_nat))
    assert eigs.min() > 0, eigs.min()
    print("OK: bucketed trainer on", str(jnp.zeros(1).device), "H PSD, loss down")


if __name__ == "__main__":
    main()
