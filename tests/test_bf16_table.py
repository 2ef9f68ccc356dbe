"""bf16 frame-table storage (train/hensman.use_bf16_table).

When the VAE computes in bf16, the device-resident frame/pixmask tables may
be stored bf16 (halves the per-step gather bytes — the P=1000 budget's top
HBM op class); the GP side (labels, z) must stay in the GP dtype and the
loss target is upcast in batch_loss.
"""

import jax.numpy as jnp
import numpy as np

from lvae_tpu.models.vae import ConvVAE
from lvae_tpu.ops import kernels as kx
from lvae_tpu.train import hensman as th
from lvae_tpu.train import state as st
from tests.test_pipeline import healthmnist_like


def _build(monkeypatch, model_dtype, force_table):
    from lvae_tpu.data.blocks import build_subject_blocks

    monkeypatch.setattr(th, "use_bf16_table", force_table)
    ds = healthmnist_like(p=6, t=5, seed=0)
    blocks = build_subject_blocks(ds.labels, id_covariate=2)
    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2], sqexp_kernel=[0], id_covariate=2,
    )
    cfg = th.HensmanConfig(
        spec0=spec0, spec1=spec1, latent_dim=4, P_tot=6, N_tot=30,
        weight=0.15, loss_function="mse", natural_gradient=True,
        natural_gradient_lr=0.01, constrain_scales=True, eps=1e-5,
        dropout=False,
    )
    model = ConvVAE(latent_dim=4, num_dim=36 * 36, p=0.0, dtype=model_dtype)
    z = st.init_inducing_points(ds.labels, 6, seed=0)
    return th.HensmanTrainer(
        model, cfg, ds, blocks, z, subjects_per_batch=3,
        dtype=jnp.float32,
    )


def test_bf16_table_gate_and_step(monkeypatch):
    # f32 model → table stays f32 regardless of the switch
    tr = _build(monkeypatch, jnp.float32, True)
    assert tr.tdata.data.dtype == jnp.float32
    assert tr.tdata.pixmask.dtype == jnp.float32

    # bf16 model + switch on → bf16 frame/pixmask tables, GP side f32
    tr = _build(monkeypatch, jnp.bfloat16, True)
    assert tr.tdata.data.dtype == jnp.bfloat16
    assert tr.tdata.pixmask.dtype == jnp.bfloat16
    assert tr.tdata.labels.dtype == jnp.float32
    assert tr.tdata.z.dtype == jnp.float32
    ms = tr.run_epochs(2)
    assert np.isfinite(ms[-1].net)
    # metrics accumulate in the GP dtype (upcast target), not bf16
    assert not np.isnan(ms[-1].recon)

    # switch forced off → f32 table even with a bf16 model
    tr = _build(monkeypatch, jnp.bfloat16, False)
    assert tr.tdata.data.dtype == jnp.float32


def test_bf16_table_close_to_f32_table(monkeypatch):
    """Table quantization shifts the loss target by <=1 bf16 ulp: the first
    epoch's metrics must track the f32-table run closely (NOT bitwise —
    the target is quantized; that is the documented, accuracy-revalidated
    numerics change)."""
    tr16 = _build(monkeypatch, jnp.bfloat16, True)
    ms16 = tr16.run_epochs(1)[-1]
    tr32 = _build(monkeypatch, jnp.bfloat16, False)
    ms32 = tr32.run_epochs(1)[-1]
    assert np.isfinite(ms16.net) and np.isfinite(ms32.net)
    np.testing.assert_allclose(ms16.recon, ms32.recon, rtol=2e-2)
    np.testing.assert_allclose(ms16.net, ms32.net, rtol=2e-2)


def test_to_device_chunked_matches_direct():
    """Chunked upload == direct jnp.asarray for values/shape/dtype, across
    the budget boundary and dtype conversions (utils/transfer.py)."""
    import jax.numpy as jnp
    import numpy as np

    from lvae_tpu.utils.transfer import to_device_chunked

    rng = np.random.default_rng(0)
    a = rng.normal(size=(1000, 7)).astype(np.float32)  # 28 KB

    # big-array path: force a tiny budget so the 28 KB array chunks
    out = to_device_chunked(a, chunk_mb=0.004)  # ~4 KB → many slices
    np.testing.assert_array_equal(np.asarray(out), a)
    assert out.dtype == jnp.float32

    # dtype conversion through the chunked path
    out16 = to_device_chunked(a, dtype=jnp.bfloat16, chunk_mb=0.004)
    np.testing.assert_array_equal(
        np.asarray(out16), np.asarray(a.astype(jnp.bfloat16))
    )

    # small-array direct path and device-array passthrough
    small = to_device_chunked(a)  # under the default budget → direct
    np.testing.assert_array_equal(np.asarray(small), a)
    again = to_device_chunked(small, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(again), a)

    # scalars / 1-row arrays take the direct path
    np.testing.assert_array_equal(
        np.asarray(to_device_chunked(np.float32(3.5), chunk_mb=0.0)), 3.5
    )


def test_serving_basis_jits_are_module_cached():
    """ADVICE r4: repeat refreshes must hit jax.jit's in-process cache —
    the wrapper must be the SAME function object across calls (a per-call
    jax.jit(lambda) never hits)."""
    from lvae_tpu.inference import _extend_basis_jit, _fold_basis_jit
    from lvae_tpu.ops import kernels as kx

    spec0, spec1 = kx.split_kernel_spec(
        cat_kernel=[2], sqexp_kernel=[0], id_covariate=2,
    )
    assert _extend_basis_jit(spec0, spec1) is _extend_basis_jit(spec0, spec1)
    assert _fold_basis_jit(spec0, spec1, 1e-6) is _fold_basis_jit(
        spec0, spec1, 1e-6
    )
    # distinct statics get distinct wrappers (no accidental cross-spec reuse)
    other0, other1 = kx.split_kernel_spec(cat_kernel=[2], id_covariate=2)
    assert _extend_basis_jit(other0, other1) is not _extend_basis_jit(
        spec0, spec1
    )
