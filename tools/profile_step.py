"""Per-step cost decomposition of the Hensman training step.

Times the four pieces of the SVI step in isolation, each scan-chained over a
structurally-dependent carry (so XLA cannot hoist or serve iterations from
the relay cache — CLAUDE.md's microbenchmark rule):

  (a) ConvVAE forward+backward on one subjects_per_batch batch;
  (b) GP bound (gp_block_operators → minibatch_kld) fwd+bwd + closed-form
      natural-gradient grads;
  (c) natural-gradient (m, H) inverse-space update;
  (d) the optimizer update (make_optimizer default).

Isolated pieces lose cross-op overlap the fused epoch program enjoys, so
the sum slightly over-estimates the real step (bench.py measures that).
Source of benchmarks/README.md's "per-step cost decomposition" table.

Usage: env PYTHONPATH=.:/root/.axon_site python tools/profile_step.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lvae_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax.numpy as jnp  # noqa: E402

STEPS = 100


def scan_time(name, body, carry, reps=5, steps=STEPS):
    """Median ms/step of a scanned body; host-sync each rep."""
    import jax

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(lambda cc, i: (body(cc, i), None), c,
                            jnp.arange(steps))
        return c

    carry = run(carry)  # compile
    jax.block_until_ready(carry)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        carry = run(carry)
        _ = float(jnp.sum(jax.tree.leaves(carry)[0]))  # force materialise
        times.append((time.perf_counter() - t0) / steps)
    ms = float(np.median(times) * 1e3)
    print(f"{name:44s} {ms*1e3:8.0f} us/step")
    return ms


def main():
    import jax

    from bench import IMG, KERNEL_KW, LATENT, M_IND, P, SPB, T, synth_cohort
    from lvae_tpu.models.vae import ConvVAE, vae_loss
    from lvae_tpu.ops import elbo as eb
    from lvae_tpu.ops import kernels as kx
    from lvae_tpu.train import state as st

    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    data, labels, mask = synth_cohort()
    spec0, spec1 = kx.split_kernel_spec(id_covariate=2, **KERNEL_KW)
    kp0 = kx.init_kernel_params(spec0, LATENT)
    kp1 = kx.init_kernel_params(spec1, LATENT)
    noise = jnp.ones((LATENT,), jnp.float32)
    z = jnp.asarray(st.init_inducing_points(labels, M_IND, seed=0), jnp.float32)
    m0, h0 = st.init_variational(LATENT, M_IND, True, 0)

    model = ConvVAE(latent_dim=LATENT, num_dim=IMG * IMG, p=0.0)
    n_b = SPB * T  # samples per training batch
    xbatch = jnp.asarray(data[:n_b])
    pixmask = jnp.asarray(mask[:n_b])
    params = jax.jit(lambda k, x: model.init(k, x, deterministic=True))(
        jax.random.key(0), xbatch[:2]
    )
    xb = jnp.asarray(labels[:n_b].reshape(SPB, T, -1), jnp.float32)

    # (a) VAE fwd+bwd ------------------------------------------------------
    def vae_fwd_bwd(p, i):
        def loss(p_):
            recon, mu, lv = model.apply(
                p_, xbatch + i * 1e-6, rng=jax.random.key(0),
                deterministic=True,
            )
            mse_i, _ = vae_loss(
                p_["params"]["raw_log_vy"], recon, xbatch, pixmask
            )
            return jnp.sum(mse_i)

        g = jax.grad(loss)(p)
        return jax.tree.map(lambda a, b: a - 1e-9 * b, p, g)

    a_ms = scan_time("(a) ConvVAE fwd+bwd (400 samples)", vae_fwd_bwd, params)

    # (b) GP bound fwd+bwd + NG grads -------------------------------------
    rng = np.random.default_rng(0)
    mu_b = jnp.asarray(rng.normal(size=(SPB, T, LATENT)), jnp.float32)
    lv_b = jnp.asarray(rng.normal(size=(SPB, T, LATENT)) * 0.1, jnp.float32)

    def gp_fwd_bwd(carry, i):
        kp0_, kp1_ = carry

        def loss(kps):
            k0, k1 = kps
            ops = eb.gp_block_operators(
                spec0, spec1, k0, k1, noise, xb, z, eps=1e-5
            )
            kld, ng = eb.minibatch_kld(
                ops, m0, h0, mu_b + i * 1e-6, lv_b,
                P_tot=P, P_batch=SPB, N_tot=P * T, natural_gradient=True,
            )
            return kld, ng

        (kld, ng), g = jax.value_and_grad(loss, has_aux=True)((kp0_, kp1_))
        g0, g1 = g
        return (
            jax.tree.map(lambda a, b: a - 1e-9 * b, kp0_, g0),
            jax.tree.map(lambda a, b: a - 1e-9 * b, kp1_, g1),
        )

    b_ms = scan_time("(b) GP bound fwd+bwd + NG grads", gp_fwd_bwd, (kp0, kp1))

    # (c) natural-gradient (m, H) update ----------------------------------
    ops0 = jax.jit(
        lambda: eb.gp_block_operators(spec0, spec1, kp0, kp1, noise, xb, z,
                                      eps=1e-5)
    )()
    _, ng0 = jax.jit(
        lambda: eb.minibatch_kld(ops0, m0, h0, mu_b, lv_b, P_tot=P,
                                 P_batch=SPB, N_tot=P * T,
                                 natural_gradient=True)
    )()

    def ng_update(carry, i):
        m_, h_ = carry
        ng_i = ng0._replace(grad_m=ng0.grad_m + i * 1e-9, iH=None)
        return eb.natural_gradient_update(m_, h_, ng_i, 0.01)

    c_ms = scan_time("(c) natural-gradient (m, H) update", ng_update, (m0, h0))

    # (d) optimizer update -------------------------------------------------
    import optax

    trainables = st.Trainables(vae=params, gp=st.init_gp_params(
        spec0, spec1, LATENT), m=None, h_factor=None, z=None)
    opt = st.make_optimizer(1e-3)
    ostate = opt.init(trainables)

    def opt_step(carry, i):
        tr, s = carry
        g = jax.tree.map(lambda x: x * 1e-3 + i.astype(x.dtype) * 1e-6, tr)
        upd, s = opt.update(g, s, tr)
        return optax.apply_updates(tr, upd), s

    d_ms = scan_time("(d) optimizer update (make_optimizer)", opt_step,
                     (trainables, ostate))

    total = a_ms + b_ms + c_ms + d_ms
    print(f"{'sum of isolated pieces':44s} {total*1e3:8.0f} us/step "
          f"(fused epoch step is lower; see bench.py)")


if __name__ == "__main__":
    main()
