"""A/B microbenchmark: optax.flatten(adam) vs the Pallas fused Adam.

Times the optimizer step alone, scan-chained with a structurally-dependent
carry (grads derived from the current params) so XLA cannot DCE or cache
iterations — see CLAUDE.md's microbenchmark notes. The pytree is the real
bench-config trainables (ConvVAE latent 32 + GP params, ~1.07M params).

Usage: env PYTHONPATH=.:/root/.axon_site python tools/bench_adam.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lvae_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

STEPS = 200


def real_trainables():
    from bench import build_bench_trainer

    return build_bench_trainer().state.trainables


def bench_opt(name, opt, params, steps=STEPS, reps=5):
    state = opt.init(params)

    def body(carry, i):
        p, s = carry
        grads = jax.tree.map(
            lambda x: x * 1e-3 + i.astype(x.dtype) * 1e-6, p
        )
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), ()

    @jax.jit
    def run(p, s):
        (p, s), _ = jax.lax.scan(body, (p, s), jnp.arange(steps))
        return p, s

    out = run(params, state)  # compile
    jax.block_until_ready(out)
    times = []
    sums = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(*out)
        # host-side scalar read: forces the remote chip to materialise the
        # result (block_until_ready on the future handle is not enough on
        # the relay-backed backend)
        sums.append(float(jnp.sum(jax.tree.leaves(out[0])[0])))
        times.append((time.perf_counter() - t0) / steps)
    us = np.median(times) * 1e6
    per = " ".join(f"{t*1e6:.0f}" for t in times)
    print(f"{name:28s} {us:8.1f} us/step   reps[{per}]  sums[0/-1]={sums[0]:+.3e}/{sums[-1]:+.3e}")
    return us


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices()[0])
    params = real_trainables()
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"trainables: {n/1e6:.2f}M params, {len(jax.tree.leaves(params))} leaves")

    from lvae_tpu.kernels_pallas.adam import fused_adam

    lr = 1e-3
    a = bench_opt("optax.flatten(adam)", optax.flatten(optax.adam(lr)), params)
    b = bench_opt("fused_adam (pallas)", fused_adam(lr), params)
    c = bench_opt("optax.adam (per-leaf)", optax.adam(lr), params)
    print(f"fused vs flatten: {a/b:.2f}x   fused vs per-leaf: {c/b:.2f}x")


if __name__ == "__main__":
    main()
