"""Benchmark: Hensman SVI epoch time on the paper-scale Health MNIST config.

Workload (config/LVAE_config_sample.txt:19-35 in the reference): P=200
subjects x T=20 timepoints of 36x36 images, latent_dim=32, M=60 inducing
points, subjects_per_batch=20 (10 batches/epoch), ConvVAE + additive GP prior
(cat id + sqexp age + age-id interaction), natural gradients.

Prints ONE JSON line: epoch time of the jitted lvae_tpu trainer on the
available accelerator, with ``vs_baseline`` = (epoch time of a
torch-CPU implementation of the same math, mirroring the reference's
eager per-batch pipeline) / (ours). The torch baseline is measured on a
subset of batches and extrapolated (it is slow); set BENCH_SKIP_TORCH=1 to
skip it and report vs_baseline=1.0.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent compilation cache: repeated bench runs skip recompiles
from lvae_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

P, T, LATENT, M_IND, SPB = 200, 20, 32, 60, 20
IMG = 36
EPOCHS_TIMED = 4

# Poster-scale entry (VERDICT r3 item 1): the paper's actual cohort is 1000
# individuals (Health_MNIST_generate.py:89-93 / images/poster_L-VAE.png).
# subjects_per_batch=100 is the measured throughput knee from the r5 on-chip
# re-sweep under the shipped defaults (bf16 auto + factored B-chain VJP;
# tools/p1000_sweep.py: 55.8/44.4/42.4/47.5 ms/epoch at spb 25/50/100/200 —
# the r4 knee was 50 under f32; table in benchmarks/README.md).
P1000 = 1000
P1000_SPB = int(os.environ.get("BENCH_P1000_SPB", "100"))


def synth_cohort(seed=0, n_subjects=P):
    rng = np.random.default_rng(seed)
    n = n_subjects * T
    labels = np.stack(
        [
            np.tile(np.arange(T), n_subjects).astype(float),  # time_age
            np.repeat(rng.normal(size=n_subjects), T),  # disease_time
            np.repeat(np.arange(n_subjects), T).astype(float),  # subject
            np.repeat(rng.integers(0, 2, n_subjects), T).astype(float),  # gender
            np.repeat(rng.integers(0, 2, n_subjects), T).astype(float),  # disease
            np.repeat(rng.integers(0, 2, n_subjects), T).astype(float),  # location
        ],
        axis=1,
    )
    data = rng.uniform(size=(n, IMG, IMG, 1)).astype(np.float32)
    mask = (rng.uniform(size=(n, IMG * IMG)) > 0.25).astype(np.float32)
    return data, labels, mask


KERNEL_KW = dict(
    cat_kernel=[2],
    sqexp_kernel=[0],
    cat_int_kernel=[{"cont_covariate": 0, "cat_covariate": 2}],
)


def build_bench_trainer(n_subjects=P, spb=SPB):
    """The flagship benchmark workload — single source for bench_jax,
    tools/measure_roofline.py and tools/bench_adam.py (they must measure
    the SAME program the benchmark reports). ``n_subjects``/``spb``
    parameterize the poster-scale (P=1000) entry on the same program."""
    import jax.numpy as jnp

    from lvae_tpu.data.blocks import build_subject_blocks
    from lvae_tpu.data.datasets import ArrayDataset
    from lvae_tpu.models.vae import ConvVAE
    from lvae_tpu.ops import kernels as kx
    from lvae_tpu.train import state as st
    from lvae_tpu.train.hensman import HensmanConfig, HensmanTrainer

    data, labels, mask = synth_cohort(n_subjects=n_subjects)
    ds = ArrayDataset(data=data, labels=labels, mask=mask)
    blocks = build_subject_blocks(labels, id_covariate=2)
    spec0, spec1 = kx.split_kernel_spec(id_covariate=2, **KERNEL_KW)
    cfg = HensmanConfig(
        spec0=spec0, spec1=spec1, latent_dim=LATENT, P_tot=n_subjects,
        N_tot=n_subjects * T,
        weight=0.15, loss_function="mse", natural_gradient=True,
        natural_gradient_lr=0.01, constrain_scales=True, eps=1e-5,
        dropout=False,
    )
    # dtype of record = the SHIPPED default (models/vae.auto_model_dtype:
    # scale-gated bf16 — f32 at P=200's 4k rows, bf16 at P=1000's 20k;
    # VERDICT r4 item 2). BENCH_MODEL_DTYPE pins either way for A/B.
    from lvae_tpu.models.vae import auto_model_dtype

    env_dt = os.environ.get("BENCH_MODEL_DTYPE")
    model_dtype = (
        jnp.bfloat16 if env_dt == "bfloat16"
        else jnp.float32 if env_dt
        else auto_model_dtype(n_subjects * T)
    )
    model = ConvVAE(latent_dim=LATENT, num_dim=IMG * IMG, p=0.0, dtype=model_dtype)
    z = st.init_inducing_points(labels, M_IND, seed=0)
    return HensmanTrainer(model, cfg, ds, blocks, z, subjects_per_batch=spb)


def _cache_layer(xla_dir_was_warm):
    """Self-describing record of which cold-start layer served this run
    (VERDICT r3 item 2): 'aot' = the serialized executable deserialized
    (sub-second); 'xla' = AOT missed but the persistent XLA compile cache
    had entries (pay trace+lower, skip backend compile); 'cold' = both
    layers empty."""
    from lvae_tpu.utils import aot_cache

    if aot_cache.last_event == "hit":
        return "aot"
    return "xla" if xla_dir_was_warm else "cold"


def bench_jax(n_subjects=P, spb=SPB, epochs_timed=EPOCHS_TIMED):
    import jax

    from lvae_tpu.utils.compile_cache import DEFAULT_CACHE

    xla_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_CACHE)
    try:
        xla_dir_was_warm = any(
            name.endswith("-cache") for name in os.listdir(xla_dir)
        )
    except OSError:
        xla_dir_was_warm = False

    # backend/relay initialization is NOT part of the framework's cold
    # start: touch the device with a trivial op first so executable_ready_s
    # times the AOT deserialize, not the first contact with the remote
    # relay (observed: the same aot-hit load 0.5 s .. 370 s depending on
    # which call paid the relay warmup).
    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(lambda x: x + 1)(0.0))
    # sacrificial tiny serialize/deserialize round-trip: rules OUT
    # per-process API init as the source of slow first loads. Measured: it
    # does NOT absorb the slow leg — the identical large-executable
    # aot-hit deserialize ran 2.6 s and 115 s on the same day with this
    # warm in place, so the variance is server-side per-executable relay
    # weather, which executable_ready_s records honestly (the backend_init
    # split proves the client side was warm).
    try:
        from jax.experimental import serialize_executable as se

        tiny = jax.jit(lambda x: x * 2.0).lower(0.0).compile()
        payload, in_tree, out_tree = se.serialize(tiny)
        se.deserialize_and_load(payload, in_tree, out_tree)
    except Exception as e:  # noqa: BLE001
        print(f"# deserialize warm skipped: {e}", file=sys.stderr)
    backend_init_s = time.perf_counter() - t0

    trainer = build_bench_trainer(n_subjects=n_subjects, spb=spb)

    # training cadence: chunks of 25 epochs per dispatch (pipeline default)
    chunk = 25
    # split the cold start into its two legs: (1) executable acquisition —
    # AOT-cache deserialize (~0.5 s warm) or trace+compile (~66 s + backend
    # compile) — and (2) the first chunk dispatch, which on the remote-
    # attached chip includes the executable upload + data transfers and is
    # WILDLY variable server-side (observed 2 s .. 400 s for the identical
    # program+artifact); compile_s = their sum for continuity with r1/r2.
    t0 = time.perf_counter()
    trainer._executable_for(chunk)
    executable_ready_s = time.perf_counter() - t0
    cache_layer = _cache_layer(xla_dir_was_warm)
    t0 = time.perf_counter()
    trainer.run_epochs(chunk)
    first_dispatch_s = time.perf_counter() - t0
    compile_s = executable_ready_s + first_dispatch_s

    # synced schedule: one relay round trip per chunk (what the full
    # pipeline pays — its per-chunk callback needs a state-current trainer)
    times = []
    for _ in range(epochs_timed):
        t0 = time.perf_counter()
        ms = trainer.run_epochs(chunk)  # floats the metrics => synced
        times.append((time.perf_counter() - t0) / chunk)
    m = ms[-1]
    assert np.isfinite(m.net), m
    sync_epoch_s = float(np.median(times))

    # overlapped schedule — trainer.fit's DEFAULT for callback-free training
    # (train/hensman.use_overlapped_fit): chunk k+1 dispatches before chunk
    # k's metrics are read, hiding the remote-execute round trip behind
    # device time (measured probe: tools/overlap_probe.py). Timed as whole
    # K-chunk blocks because the lag shifts work between iterations.
    ov_times = []
    for _ in range(2):
        t0 = time.perf_counter()
        pending = None
        for _ in range(epochs_timed):
            ms_dev = trainer._dispatch_epochs(chunk)
            if pending is not None:
                trainer._materialize_metrics(pending, chunk)
            pending = ms_dev
        last = trainer._materialize_metrics(pending, chunk)
        ov_times.append(
            (time.perf_counter() - t0) / (epochs_timed * chunk)
        )
    assert np.isfinite(last[-1].net), last[-1]
    overlap_epoch_s = float(np.median(ov_times))
    # headline = the default training-loop schedule; the synced number is
    # reported alongside for continuity with r1/r2 and for pipeline users
    epoch_s = overlap_epoch_s

    kind = jax.devices()[0].device_kind
    # TPU v5e: 197 TFLOP/s bf16 / ~98 TFLOP/s f32 MXU, 819 GB/s HBM
    peak_flops = 197e12 if "v5" in kind else 275e12
    hbm_bw = 819e9 if "v5" in kind else 1200e9

    # ---- roofline accounting: XLA's cost model for the compiled program.
    # HloCostAnalysis counts each while/scan BODY once (verified: 'flops' is
    # identical for 1-, 5- and 25-epoch chunks), so the reported number is
    # one batch step (+ small setup); an epoch is n_batches executions.
    roofline = {"device_kind": kind}
    try:
        try:
            # the executable already in hand (possibly AOT-deserialized)
            # answers cost_analysis too — avoid re-paying the ~66 s
            # trace+lower just for the cost model
            ca = trainer._executable_for(chunk).cost_analysis()
        except Exception:  # noqa: BLE001 — deserialized wrapper may refuse
            comp = trainer.epochs_fn.lower(
                trainer.state, trainer.tdata, chunk
            ).compile()
            ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        n_batches = n_subjects // spb
        flops_epoch = float(ca.get("flops", 0.0)) * n_batches
        bytes_epoch = float(ca.get("bytes accessed", 0.0)) * n_batches
        ach = flops_epoch / epoch_s
        roofline.update({
            "flops_per_epoch_G": round(flops_epoch / 1e9, 2),
            "achieved_tflops": round(ach / 1e12, 3),
            "mfu_pct_bf16_peak": round(100 * ach / peak_flops, 2),
            # HloCostAnalysis 'bytes accessed' sums every op's operand+output
            # bytes AS IF nothing fused — intermediates that live and die in
            # registers/VMEM inside a fusion are counted as HBM trips they
            # never take. It is an unfused upper bound, NOT traffic, so no
            # utilization percentage is derived from it (r2/r3 derived one
            # and got 131-179% "of peak"); real traffic is the measured_*
            # fields below from hardware counters. Reconciliation paragraph:
            # benchmarks/README.md "Modeled vs measured bytes".
            "cost_model_unfused_bytes_per_epoch_G": round(bytes_epoch / 1e9, 2),
        })
    except Exception as e:  # noqa: BLE001
        print(f"# cost analysis unavailable: {e}", file=sys.stderr)

    # ---- MEASURED roofline: profile one chunk dispatch and read the real
    # per-program device time / HBM bytes / FLOPs from the TPU trace
    # (xprof op_profile; VERDICT r2 item 2 — the modeled bytes exceeded the
    # physical peak, so the bound-ness narrative must rest on measurement).
    try:
        import glob
        import json as _json
        import tempfile

        logdir = tempfile.mkdtemp(prefix="lvae_bench_prof_")
        with jax.profiler.trace(logdir):
            trainer.run_epochs(chunk)
        from xprof.convert import raw_to_tool_data as rtd

        xp = glob.glob(logdir + "/plugins/profile/*/*.xplane.pb")
        data, _ = rtd.xspace_to_tool_data(xp, "op_profile", {})
        prof = _json.loads(data)
        progs = [
            c for c in prof["byProgram"].get("children", [])
            if c["name"].startswith("jit_")
        ]
        mt = max(progs, key=lambda c: c["metrics"].get("rawTime", 0))["metrics"]
        dev_s = mt["rawTime"] / 1e12  # ps → s, device-busy time of the chunk
        hbm_bytes = float(mt["rawBytesAccessedArray"][0])
        flops = float(mt.get("rawFlops", 0.0))
        roofline.update({
            "measured_device_ms_per_epoch": round(dev_s / chunk * 1e3, 3),
            "measured_hbm_bytes_per_epoch_G": round(hbm_bytes / chunk / 1e9, 3),
            "measured_hbm_util_pct": round(100 * (hbm_bytes / dev_s) / hbm_bw, 1),
            "measured_mfu_pct_bf16_peak": round(
                100 * (flops / dev_s) / peak_flops, 2
            ),
            # xprof's own utilization fractions (its v5e hardware model)
            "xprof_flops_util_pct": round(100 * float(mt.get("flops", 0.0)), 2),
            "xprof_hbm_bw_util_pct": round(
                100 * float(mt.get("bandwidthUtils", [0.0])[0]), 1
            ),
        })
    except Exception as e:  # noqa: BLE001
        print(f"# measured roofline unavailable: {e}", file=sys.stderr)
    roofline["model_dtype"] = str(trainer.model.dtype.__name__ if hasattr(
        trainer.model.dtype, "__name__") else trainer.model.dtype)
    roofline["backend_init_s"] = round(backend_init_s, 2)
    roofline["executable_ready_s"] = round(executable_ready_s, 2)
    roofline["first_dispatch_s"] = round(first_dispatch_s, 2)
    roofline["cache_layer"] = cache_layer
    roofline["schedule"] = "overlapped fit (default; LVAE_OVERLAP)"
    roofline["sync_wall_ms_per_epoch"] = round(sync_epoch_s * 1e3, 2)
    roofline["overlap_wall_ms_per_epoch"] = round(overlap_epoch_s * 1e3, 2)
    roofline["samples_per_s"] = round(n_subjects * T / epoch_s)
    return epoch_s, compile_s, m, roofline


def bench_torch_baseline(max_batches=3):
    """Reference-equivalent epoch on torch CPU: eager per-batch ConvVAE
    fwd/bwd + the A-F minibatch KLD with batched cholesky (the same math the
    reference runs via GPyTorch; implemented directly with torch.linalg)."""
    import torch
    import torch.nn.functional as F

    torch.manual_seed(0)
    dtype = torch.double  # the reference runs fully in double (LVAE.py:140)
    data, labels, mask = synth_cohort()
    n = P * T
    x_all = torch.tensor(data.reshape(n, 1, IMG, IMG), dtype=dtype)
    lab_all = torch.tensor(labels, dtype=dtype)
    msk_all = torch.tensor(mask, dtype=dtype)

    class TorchConvVAE(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(1, 16, 3, padding=1)
            self.conv2 = torch.nn.Conv2d(16, 32, 3, padding=1)
            self.fc1 = torch.nn.Linear(32 * 9 * 9, 300)
            self.fc21 = torch.nn.Linear(300, 30)
            self.fc211 = torch.nn.Linear(30, LATENT)
            self.fc221 = torch.nn.Linear(30, LATENT)
            self.fc3 = torch.nn.Linear(LATENT, 30)
            self.fc31 = torch.nn.Linear(30, 300)
            self.fc4 = torch.nn.Linear(300, 32 * 9 * 9)
            self.dc1 = torch.nn.ConvTranspose2d(32, 16, 4, 2, 1)
            self.dc2 = torch.nn.ConvTranspose2d(16, 1, 4, 2, 1)

        def forward(self, x):
            h = F.max_pool2d(F.relu(self.conv1(x)), 2)
            h = F.max_pool2d(F.relu(self.conv2(h)), 2)
            h = h.reshape(x.shape[0], -1)
            h = F.relu(self.fc21(F.relu(self.fc1(h))))
            mu, lv = self.fc211(h), self.fc221(h)
            zs = mu + torch.randn_like(mu) * torch.exp(0.5 * lv)
            d = F.relu(self.fc4(F.relu(self.fc31(F.relu(self.fc3(zs))))))
            d = d.reshape(-1, 32, 9, 9)
            recon = torch.sigmoid(self.dc2(F.relu(self.dc1(d))))
            return recon, mu, lv

    model = TorchConvVAE().double()
    # GP hyperparams: scale/lengthscale per latent dim, same structure as ours
    s_id = torch.full((LATENT,), 0.693, dtype=dtype, requires_grad=True)
    s_rbf = torch.full((LATENT,), 0.693, dtype=dtype, requires_grad=True)
    s_int = torch.full((LATENT,), 0.693, dtype=dtype, requires_grad=True)
    ls_rbf = torch.full((LATENT,), 2.5, dtype=dtype, requires_grad=True)
    ls_int = torch.full((LATENT,), 2.5, dtype=dtype, requires_grad=True)
    m_var = torch.randn(LATENT, M_IND, 1, dtype=dtype)
    h0 = torch.randn(LATENT, M_IND, M_IND, dtype=dtype) / 10
    h_var = h0 @ h0.transpose(-1, -2) + 0.1 * torch.eye(M_IND, dtype=dtype)
    z_ind = lab_all[np.random.default_rng(0).choice(n, M_IND, replace=False)]
    opt = torch.optim.Adam(
        list(model.parameters()) + [s_id, s_rbf, s_int, ls_rbf, ls_int], lr=1e-3
    )

    def kernels(a, b):
        d_age = a[:, None, 0] - b[None, :, 0]
        same_id = (a[:, None, 2] == b[None, :, 2]).to(dtype)[None]
        k0m = s_rbf[:, None, None] * torch.exp(
            -(d_age**2)[None] / (2 * ls_rbf[:, None, None] ** 2)
        )
        k1m = s_id[:, None, None] * same_id + s_int[:, None, None] * same_id * torch.exp(
            -(d_age**2)[None] / (2 * ls_int[:, None, None] ** 2)
        )
        return k0m, k1m

    n_batches = P // SPB
    subj_order = np.random.default_rng(0).permutation(P)
    times = []
    for b in range(min(max_batches, n_batches)):
        t0 = time.perf_counter()
        subs = subj_order[b * SPB : (b + 1) * SPB]
        rows = np.concatenate([np.arange(s * T, (s + 1) * T) for s in subs])
        x = x_all[rows]
        lab = lab_all[rows]
        mk = msk_all[rows]
        opt.zero_grad()
        recon, mu, lv = model(x)
        se = ((recon.reshape(-1, IMG * IMG) - x.reshape(-1, IMG * IMG)) ** 2) * mk
        recon_loss = (se.sum(1) / mk.sum(1).clamp(min=1)).sum() * (P / SPB)

        k0xz, _ = kernels(lab, z_ind)
        k0zz, _ = kernels(z_ind, z_ind)
        k0zz = k0zz + 1e-5 * torch.eye(M_IND, dtype=dtype)
        xb = lab.reshape(SPB, T, -1)
        k0_st = torch.stack(
            [kernels(xb[p_], xb[p_])[0] for p_ in range(SPB)], dim=1
        )
        b_st = torch.stack(
            [kernels(xb[p_], xb[p_])[1] for p_ in range(SPB)], dim=1
        ) + torch.eye(T, dtype=dtype)
        lk = torch.linalg.cholesky(k0zz)
        ik0zz = torch.cholesky_solve(torch.eye(M_IND, dtype=dtype), lk)
        lb = torch.linalg.cholesky(b_st)
        ib = torch.cholesky_solve(
            torch.eye(T, dtype=dtype).expand_as(b_st), lb
        )
        k0xz_st = k0xz.reshape(LATENT, SPB, T, M_IND)
        ib_k0xz = ib @ k0xz_st
        k0zx_ib_k0xz = torch.einsum("lptm,lptn->lmn", k0xz_st, ib_k0xz)
        lh = torch.linalg.cholesky(h_var)
        r = torch.einsum("lnm,lmo->ln", k0xz, ik0zz @ m_var) - mu.T
        r = r.reshape(LATENT, SPB, T)
        a_t = torch.einsum("lpt,lptu,lpu->", r, ib, r)
        b_t = (torch.diagonal(ib, dim1=-2, dim2=-1).reshape(LATENT, -1) * torch.exp(lv.T)).sum()
        c_t = 2 * torch.log(torch.diagonal(lb, dim1=-2, dim2=-1)).sum()
        d_t = (ib * k0_st).sum() - (k0zx_ib_k0xz * ik0zz).sum()
        e_mid = ik0zz @ h_var @ ik0zz
        e_t = (e_mid.transpose(-1, -2) * k0zx_ib_k0xz).sum()
        f_t = lv.sum()
        # kld_qu_pu block (elbo_functions.py:196-203) — the reference does
        # this per step too; omitting it would deflate the baseline
        tr1 = (ik0zz * h_var.transpose(-1, -2)).sum()
        qf1 = (m_var * (ik0zz @ m_var)).sum()
        logdet_k = 2 * torch.log(torch.diagonal(lk, dim1=-1, dim2=-2)).sum()
        logdet_h = 2 * torch.log(torch.diagonal(lh, dim1=-1, dim2=-2)).sum()
        kld_qu_pu = 0.5 * (
            tr1 + qf1 - LATENT * M_IND + logdet_k - logdet_h
        )
        kld = (
            (P / SPB) * 0.5 * (a_t + b_t + c_t + d_t + e_t - f_t)
            + kld_qu_pu - LATENT * P * T / 2
        )
        net = recon_loss + 0.15 * kld / LATENT
        net.backward()
        opt.step()
        times.append(time.perf_counter() - t0)
    # natural-gradient m/H update cost intentionally omitted (favours torch)
    return float(np.sum(times) / len(times) * n_batches)


def _probe_devices(attempt_timeout=150, max_wait=1500):
    """Fail fast instead of hanging forever when the remote TPU relay is
    wedged (observed: device enumeration hangs indefinitely for hours).
    Enumerate devices in a KILLABLE subprocess — killing a hung enumeration
    is safe, it never reaches the compile service — retrying until the relay
    answers or the budget runs out, then abort with a diagnostic instead of
    wedging the caller. BENCH_NO_PROBE=1 skips."""
    import subprocess

    if os.environ.get("BENCH_NO_PROBE"):
        return
    deadline = time.monotonic() + max_wait
    attempt = 0
    child_errors = 0
    while True:
        attempt += 1
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].device_kind)"],
                timeout=attempt_timeout, capture_output=True, text=True,
            )
            if out.returncode == 0:
                if attempt > 1:
                    print(
                        f"# device relay answered on attempt {attempt}",
                        file=sys.stderr,
                    )
                return
            lines = (out.stderr or "").strip().splitlines()
            err = lines[-1] if lines else f"rc={out.returncode}"
            # a child that EXITS (vs hangs) is a local error (bad env,
            # missing plugin), not a wedged relay: don't burn the budget
            # retrying a deterministic failure, and don't mask it with a
            # stale re-emission
            child_errors += 1
            if child_errors >= 3:
                print(
                    f"# bench aborted: device probe child failed {child_errors}x "
                    f"({err}) — local misconfiguration, not a relay outage",
                    file=sys.stderr,
                )
                sys.exit(1)
        except subprocess.TimeoutExpired:
            err = f"device enumeration hang >{attempt_timeout}s (relay wedged?)"
        if time.monotonic() >= deadline:
            print(
                f"# bench aborted: device probe failed after {attempt} "
                f"attempts over {max_wait}s ({err})",
                file=sys.stderr,
            )
            _emit_stale_or_die(err)
        print(
            f"# device probe attempt {attempt} failed ({err}); retrying",
            file=sys.stderr,
        )
        time.sleep(30)


_LAST_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_last.json")


def _bench_digest():
    """Identity of the measurement: package sources + THIS script's source +
    the BENCH_* env knobs that change the workload. A stale re-emission is
    only honest if all three match the run that produced it."""
    import hashlib

    from lvae_tpu.utils.aot_cache import _package_digest

    h = hashlib.sha256(_package_digest().encode())
    with open(os.path.abspath(__file__), "rb") as f:
        h.update(f.read())
    env = sorted(
        (k, v) for k, v in os.environ.items()
        if (k.startswith("BENCH_") and k != "BENCH_NO_PROBE")
        or k in (  # module switches
            "LVAE_OPT", "LVAE_S2D", "LVAE_BCHAIN", "LVAE_BCHAIN_BM",
            "LVAE_BCHAIN_T96", "LVAE_STACK_CHOL", "LVAE_PREGATHER",
            "LVAE_FLATGATHER", "LVAE_OVERLAP", "LVAE_MODEL_BF16",
            "LVAE_RESHAPE_POOL", "LVAE_BCHAIN_TMAX", "LVAE_TABLE_BF16",
        )
    )
    h.update(repr(env).encode())
    return h.hexdigest()


def _emit_stale_or_die(reason):
    """When the relay is unreachable, re-emit the last successful result —
    but ONLY if it measured a byte-identical workload (same package + bench
    source + BENCH_* env digest), i.e. it is a genuine earlier measurement
    of exactly this program. Marked ``stale`` with the failure reason;
    anything else exits 1 with no JSON."""
    try:
        with open(_LAST_PATH) as f:
            rec = json.load(f)
        if rec.get("digest") == _bench_digest():
            obj = rec["result"]
            obj.setdefault("extra", {})["stale"] = (
                f"re-emitted from an earlier run of identical sources; "
                f"fresh run impossible: {reason}"
            )
            print(json.dumps(obj))
            sys.exit(0)
        print("# stale fallback refused: sources changed since last run",
              file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"# no stale fallback available: {e}", file=sys.stderr)
    sys.exit(1)


def _save_last(obj):
    try:
        with open(_LAST_PATH, "w") as f:
            json.dump({"digest": _bench_digest(), "result": obj}, f)
    except Exception as e:  # noqa: BLE001
        print(f"# could not persist bench result: {e}", file=sys.stderr)


_PINNED_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "benchmarks", "torch_baseline_pinned.json",
)


def _pinned_baseline():
    """The torch-CPU baseline of record: measured ONCE on an idle host and
    checked in with provenance (benchmarks/torch_baseline_pinned.json), per
    VERDICT r3 item 4 — a 1-core host re-measuring the baseline inside every
    (contended) bench run produced numbers STATUS had to disown. In-run
    re-measurement survives only as a cross-check that warns on >20 %
    deviation."""
    try:
        with open(_PINNED_PATH) as f:
            return json.load(f)
    except Exception as e:  # noqa: BLE001
        print(f"# no pinned torch baseline: {e}", file=sys.stderr)
        return None


def main():
    _probe_devices()
    jax_epoch_s, compile_s, metrics, roofline = bench_jax()

    pinned = _pinned_baseline()
    if os.environ.get("BENCH_SKIP_TORCH"):
        torch_epoch_s = None
    else:
        try:
            torch_epoch_s = bench_torch_baseline()
        except Exception as e:  # noqa: BLE001
            print(f"# torch baseline failed: {e}", file=sys.stderr)
            torch_epoch_s = None
    baseline_extra = {}
    if pinned is not None:
        base_ms = float(pinned["torch_cpu_epoch_ms"])
        baseline_extra["torch_cpu_epoch_ms"] = base_ms
        baseline_extra["baseline_provenance"] = (
            f"pinned {pinned.get('date')} ({pinned.get('conditions')})"
        )
        if torch_epoch_s is not None:
            dev = abs(torch_epoch_s * 1e3 - base_ms) / base_ms
            baseline_extra["torch_cpu_epoch_ms_crosscheck"] = round(
                torch_epoch_s * 1e3, 1
            )
            if dev > 0.20:
                print(
                    f"# WARNING: in-run torch baseline deviates "
                    f"{100 * dev:.0f}% from the pinned record "
                    f"({torch_epoch_s * 1e3:.0f} vs {base_ms:.0f} ms) — "
                    f"host contention or a real shift; re-pin on an idle "
                    f"host if the latter",
                    file=sys.stderr,
                )
                baseline_extra["baseline_crosscheck_deviation_pct"] = round(
                    100 * dev, 1
                )
    else:
        base_ms = torch_epoch_s * 1e3 if torch_epoch_s else None
        baseline_extra["torch_cpu_epoch_ms"] = (
            round(base_ms, 1) if base_ms else None
        )
        baseline_extra["baseline_provenance"] = "measured in-run (no pin)"
    vs = (base_ms / (jax_epoch_s * 1e3)) if base_ms else 1.0

    extra = {
        "compile_s": round(compile_s, 1),
        **baseline_extra,
        "net_loss": round(float(metrics.net), 2),
        **roofline,
    }

    # Poster-scale entry (VERDICT r3 item 1 / r4 item 7): the paper's
    # 1000-individual cohort, measured with the same xprof counters as the
    # P=200 entry and promoted to a FIRST-CLASS metric in the top-level
    # ``metrics`` array (it rode inside extra.p1000 in r4 — any consumer
    # reading metric/value saw only the toy cohort). The legacy top-level
    # metric/value/unit keys keep the driver contract (one JSON line,
    # P=200 headline for cross-round continuity); extra.p1000 stays as an
    # alias of the metrics[1] entry for r1-r4 tooling.
    p1000_entry = None
    if not os.environ.get("BENCH_SKIP_P1000"):
        try:
            p_epoch_s, p_compile_s, p_metrics, p_roof = bench_jax(
                n_subjects=P1000, spb=P1000_SPB, epochs_timed=2
            )
            assert np.isfinite(float(p_metrics.net))
            p1000_entry = {
                "metric": "hensman_epoch_time_healthmnist_P1000_T20_L32",
                "value": round(p_epoch_s * 1e3, 2),
                "unit": "ms",
                "epoch_ms": round(p_epoch_s * 1e3, 2),
                "subjects_per_batch": P1000_SPB,
                "compile_s": round(p_compile_s, 1),
                **p_roof,
            }
            extra["p1000"] = p1000_entry
        except Exception as e:  # noqa: BLE001
            print(f"# p1000 entry failed: {e}", file=sys.stderr)

    obj = {
        "metric": "hensman_epoch_time_healthmnist_P200_T20_L32",
        "value": round(jax_epoch_s * 1000, 2),
        "unit": "ms",
        "vs_baseline": round(vs, 2),
        "extra": extra,
        "metrics": [
            {
                "metric": "hensman_epoch_time_healthmnist_P200_T20_L32",
                "value": round(jax_epoch_s * 1000, 2),
                "unit": "ms",
                "vs_baseline": round(vs, 2),
                "samples_per_s": extra.get("samples_per_s"),
            },
        ],
    }
    if p1000_entry is not None:
        obj["metrics"].append(p1000_entry)
    _save_last(obj)
    print(json.dumps(obj))


if __name__ == "__main__":
    main()
