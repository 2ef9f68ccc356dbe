"""A/B the opt-in fast paths on the real chip, one bench.py run per arm.

Arms: baseline (both off), s2d convs, fused B-chain, both. Each arm runs
``bench.py`` in a subprocess with the corresponding LVAE_S2D/LVAE_BCHAIN env
(module switches are baked at trace time, so a fresh process per arm is the
only clean isolation) and the persistent compile + AOT caches keyed per arm.
Prints a compact table of epoch wall ms / measured device ms and the deltas
vs baseline — the numbers that decide S2D_AUTO_DEFAULT / B_CHAIN_AUTO_DEFAULT
(models/vae.py, ops/kernels.py).

Usage: env PYTHONPATH=.:/root/.axon_site python tools/ab_fastpaths.py
       [--arms baseline,s2d,bchain,both] [--timeout 585] [--retries 2]

A killed/timed-out arm is retried (compiles persist via the caches, the
retry completes — CLAUDE.md chip-latency protocol); after the retry budget
the arm is reported FAILED and the table still prints.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ARMS = {
    "baseline": {"LVAE_S2D": "0", "LVAE_BCHAIN": "0"},
    "s2d": {"LVAE_S2D": "1", "LVAE_BCHAIN": "0"},
    "bchain": {"LVAE_S2D": "0", "LVAE_BCHAIN": "1"},
    "both": {"LVAE_S2D": "1", "LVAE_BCHAIN": "1"},
    # measured defaults (bchain auto-on for TPU), no overrides — the control
    # for numerics-changing arms like bf16
    "default": {},
    # bfloat16 VAE compute (params stay f32, GP algebra stays f32 — the
    # encodings upcast before the GP posterior): the conv stack dominates the
    # measured epoch, so this is the one untested dtype lever
    "bf16": {"BENCH_MODEL_DTYPE": "bfloat16"},
    # stacked K0zz+H factorisation OFF (ops/elbo.use_stacked_mm_chol):
    # isolates the one-fewer-custom-call effect vs the "default" arm
    "nostack": {"LVAE_STACK_CHOL": "0"},
    # epoch pre-gather (train/hensman.use_epoch_pregather): whole-table takes
    # once per epoch + scan-xs slices, replacing 3 per-step gathers + the
    # NHWC layout copies (~12 ms of the 329 ms r3 chunk trace)
    "pregather": {"LVAE_PREGATHER": "1"},
    "nopregather": {"LVAE_PREGATHER": "0"},
    # batch-major B⁻¹ emit (kernels_pallas/b_chain.use_batch_major_out):
    # the lane→sublane transpose moves into VMEM, deleting the XLA boundary
    # relayouts of the lanes-major stack (~8.5 ms of the 329 ms r3 chunk)
    "bm": {"LVAE_BCHAIN_BM": "1"},
    "nobm": {"LVAE_BCHAIN_BM": "0"},
    # flat-view minibatch gather (train/hensman.use_flat_gather): 2-D
    # row-contiguous table view, flattened once per dispatch — the r4
    # P=1000 layout fix (shape-keyed default: ≥10k-row tables)
    "fg": {"LVAE_FLATGATHER": "1"},
    "nofg": {"LVAE_FLATGATHER": "0"},
    # long-T split-fusion B-chain (kernels_pallas/b_chain, 64<T<=96):
    # only bites on bucketed ragged cohorts — pair with
    # tools/ab_t90_bchain.py for the dedicated workload
    "t96": {"LVAE_BCHAIN_T96": "1"},
    "not96": {"LVAE_BCHAIN_T96": "0"},
    # reshape+max 2x2 pooling (models/vae.use_reshape_max_pool): kills the
    # select-and-scatter backward (8.3 % of the P=1000/bf16 device budget,
    # tools/device_budget.py) at the cost of 2.3x pool-backward HBM traffic
    # (r3's P=200 negative) — re-measured at the scale where the budget says
    # it could flip
    "rpool": {"LVAE_RESHAPE_POOL": "1"},
    "norpool": {"LVAE_RESHAPE_POOL": "0"},
    # bf16 frame-table storage (train/hensman.use_bf16_table): pre-quantize
    # the frame/pixmask tables to the bf16 the compute model casts to
    # anyway — halves the per-step gather bytes (P=1000 budget's top HBM
    # class). Only bites where the model computes bf16 (P=1000 auto).
    "tbl16": {"LVAE_TABLE_BF16": "1"},
    "notbl16": {"LVAE_TABLE_BF16": "0"},
}


def run_arm(name: str, env_over: dict, timeout: int, retries: int):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update(env_over)
    env["BENCH_SKIP_TORCH"] = "1"  # the torch CPU leg is arm-invariant
    for attempt in range(1, retries + 2):
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(root, "bench.py")],
                env=env, timeout=timeout, capture_output=True, text=True,
                cwd=root,
            )
        except subprocess.TimeoutExpired:
            print(f"# {name}: attempt {attempt} timed out after {timeout}s "
                  "(compiles persist; retrying)", file=sys.stderr, flush=True)
            continue
        line = (out.stdout or "").strip().splitlines()
        js = None
        for ln in reversed(line):
            try:
                js = json.loads(ln)
                break
            except json.JSONDecodeError:
                continue
        if out.returncode == 0 and js is not None:
            if js.get("extra", {}).get("stale"):
                print(f"# {name}: stale re-emission, not a fresh run — "
                      "treating as failure", file=sys.stderr, flush=True)
                continue
            js["_wall_s"] = round(time.time() - t0, 1)
            return js
        tail = (out.stderr or "").strip().splitlines()[-3:]
        print(f"# {name}: attempt {attempt} rc={out.returncode}: "
              + " | ".join(tail), file=sys.stderr, flush=True)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="baseline,s2d,bchain,both")
    ap.add_argument("--timeout", type=int, default=585)
    ap.add_argument("--retries", type=int, default=2)
    args = ap.parse_args()

    results = {}
    for name in args.arms.split(","):
        name = name.strip()
        if name not in ARMS:
            sys.exit(f"unknown arm {name!r}; choose from {sorted(ARMS)}")
        print(f"=== arm {name} {ARMS[name]} ===", flush=True)
        results[name] = run_arm(name, ARMS[name], args.timeout, args.retries)
        if results[name]:
            print(json.dumps(results[name]), flush=True)

    base = results.get("baseline") or {}
    base_ms = base.get("value")
    base_dev = (base.get("extra") or {}).get("measured_device_ms_per_epoch")
    print("\narm        wall_ms  device_ms  vs_base(wall)  vs_base(device)")
    for name, js in results.items():
        if js is None:
            print(f"{name:<10} FAILED")
            continue
        ms = js.get("value")
        dev = (js.get("extra") or {}).get("measured_device_ms_per_epoch")
        rw = f"{base_ms / ms:.2f}x" if base_ms and ms else "-"
        rd = f"{base_dev / dev:.2f}x" if base_dev and dev else "-"
        print(f"{name:<10} {ms!s:<8} {dev!s:<10} {rw:<14} {rd}")


if __name__ == "__main__":
    main()
