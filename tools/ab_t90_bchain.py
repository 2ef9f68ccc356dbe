"""A/B the long-T split-fusion B-chain on the real chip.

VERDICT r3 item 6: the fused B-chain's old T<=64 cap silently routed the
longest bucket of exactly the Physionet-like ragged cohorts the bucketing
work targets (hourly 48h+ stays, up to ~90 timepoints) to the XLA chain
with no measurement. This tool measures that routing decision: a ragged
cohort whose long band is T in [80, 91) (longest bucket cap ~90), 2-bucket
epoch, arm `on` = LVAE_BCHAIN_T96=1 (split fusion for the long bucket:
B-inverse Pallas kernel + XLA trace side) vs arm `off` = LVAE_BCHAIN_T96=0 (r3 behaviour: long bucket
falls back to XLA). Fresh process per arm (module switches bake at trace
time). The result decides ``kernels_pallas.b_chain.LONG_T_AUTO_DEFAULT``.

Usage: env PYTHONPATH=.:/root/.axon_site python tools/ab_t90_bchain.py
       [--subjects 200] [--chunk 10] [--timeout 585] [--retries 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t90_cohort(p=200, frac_long=0.15, seed=0, t_long=90):
    """ragged_bucketing.ragged_cohort with the long band pushed to ~t_long
    (90 = the r4 Physionet-like A/B; 128 = the r5 boundary probe,
    VERDICT r4 item 6)."""
    import numpy as np

    from lvae_tpu.data.datasets import ArrayDataset

    rng = np.random.default_rng(seed)
    n_long = int(round(p * frac_long))
    t_lens = np.concatenate([
        rng.integers(4, 13, size=p - n_long),
        rng.integers(t_long - 10, t_long + 1, size=n_long),
    ])
    # force the cap to exactly t_long so the arm label is honest
    t_lens[p - 1] = t_long
    rng.shuffle(t_lens)
    rows = []
    for s, tl in enumerate(t_lens):
        for i in range(tl):
            rows.append([float(i), rng.normal(), float(s), float(s % 2)])
    labels = np.asarray(rows)
    n = len(labels)
    d = 35
    return ArrayDataset(
        data=rng.normal(size=(n, d)).astype(np.float32),
        labels=labels,
        mask=(rng.uniform(size=(n, d)) > 0.5).astype(np.float32),
    ), t_lens


def run_measurement(subjects: int, chunk: int, t_long: int = 90):
    from benchmarks.ragged_bucketing import measure
    from lvae_tpu.kernels_pallas import b_chain as bc
    from lvae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ds, t_lens = t90_cohort(p=subjects, t_long=t_long)
    epoch_s, caps, compile_s, net = measure(2, ds, chunk=chunk)
    print(json.dumps({
        "arm": os.environ.get("LVAE_BCHAIN_T96", "auto"),
        "long_t_active": bc._long_t_active(),
        "bucket_caps": caps,
        "epoch_ms": round(epoch_s * 1e3, 2),
        "compile_s": round(compile_s, 1),
        "net": round(net, 2),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subjects", type=int, default=200)
    ap.add_argument("--t_long", type=int, default=90,
                    help="cap of the long band (90 = r4 A/B, 128 = r5 probe)")
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--timeout", type=int, default=585)
    ap.add_argument("--retries", type=int, default=2)
    ap.add_argument("--arm", default=None, help="internal: run one arm inline")
    args = ap.parse_args()

    if args.arm is not None:
        run_measurement(args.subjects, args.chunk, args.t_long)
        return

    results = {}
    for arm, flag in (("on", "1"), ("off", "0")):
        env = dict(os.environ)
        env["LVAE_BCHAIN_T96"] = flag
        print(f"=== arm {arm} (LVAE_BCHAIN_T96={flag}) ===", flush=True)
        for attempt in range(1, args.retries + 2):
            t0 = time.time()
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--arm", arm, "--subjects", str(args.subjects),
                     "--chunk", str(args.chunk),
                     "--t_long", str(args.t_long)],
                    env=env, timeout=args.timeout, capture_output=True,
                    text=True,
                )
            except subprocess.TimeoutExpired:
                print(f"# {arm}: attempt {attempt} timed out "
                      "(compiles persist; retrying)", file=sys.stderr,
                      flush=True)
                continue
            js = None
            for ln in reversed((out.stdout or "").strip().splitlines()):
                try:
                    js = json.loads(ln)
                    break
                except json.JSONDecodeError:
                    continue
            if out.returncode == 0 and js is not None:
                js["_wall_s"] = round(time.time() - t0, 1)
                results[arm] = js
                print(json.dumps(js), flush=True)
                break
            tail = (out.stderr or "").strip().splitlines()[-3:]
            print(f"# {arm}: attempt {attempt} rc={out.returncode}: "
                  + " | ".join(tail), file=sys.stderr, flush=True)
        else:
            results[arm] = None

    on, off = results.get("on"), results.get("off")
    if on and off:
        print(json.dumps({
            "metric": "t90_bchain_ab",
            "on_epoch_ms": on["epoch_ms"],
            "off_epoch_ms": off["epoch_ms"],
            "speedup_on_vs_off": round(off["epoch_ms"] / on["epoch_ms"], 3),
        }))


if __name__ == "__main__":
    main()
