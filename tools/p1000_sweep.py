"""Sweep subjects_per_batch for the poster-scale P=1000 Hensman epoch.

VERDICT r3 item 1: the paper's cohort is 1000 individuals
(Health_MNIST_generate.py:89-93 / images/poster_L-VAE.png); the r3 bench
only measured the P=200 sample config. This sweep finds the throughput knee
that bench.py's P=1000 entry runs at (BENCH_P1000_SPB / bench.P1000_SPB).

Per arm: the exact bench workload (bench.build_bench_trainer with
n_subjects=1000) timed on the overlapped schedule, one 25-epoch chunk
dispatch cadence. Larger SPB = fewer, bigger steps per epoch — better
per-op amortization but fewer optimizer updates; the knee is where
samples/s stops improving (the training cadence itself is accuracy-neutral
here, bench measures throughput).

Usage: env PYTHONPATH=.:/root/.axon_site python tools/p1000_sweep.py
       [--spbs 20,50,100,200] [--epochs 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lvae_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def measure(spb: int, epochs: int):
    import bench

    trainer = bench.build_bench_trainer(n_subjects=bench.P1000, spb=spb)
    chunk = 25
    t0 = time.perf_counter()
    trainer._executable_for(chunk)
    ready_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    trainer.run_epochs(chunk)  # first dispatch (upload + warmup)
    first_s = time.perf_counter() - t0

    n_chunks = max(2, epochs // chunk)
    t0 = time.perf_counter()
    pending = None
    for _ in range(n_chunks):
        ms_dev = trainer._dispatch_epochs(chunk)
        if pending is not None:
            trainer._materialize_metrics(pending, chunk)
        pending = ms_dev
    last = trainer._materialize_metrics(pending, chunk)
    wall = (time.perf_counter() - t0) / (n_chunks * chunk)
    assert np.isfinite(last[-1].net), last[-1]
    return {
        "spb": spb,
        "epoch_ms": round(wall * 1e3, 2),
        "samples_per_s": round(bench.P1000 * bench.T / wall),
        "executable_ready_s": round(ready_s, 1),
        "first_dispatch_s": round(first_s, 1),
        "net": round(float(last[-1].net), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spbs", default="20,50,100,200")
    ap.add_argument("--epochs", type=int, default=50)
    args = ap.parse_args()

    rows = []
    for spb in (int(s) for s in args.spbs.split(",")):
        rows.append(measure(spb, args.epochs))
        print(json.dumps(rows[-1]), flush=True)
    best = min(rows, key=lambda r: r["epoch_ms"])
    print(json.dumps({
        "metric": "p1000_spb_sweep", "best_spb": best["spb"],
        "best_epoch_ms": best["epoch_ms"], "rows": rows,
    }))


if __name__ == "__main__":
    main()
