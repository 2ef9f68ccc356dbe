"""Dispatch-amortization sweep: wall ms/epoch vs epochs-per-dispatch chunk.

The flagship bench reports ~18 ms wall vs ~13.5 ms device per epoch at the
pipeline's default 25-epoch chunk — the gap is per-dispatch host/relay
overhead (the remote-attached chip adds ~100 ms per execute round trip).
This tool measures the SAME program (bench.build_bench_trainer) at several
chunk sizes so the overhead is quantified rather than inferred: wall/epoch
should approach the measured device time as the chunk grows, and blow up at
chunk=1 (one relay round trip per epoch).

Semantics are identical at every chunk: the epoch program is one lax.scan
whose length is the chunk size; the trajectory is bitwise the chunk split
(tests/test_training.py pins chunked == per-epoch).

Usage: env PYTHONPATH=.:/root/.axon_site python tools/chunk_sweep.py
       [--chunks 1,5,25,100] [--reps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lvae_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="1,5,25,100")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    chunks = [int(c) for c in args.chunks.split(",")]

    from bench import build_bench_trainer

    trainer = build_bench_trainer()
    out = {}
    for chunk in chunks:
        t0 = time.perf_counter()
        trainer._executable_for(chunk)
        ready_s = time.perf_counter() - t0
        trainer.run_epochs(chunk)  # first dispatch (upload/transfer leg)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            ms = trainer.run_epochs(chunk)  # reading metrics syncs
            times.append((time.perf_counter() - t0) / chunk)
        assert all(m.net == m.net for m in ms)  # finite check via NaN!=NaN
        wall_ms = sorted(times)[len(times) // 2] * 1e3
        out[chunk] = {
            "wall_ms_per_epoch": round(wall_ms, 3),
            "executable_ready_s": round(ready_s, 2),
            "dispatch_overhead_ms": None,  # filled below from the largest chunk
        }
        print(f"chunk={chunk}: {wall_ms:.2f} ms/epoch wall", flush=True)

    # estimate the fixed per-dispatch overhead from the two extreme chunks:
    # wall(c) = device + overhead/c  =>  overhead from a pair of chunk sizes
    cs = sorted(out)
    if len(cs) >= 2:
        c_lo, c_hi = cs[0], cs[-1]
        w_lo, w_hi = (out[c]["wall_ms_per_epoch"] for c in (c_lo, c_hi))
        ovh = (w_lo - w_hi) / (1.0 / c_lo - 1.0 / c_hi)
        for c in cs:
            out[c]["dispatch_overhead_ms"] = round(ovh, 1)
    print(json.dumps({"chunk_sweep": out}))


if __name__ == "__main__":
    main()
