"""Does the remote-TPU relay pipeline in-flight executes?

The chunk sweep (tools/chunk_sweep.py) fitted the flagship program's wall
time as ``device + ~103.5 ms / dispatch``: each `run_epochs` chunk pays a
full relay round trip because the fit loop materialises the chunk's metrics
(np.asarray => sync) before dispatching the next chunk. If JAX's async
dispatch returns before the remote execute completes AND the relay accepts
a second execute while the first runs, then dispatching chunk k+1 before
blocking on chunk k's metrics hides the round trip entirely.

This probe measures three schedules of K chunks x CHUNK epochs:

  sync      dispatch -> materialise metrics -> next   (the current fit loop)
  lag1      dispatch k+1, then materialise chunk k's metrics (1-chunk lag)
  nosync    dispatch all K, block once at the end

and prints wall ms/epoch for each plus the per-call dispatch-return latency
(whether the execute call itself blocks). Run AFTER tests finish (one CPU
core): env PYTHONPATH=.:/root/.axon_site python tools/overlap_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lvae_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

CHUNK = int(os.environ.get("PROBE_CHUNK", "25"))
K = int(os.environ.get("PROBE_K", "8"))


def main():
    import jax
    import numpy as np

    from bench import build_bench_trainer

    trainer = build_bench_trainer()
    ex = trainer._executable_for(CHUNK)
    # warmup (executable upload + first dispatch)
    state, ms = ex(trainer.state, trainer.tdata)
    jax.block_until_ready(ms)

    def sync_schedule(state):
        t0 = time.perf_counter()
        for _ in range(K):
            state, ms = ex(state, trainer.tdata)
            _ = jax.tree.map(np.asarray, ms)  # materialise => sync
        return state, (time.perf_counter() - t0) / (K * CHUNK) * 1e3

    def make_lag_schedule(depth):
        def lag_schedule(state):
            from collections import deque

            t0 = time.perf_counter()
            q = deque()
            for _ in range(K):
                state, ms = ex(state, trainer.tdata)
                q.append(ms)
                if len(q) > depth:
                    _ = jax.tree.map(np.asarray, q.popleft())
            while q:
                _ = jax.tree.map(np.asarray, q.popleft())
            return state, (time.perf_counter() - t0) / (K * CHUNK) * 1e3

        return lag_schedule

    lag1_schedule = make_lag_schedule(1)
    lag2_schedule = make_lag_schedule(2)
    lag4_schedule = make_lag_schedule(4)

    def lag1_oneleaf_schedule(state):
        # fetch ONE leaf per chunk instead of the whole NamedTuple —
        # decomposes the per-chunk materialise cost into per-leaf RPCs
        t0 = time.perf_counter()
        pending = None
        for _ in range(K):
            state, ms = ex(state, trainer.tdata)
            if pending is not None:
                _ = np.asarray(pending[0])
            pending = ms
        _ = np.asarray(pending[0])
        return state, (time.perf_counter() - t0) / (K * CHUNK) * 1e3

    def lag1_deviceget_schedule(state):
        # jax.device_get issues copy_to_host_async on EVERY leaf before
        # blocking — if the per-chunk cost is serial per-leaf transfer
        # RPCs, this should match oneleaf/nosync
        t0 = time.perf_counter()
        pending = None
        for _ in range(K):
            state, ms = ex(state, trainer.tdata)
            if pending is not None:
                _ = jax.device_get(pending)
            pending = ms
        _ = jax.device_get(pending)
        return state, (time.perf_counter() - t0) / (K * CHUNK) * 1e3

    def lag1_blockonly_schedule(state):
        # wait for completion but never transfer: isolates the transfer RPC
        t0 = time.perf_counter()
        pending = None
        for _ in range(K):
            state, ms = ex(state, trainer.tdata)
            if pending is not None:
                jax.block_until_ready(pending)
            pending = ms
        jax.block_until_ready(pending)
        return state, (time.perf_counter() - t0) / (K * CHUNK) * 1e3

    def nosync_schedule(state):
        t0 = time.perf_counter()
        dispatch_lat = []
        all_ms = []
        for _ in range(K):
            t1 = time.perf_counter()
            state, ms = ex(state, trainer.tdata)
            dispatch_lat.append((time.perf_counter() - t1) * 1e3)
            all_ms.append(ms)
        jax.block_until_ready(all_ms)
        return state, (time.perf_counter() - t0) / (K * CHUNK) * 1e3, dispatch_lat

    schedules = {
        "sync": sync_schedule,
        "lag1": lag1_schedule,
        "lag2": lag2_schedule,
        "lag4": lag4_schedule,
        "lag1_oneleaf": lag1_oneleaf_schedule,
        "lag1_deviceget": lag1_deviceget_schedule,
        "lag1_blockonly": lag1_blockonly_schedule,
    }
    results = {}
    # interleave repeats so relay drift doesn't bias one arm
    for rep in range(2):
        for name, sched in schedules.items():
            state, ms_epoch = sched(state)
            results.setdefault(name, []).append(ms_epoch)
            print(f"rep{rep} {name}: {results[name][-1]:.2f} ms/epoch", flush=True)
        state, ms_epoch, lat = nosync_schedule(state)
        results.setdefault("nosync", []).append(ms_epoch)
        results.setdefault("dispatch_return_ms", []).extend(lat)
        print(f"rep{rep} nosync: {results['nosync'][-1]:.2f} ms/epoch", flush=True)

    print("\n== summary (wall ms/epoch, K=%d chunks x %d epochs) ==" % (K, CHUNK))
    for name in (
        "sync", "lag1", "lag2", "lag4", "lag1_oneleaf", "lag1_deviceget",
        "lag1_blockonly", "nosync",
    ):
        vals = results[name]
        print(f"  {name:7s} {np.median(vals):7.2f}  (reps: "
              + ", ".join(f"{v:.2f}" for v in vals) + ")")
    lat = results.get("dispatch_return_ms", [])
    if lat:
        print(f"  dispatch-return latency ms: median {np.median(lat):.1f}, "
              f"min {min(lat):.1f}, max {max(lat):.1f}")


if __name__ == "__main__":
    main()
