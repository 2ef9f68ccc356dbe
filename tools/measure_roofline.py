"""Measured per-op roofline of the bench epoch program (TPU trace).

Profiles one multi-epoch chunk dispatch of the flagship Hensman trainer
(bench.py's exact config), then prints:

* the program-level MEASURED device time / HBM bytes / FLOPs (xprof
  op_profile — real hardware counters, not the HloCostAnalysis model that
  over-reported 131% of HBM peak in r2);
* the top ops by self time (xprof hlo_stats) with category, occurrences,
  time share, and memory-bandwidth utilization — the table that directs
  fusion work.

Usage: env PYTHONPATH=.:/root/.axon_site python tools/measure_roofline.py
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lvae_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def build_trainer():
    # single source with the benchmark: measure_roofline must profile the
    # SAME program bench.py reports. ROOFLINE_P/ROOFLINE_SPB select the
    # poster-scale entry (e.g. P=1000, spb=50 — bench.P1000_SPB).
    import bench

    p = int(os.environ.get("ROOFLINE_P", "0"))
    if p:
        spb = int(os.environ.get("ROOFLINE_SPB", str(bench.P1000_SPB)))
        return bench.build_bench_trainer(n_subjects=p, spb=spb)
    return bench.build_bench_trainer()


def gviz_rows(table):
    """gviz {cols, rows} → list of dicts."""
    if isinstance(table, (bytes, str)):
        table = json.loads(table)
    if isinstance(table, list):
        table = table[0]
    cols = [c["id"] for c in table["cols"]]
    out = []
    for r in table["rows"]:
        out.append({c: (cell or {}).get("v") for c, cell in zip(cols, r["c"])})
    return out


def main():
    import jax

    chunk = int(os.environ.get("ROOFLINE_CHUNK", "25"))
    trainer = build_trainer()
    print("compiling + warmup...", flush=True)
    trainer.run_epochs(chunk)

    logdir = tempfile.mkdtemp(prefix="lvae_roofline_")
    with jax.profiler.trace(logdir):
        trainer.run_epochs(chunk)
    xp = glob.glob(logdir + "/plugins/profile/*/*.xplane.pb")
    print("trace:", xp, flush=True)

    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xp, "op_profile", {})
    prof = json.loads(data)
    progs = [
        c for c in prof["byProgram"].get("children", [])
        if c["name"].startswith("jit_")
    ]
    mt = max(progs, key=lambda c: c["metrics"].get("rawTime", 0))["metrics"]
    dev_s = mt["rawTime"] / 1e12
    print(json.dumps({
        "device_ms_per_epoch": round(dev_s / chunk * 1e3, 3),
        "hbm_bytes_per_epoch_G": round(
            float(mt["rawBytesAccessedArray"][0]) / chunk / 1e9, 3
        ),
        "xprof_flops_util_pct": round(100 * float(mt.get("flops", 0)), 2),
        "xprof_hbm_bw_util_pct": round(
            100 * float(mt.get("bandwidthUtils", [0])[0]), 1
        ),
        "xprof_sram_rd_util_pct": round(
            100 * float(mt.get("bandwidthUtils", [0, 0])[1]), 1
        ),
        "xprof_sram_wr_util_pct": round(
            100 * float(mt.get("bandwidthUtils", [0, 0, 0])[2]), 1
        ),
    }), flush=True)

    data, _ = rtd.xspace_to_tool_data(xp, "hlo_stats", {})
    rows = gviz_rows(data)
    # keep device rows of the main program, rank by self time
    want = [r for r in rows if r.get("self_time_us")] or rows
    try:
        want.sort(key=lambda r: -float(r.get("self_time_us") or 0))
    except Exception:  # noqa: BLE001
        pass
    keys = [k for k in (
        "category", "hlo_op_name", "occurrences", "self_time_us",
        "pct_of_total_time", "measured_memory_bw", "bound_by",
    ) if want and k in want[0]]
    if want and not keys:
        keys = list(want[0].keys())[:8]
    print("top ops by self time:")
    for r in want[:20]:
        print("  " + " | ".join(f"{k}={r.get(k)}" for k in keys), flush=True)


if __name__ == "__main__":
    main()
