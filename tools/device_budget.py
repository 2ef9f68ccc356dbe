"""Per-op-class device-time budget of the bench epoch program (VERDICT r4
item 1): account for ~100 % of the measured device time by op class, each
class with its achieved bandwidth/roofline attribution, so "conv-HBM-bound"
is an arithmetic statement instead of a top-of-the-ranking impression.

Profiles one chunk dispatch of the EXACT bench program (bench.build_bench_
trainer), then groups every hlo_stats row into classes keyed on the XLA
metadata (tf_op_name carries the jaxpr provenance):

  conv_fwd / conv_bwd   — ConvVAE convolution fusions (jvp vs transpose(jvp))
  pool_bwd              — select-and-scatter (max-pool backward)
  vae_dense             — ConvVAE fc-layer dot fusions
  gp_pallas             — the Pallas GP custom-calls (B-chain, Cholesky)
  gp_xla                — remaining dot/cholesky fusions (GP algebra on MXU)
  gather_layout         — gathers, scatters, copies, transposes, reshapes
  elementwise           — loop fusions with no dot/conv (optimizer, masks, …)
  other                 — anything else

Per class: Σ self time (µs, hlo_stats total_self_time — verified to sum to
the op_profile program rawTime within ~1 %), share of device time,
time-weighted overall/HBM bandwidth, and xprof's own bound_by mix
(Compute / HBM / VMEM Read / VMEM Write — its v5e hardware model).

Usage: env PYTHONPATH=.:/root/.axon_site python tools/device_budget.py
       [ROOFLINE_P=1000 ROOFLINE_SPB=50 ROOFLINE_CHUNK=25]
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

HBM_GBPS = 819.0  # TPU v5e


def gviz_rows(table):
    if isinstance(table, (bytes, str)):
        table = json.loads(table)
    if isinstance(table, list):
        table = table[0]
    cols = [c["id"] for c in table["cols"]]
    out = []
    for r in table["rows"]:
        out.append({c: (cell or {}).get("v") for c, cell in zip(cols, r["c"])})
    return out


def classify(r: dict) -> str:
    cat = str(r.get("category") or "").lower()
    tf = str(r.get("tf_op_name") or "")
    name = str(r.get("hlo_op_name") or "").lower()
    if "select_and_scatter" in tf or "select-and-scatter" in cat:
        return "pool_bwd"
    if "pallas_call" in tf or "custom-call" in cat:
        return "gp_pallas"
    if "ConvVAE" in tf and ("conv_general_dilated" in tf
                            or "convolution" in cat):
        return "conv_bwd" if "transpose(jvp" in tf else "conv_fwd"
    if "ConvVAE" in tf and "dot_general" in tf:
        return "vae_dense"
    if "dot_general" in tf or "einsum" in tf or "triangular_solve" in tf \
            or "cholesky" in tf.lower():
        return "gp_xla"
    if any(k in cat for k in ("gather", "scatter", "copy", "transpose",
                              "reshape", "data formatting", "slice",
                              "bitcast")) \
            or any(k in name for k in ("gather", "scatter", "copy",
                                       "transpose", "bitcast", "reshape",
                                       "dynamic-slice",
                                       "dynamic-update-slice")) \
            or "gather" in tf or "copy" in tf:
        return "gather_layout"
    if "convolution" in cat:
        # conv-category fusion without ConvVAE provenance: the GP chain's
        # batched matmuls XLA lowered as convolutions
        return "gp_xla"
    if "fusion" in cat or "loop" in cat or cat in (
            "add", "multiply", "subtract", "divide", "rsqrt", "exponential",
            "log", "compare", "select", "rng", "reduce", "broadcast",
            "convert", "iota", "elementwise fusion"):
        return "elementwise"
    return "other"


def main():
    import jax

    import bench

    chunk = int(os.environ.get("ROOFLINE_CHUNK", "25"))
    p = int(os.environ.get("ROOFLINE_P", "1000"))
    spb = int(os.environ.get("ROOFLINE_SPB", str(bench.P1000_SPB)))
    trainer = bench.build_bench_trainer(n_subjects=p, spb=spb)
    print(f"P={p} spb={spb} chunk={chunk} "
          f"model_dtype={trainer.model.dtype}", flush=True)
    print("compiling + warmup...", flush=True)
    trainer.run_epochs(chunk)

    logdir = tempfile.mkdtemp(prefix="lvae_budget_")
    with jax.profiler.trace(logdir):
        trainer.run_epochs(chunk)
    xp = glob.glob(logdir + "/plugins/profile/*/*.xplane.pb")

    from xprof.convert import raw_to_tool_data as rtd

    # program-level measured totals (hardware counters)
    data, _ = rtd.xspace_to_tool_data(xp, "op_profile", {})
    prof = json.loads(data)
    progs = [c for c in prof["byProgram"].get("children", [])
             if c["name"].startswith("jit_")]
    mt = max(progs, key=lambda c: c["metrics"].get("rawTime", 0))["metrics"]
    dev_us_epoch = mt["rawTime"] / 1e6 / chunk  # ps → µs
    hbm_g_epoch = float(mt["rawBytesAccessedArray"][0]) / chunk / 1e9

    data, _ = rtd.xspace_to_tool_data(xp, "hlo_stats", {})
    rows = gviz_rows(data)
    classes: dict = {}
    total_self_us = 0.0
    for r in rows:
        st = float(r.get("total_self_time") or 0.0)
        if not st:
            continue
        cls = classify(r)
        c = classes.setdefault(cls, {
            "self_us": 0.0, "bw_x_us": 0.0, "hbm_bw_x_us": 0.0, "occ": 0,
            "ops": [], "bound": {},
        })
        c["self_us"] += st
        c["bw_x_us"] += float(r.get("measured_memory_bw") or 0.0) * st
        c["hbm_bw_x_us"] += float(r.get("hbm_bw") or 0.0) * st
        c["occ"] += int(float(r.get("occurrences") or 0))
        bb = str(r.get("bound_by") or "?")
        c["bound"][bb] = c["bound"].get(bb, 0.0) + st
        c["ops"].append((st, str(r.get("category")),
                         str(r.get("hlo_op_name")),
                         r.get("measured_memory_bw"), bb,
                         str(r.get("tf_op_name") or "")[:110]))
        total_self_us += st

    scale = 1.0 / chunk
    out_rows = []
    for cls, c in sorted(classes.items(), key=lambda kv: -kv[1]["self_us"]):
        us_epoch = c["self_us"] * scale
        mean_bw = (c["bw_x_us"] / c["self_us"]) if c["self_us"] else 0.0
        mean_hbm = (c["hbm_bw_x_us"] / c["self_us"]) if c["self_us"] else 0.0
        bound_mix = {k: round(100 * v / c["self_us"], 1)
                     for k, v in sorted(c["bound"].items(),
                                        key=lambda kv: -kv[1])}
        out_rows.append({
            "class": cls,
            "ms_per_epoch": round(us_epoch / 1e3, 3),
            "pct_of_device": round(100 * us_epoch / dev_us_epoch, 1),
            "mean_bw_GBps": round(mean_bw, 1),
            "mean_hbm_bw_GBps": round(mean_hbm, 1),
            # GB/s × µs = KB; /1e6 → GB
            "hbm_G_per_epoch": round(c["hbm_bw_x_us"] * scale / 1e6, 3),
            "bound_by_mix_pct": bound_mix,
            "occurrences": c["occ"],
        })
    budget = {
        "P": p, "spb": spb, "chunk": chunk,
        "model_dtype": str(getattr(trainer.model.dtype, "__name__",
                                   trainer.model.dtype)),
        "measured_device_ms_per_epoch": round(dev_us_epoch / 1e3, 3),
        "measured_hbm_G_per_epoch": round(hbm_g_epoch, 3),
        "all_at_hbm_peak_floor_ms": round(hbm_g_epoch / HBM_GBPS * 1e3, 2),
        "hlo_stats_coverage_pct_of_device": round(
            100 * total_self_us * scale / dev_us_epoch, 1),
        "classes": out_rows,
    }
    print(json.dumps(budget, indent=1), flush=True)

    for cls, c in sorted(classes.items(), key=lambda kv: -kv[1]["self_us"])[:5]:
        print(f"\ntop ops in {cls}:")
        for st, cat, name, bw, bb, tf in sorted(c["ops"], reverse=True)[:8]:
            print(f"  {st * scale / 1e3:8.3f} ms/ep | bw={bw and round(float(bw))} "
                  f"| {bb} | {cat} | {name} | {tf}", flush=True)


if __name__ == "__main__":
    main()
