"""Round-stamped multi-seed accuracy sweep → ACCURACY_r{N}.json.

VERDICT r4 item 3: the checked-in accuracy tables must be reproducible from
HEAD — value-identical layout changes shift 300-epoch trajectories
chaotically, so every table needs the commit it was measured at and a
machine-readable artifact next to BENCH_r{N}.json.

Runs `benchmarks/healthmnist_accuracy.py` once per seed (fresh process —
module switches bake at trace time; the persistent compile cache makes
seeds 2..N cheap), under the SHIPPED defaults (`--model_dtype auto`), and
writes:

* `benchmarks/sweep_r{N}_p1000_seeds.jsonl` — one JSON line per seed run;
* `ACCURACY_r{N}.json` — summary: mean±σ GP-pred MSE, per-seed rows
  (incl. the r5 `recon_clean_mse` control column, VERDICT r4 item 5),
  the git commit, and the armed-assert status.

Usage: env PYTHONPATH=.:/root/.axon_site python tools/accuracy_sweep.py
       [--round 5] [--seeds 0 1 2 3 4] [--subjects 1000] [--epochs 300]
       [--timeout 1500] [--retries 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_seed(seed: int, a) -> dict | None:
    cmd = [
        sys.executable, os.path.join(ROOT, "benchmarks", "healthmnist_accuracy.py"),
        "--subjects", str(a.subjects), "--epochs", str(a.epochs),
        "--seed", str(seed), "--model_dtype", "auto",
    ]
    for attempt in range(1, a.retries + 2):
        t0 = time.time()
        try:
            out = subprocess.run(
                cmd, timeout=a.timeout, capture_output=True, text=True,
                cwd=ROOT,
            )
        except subprocess.TimeoutExpired:
            print(f"# seed {seed}: attempt {attempt} timed out after "
                  f"{a.timeout}s (compiles persist; retrying)",
                  file=sys.stderr, flush=True)
            continue
        js = None
        for ln in reversed((out.stdout or "").strip().splitlines()):
            try:
                js = json.loads(ln)
                break
            except json.JSONDecodeError:
                continue
        if js is not None:
            js["_wall_s"] = round(time.time() - t0, 1)
            # the armed discrimination assert fires AFTER the JSON print;
            # rc==0 means it passed
            js["_assert_passed"] = out.returncode == 0
            if out.returncode != 0:
                tail = (out.stderr or "").strip().splitlines()[-3:]
                print(f"# seed {seed}: armed assert FAILED: " + " | ".join(tail),
                      file=sys.stderr, flush=True)
            return js
        tail = (out.stderr or "").strip().splitlines()[-3:]
        print(f"# seed {seed}: attempt {attempt} rc={out.returncode}: "
              + " | ".join(tail), file=sys.stderr, flush=True)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2, 3, 4])
    ap.add_argument("--subjects", type=int, default=1000)
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--timeout", type=int, default=1500)
    ap.add_argument("--retries", type=int, default=2)
    a = ap.parse_args()

    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True, cwd=ROOT,
    ).stdout.strip()
    dirty = bool(subprocess.run(
        ["git", "status", "--porcelain", "--", "lvae_tpu", "benchmarks"],
        capture_output=True, text=True, cwd=ROOT,
    ).stdout.strip())

    jsonl = os.path.join(ROOT, "benchmarks", f"sweep_r{a.round:02d}_p1000_seeds.jsonl")
    rows = []
    for seed in a.seeds:
        print(f"=== seed {seed} ===", flush=True)
        js = run_seed(seed, a)
        if js is None:
            print(f"# seed {seed}: FAILED after retries", file=sys.stderr)
            continue
        with open(jsonl, "a") as f:
            f.write(json.dumps(js) + "\n")
        rows.append(js)
        print(json.dumps({k: js.get(k) for k in ("value", "_assert_passed")}),
              flush=True)

    import numpy as np

    vals = [r["value"] for r in rows]
    ex = [r.get("extra", {}) for r in rows]
    summary = {
        "metric": "healthmnist_future_prediction_mse_P1000_5seed",
        "round": a.round,
        "commit": commit + ("-dirty" if dirty else ""),
        "subjects": a.subjects,
        "epochs": a.epochs,
        "model_dtype": "auto (shipped default: bf16 at this scale)",
        "paper_lvae_dim32": {"mean": 0.025, "std": 0.0015},
        "gp_pred_mse": {
            "mean": round(float(np.mean(vals)), 5),
            "std": round(float(np.std(vals)), 5),
            "per_seed": {str(r["extra"]["seed"]): r["value"] for r in rows},
        },
        "all_armed_asserts_passed": all(r.get("_assert_passed") for r in rows),
        "seeds_completed": len(rows),
        "rows": [
            {
                "seed": e.get("seed"),
                "gp_mse": r.get("value"),
                "vae_recon_mse": e.get("vae_recon_mse"),
                "recon_clean_mse": e.get("recon_clean_mse"),
                "gp_vs_recon_ratio": e.get("gp_vs_recon_ratio"),
                "k1_ablation_ratio": e.get("k1_ablation_ratio"),
                "k1_latent_ablation_ratio": e.get("k1_latent_ablation_ratio"),
                "imputation_mse": e.get("imputation_mse_missing_pixels"),
                "assert_passed": r.get("_assert_passed"),
                "wall_s": r.get("_wall_s"),
            }
            for r, e in zip(rows, ex)
        ],
    }
    out_path = os.path.join(ROOT, f"ACCURACY_r{a.round:02d}.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1), flush=True)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
