"""Structured metrics logging and device observability.

The reference's observability is ``print(..., flush=True)`` per epoch plus
pickled loss arrays (training.py:142-148, LVAE.py:347-348) and an optional
CUDA max-memory print (LVAE.py:295-297). Here: a JSONL metrics stream per run
(machine-readable, append-only) plus device memory stats from the JAX
runtime.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax


class MetricsLogger:
    """Append-only JSONL metrics writer; buffered, explicit flush."""

    def __init__(self, out_dir: Optional[str], filename: str = "metrics.jsonl"):
        self.path = os.path.join(out_dir, filename) if out_dir else None
        self._buf: list = []
        self._t0 = time.perf_counter()

    def log(self, step: int, metrics: dict) -> None:
        rec = {"step": step, "t": round(time.perf_counter() - self._t0, 4)}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._buf.append(rec)
        if len(self._buf) >= 50:
            self.flush()

    def flush(self) -> None:
        if not self.path or not self._buf:
            self._buf.clear()
            return
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        with open(self.path, "a") as f:
            for rec in self._buf:
                f.write(json.dumps(rec) + "\n")
        self._buf.clear()


def device_memory_stats() -> dict:
    """Per-device memory stats (replaces torch.cuda.max_memory_allocated)."""
    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:  # noqa: BLE001 — CPU devices have no stats
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out


class StepTimer:
    """Wall-clock step timing with device fencing (jax.block_until_ready)."""

    def __init__(self):
        self.times: list = []

    def time(self, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.times.append(time.perf_counter() - t0)
        return out

    @property
    def median_ms(self) -> float:
        import numpy as np

        return float(np.median(self.times) * 1000) if self.times else float("nan")
