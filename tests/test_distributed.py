"""Multi-process (DCN) path: two coordinated processes, one global mesh.

Spawns two worker processes (tests/dcn_worker.py), each owning 4 virtual CPU
devices, that join through ``initialize_distributed`` (localhost
coordinator), build the global ('data': 4, 'latent': 2) mesh and run three
sharded Hensman epochs. Asserts both processes produce identical metrics
that match a single-process run of the same trainer bit-for-bit at 1e-8 —
the distributed runtime (cross-process collectives included) must be
semantics-preserving.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "dcn_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_global_mesh_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # each worker sets its own JAX_PLATFORMS/XLA_FLAGS before importing jax
    env.pop("XLA_FLAGS", None)
    outs = [str(tmp_path / f"dcn{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=560)
            logs.append(out.decode(errors="replace"))
    finally:
        for p in procs:  # a wedged worker must not outlive the test
            if p.poll() is None:
                p.kill()
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    with open(outs[0]) as f:
        got0 = json.load(f)
    with open(outs[1]) as f:
        got1 = json.load(f)
    assert got0 == got1, "processes disagree on metrics"

    # single-process oracles: same trainers without the distributed runtime
    from tests.dcn_worker import build_standard_trainer, build_trainer

    trainer = build_trainer()
    ref = trainer.run_epochs(3)
    for a, b in zip(ref, got0["hensman"]):
        np.testing.assert_allclose(a.net, b["net"], rtol=1e-8)
        np.testing.assert_allclose(a.kld, b["kld"], rtol=1e-8)
        np.testing.assert_allclose(a.recon, b["recon"], rtol=1e-8)

    std = build_standard_trainer()
    std_ref = [std.run_epoch() for _ in range(3)]
    for a, b in zip(std_ref, got0["standard"]):
        np.testing.assert_allclose(a.net, b["net"], rtol=1e-8)
        np.testing.assert_allclose(a.gp, b["gp"], rtol=1e-8)
