"""Multi-HOST (multi-process) tests: N-process cloud == 1-process cloud.

Spawns real subprocesses that join a jax.distributed job over virtual CPU
devices with gloo collectives — the same code path a TPU pod would run over
DCN (SURVEY.md §5.8). The conftest's in-process backend is NOT involved:
workers configure their own backends.
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

_WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_job(nproc: int, tmp_path: Path, levels: int = 1) -> list[Path]:
    port = _free_port()
    outs = [
        tmp_path / f"cloud_{nproc}proc_l{levels}_{i}.npz"
        for i in range(nproc)
    ]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker selects cpu itself
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(i), str(nproc), str(port),
             str(outs[i]), str(levels)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(nproc)
    ]
    logs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, tail in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{tail[-3000:]}"
    return outs


@pytest.mark.slow
def test_multihost_cloud_matches_single_process(tmp_path):
    outs2 = _run_job(2, tmp_path)
    outs1 = _run_job(1, tmp_path)

    a = np.load(outs2[0])
    b = np.load(outs2[1])
    c = np.load(outs1[0])

    # Both processes of the same job: byte-identical (they ran the same
    # deterministic program over the same global mesh).
    np.testing.assert_array_equal(a["position"], b["position"])
    np.testing.assert_array_equal(a["vis"], b["vis"])

    # 2-process cloud == 1-process cloud: same patches accepted, same
    # geometry (contention is resolved by global ids, not device count).
    assert a["position"].shape == c["position"].shape
    np.testing.assert_allclose(a["position"], c["position"], atol=1e-5)
    np.testing.assert_allclose(a["normal"], c["normal"], atol=1e-5)
    np.testing.assert_array_equal(a["vis"], c["vis"])


@pytest.mark.slow
def test_multihost_multiscale_matches_single_process(tmp_path):
    """Coarse-to-fine through the distributed driver (VERDICT r3 #6):
    the N-process multiscale cloud equals the 1-process one over the same
    8-device mesh."""
    outs2 = _run_job(2, tmp_path, levels=2)
    outs1 = _run_job(1, tmp_path, levels=2)
    a = np.load(outs2[0])
    c = np.load(outs1[0])
    assert a["position"].shape[0] > 0
    assert a["position"].shape == c["position"].shape
    np.testing.assert_allclose(a["position"], c["position"], atol=1e-5)
    np.testing.assert_array_equal(a["vis"], c["vis"])
