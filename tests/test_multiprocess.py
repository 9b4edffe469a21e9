"""Real multi-process distributed runtime test.

Launches TWO separate Python processes that form a jax.distributed cluster
(Gloo over localhost — the same client/coordination path real multi-host TPU
pods use over DCN), each owning 2 of a 4-device CPU mesh, and runs ONE full
GANgealing train step with the batch assembled from per-process shards.
Asserts both processes compute the identical global loss, and that it
matches a plain single-controller 4-device run of the same global step.

This is the strongest available stand-in for multi-host hardware in CI: it
exercises jax.distributed.initialize, global meshes over non-addressable
devices, make_array_from_process_local_data (via parallel.shard_batch /
replicate), and multihost_utils.process_allgather (via all_gather_hosts).
Capability reference: utils/distributed.py:6-14, train.py:255-259.
"""

import re
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "_mp_train_worker.py"


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _parse_metric(out):
    m = re.search(r"METRIC p=([-\d.ea]+) tv=([-\d.ea]+)", out)
    assert m, f"no METRIC line in output:\n{out}"
    return float(m.group(1)), float(m.group(2))


def _run(args, timeout=420):
    return subprocess.run(
        [sys.executable, str(WORKER), *args],
        capture_output=True, text=True, timeout=timeout,
        cwd=str(WORKER.parent.parent))


@pytest.mark.slow
def test_two_process_train_step_matches_single_controller():
    port = str(_free_port())
    p0 = subprocess.Popen(
        [sys.executable, str(WORKER), "multi", "0", port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(WORKER.parent.parent))
    p1 = subprocess.Popen(
        [sys.executable, str(WORKER), "multi", "1", port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(WORKER.parent.parent))
    out0, err0 = p0.communicate(timeout=420)
    out1, err1 = p1.communicate(timeout=420)
    assert p0.returncode == 0, f"proc0 failed:\n{out0}\n{err0[-3000:]}"
    assert p1.returncode == 0, f"proc1 failed:\n{out1}\n{err1[-3000:]}"
    m0 = _parse_metric(out0)
    m1 = _parse_metric(out1)
    assert m0 == pytest.approx(m1, abs=1e-6)

    single = _run(["single"])
    assert single.returncode == 0, (
        f"single failed:\n{single.stdout}\n{single.stderr[-3000:]}")
    ms = _parse_metric(single.stdout)
    # same global computation, different collective/layout path: tight but
    # not bitwise (reduction orders differ across shardings)
    assert m0[0] == pytest.approx(ms[0], rel=2e-5)
    assert m0[1] == pytest.approx(ms[1], rel=2e-5, abs=1e-6)
