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
def test_two_process_flow_scores_match_single_controller(tmp_path):
    """Sharded EVAL app across a real 2-process cluster: each process
    scores its dataset stride on its local devices; compute_flow_scores
    reassembles the global score array via all_gather_hosts + the
    reference's permute-de-interleave (flow_scores.py:39-42). Must equal
    the single-controller run image-for-image."""
    import io

    import numpy as np
    from PIL import Image

    from gangealing_tpu.data.lmdb_io import write_lmdb

    n, S = 10, 64
    rng = np.random.RandomState(0)
    items = {b"length": str(n).encode()}
    for i in range(n):
        buf = io.BytesIO()
        Image.fromarray((rng.rand(S, S, 3) * 255).astype(np.uint8)).save(
            buf, format="PNG")
        items[f"{S}-{str(i).zfill(5)}".encode()] = buf.getvalue()
    data_path = str(tmp_path / "imgs")
    write_lmdb(data_path, items)

    def parse_scores(out):
        m = re.search(r"SCORES ([-\d.,e]+)", out)
        assert m, f"no SCORES line in output:\n{out}"
        return np.asarray([float(x) for x in m.group(1).split(",")])

    port = str(_free_port())
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), "flow", str(pid), port, data_path],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(WORKER.parent.parent)) for pid in (0, 1)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
    s0 = parse_scores(outs[0][0])
    s1 = parse_scores(outs[1][0])
    np.testing.assert_allclose(s0, s1, atol=1e-7)  # both see the gather

    single = _run(["flow_single", data_path])
    assert single.returncode == 0, (
        f"single failed:\n{single.stdout}\n{single.stderr[-3000:]}")
    ss = parse_scores(single.stdout)
    assert ss.shape == s0.shape == (n,)
    np.testing.assert_allclose(s0, ss, rtol=2e-5, atol=1e-6)


@pytest.mark.slow
def test_two_process_congeal_dataset_matches_single_controller(tmp_path):
    """Multi-process congeal_dataset (round-4 verdict #3): each process
    aligns its stride of 10 images into the SHARED temp folder under its
    per-process PNG prefix, used indices cross processes via all_gatherv,
    and only the primary builds the output LMDB behind host barriers.
    The retained index list and the output LMDB's image content (as a
    sorted multiset — item order legitimately differs with per-process
    prefixes) must match the single-controller run."""
    import io

    import numpy as np
    from PIL import Image

    from gangealing_tpu.data.lmdb_io import write_lmdb

    n, S = 10, 64
    rng = np.random.RandomState(0)
    items = {b"length": str(n).encode()}
    for i in range(n):
        buf = io.BytesIO()
        Image.fromarray((rng.rand(S, S, 3) * 255).astype(np.uint8)).save(
            buf, format="PNG")
        items[f"{S}-{str(i).zfill(5)}".encode()] = buf.getvalue()
    data_path = str(tmp_path / "imgs")
    write_lmdb(data_path, items)

    def parse(out):
        m = re.search(r"USED ([\d,]*)(?: MEANS ([-\d.,e]+))?", out)
        assert m, f"no USED line in output:\n{out}"
        used = [int(x) for x in m.group(1).split(",") if x]
        means = ([float(x) for x in m.group(2).split(",")]
                 if m.group(2) else None)
        return used, means

    port = str(_free_port())
    out_multi = str(tmp_path / "aligned_multi")
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), "congeal", str(pid), port,
         data_path, out_multi],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(WORKER.parent.parent)) for pid in (0, 1)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
    used0, means0 = parse(outs[0][0])
    used1, means1 = parse(outs[1][0])
    assert used0 == used1  # every process returns the gathered full list
    assert means1 is None  # only the primary read the LMDB back

    single = _run(["congeal_single", data_path,
                   str(tmp_path / "aligned_single")])
    assert single.returncode == 0, (
        f"single failed:\n{single.stdout}\n{single.stderr[-3000:]}")
    used_s, means_s = parse(single.stdout)
    assert used0 == used_s
    assert means0 is not None and means_s is not None
    assert len(means0) == len(used_s)
    np.testing.assert_allclose(means0, means_s, atol=2e-5)


@pytest.mark.slow
def test_two_process_average_video_matches_single_controller():
    """Multi-process average_image_video (round-4 verdict #3): each
    process sums its stride of 7 images and the per-frame partial sums
    are reduced across hosts; per-frame grid means must match the
    single-controller run."""
    import numpy as np

    def parse(out):
        m = re.search(r"AVGFRAMES ([-\d.,e]+)", out)
        assert m, f"no AVGFRAMES line in output:\n{out}"
        return np.asarray([float(x) for x in m.group(1).split(",")])

    port = str(_free_port())
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), "avg", str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(WORKER.parent.parent)) for pid in (0, 1)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
    a0, a1 = parse(outs[0][0]), parse(outs[1][0])
    np.testing.assert_allclose(a0, a1, atol=1e-7)

    single = _run(["avg_single"])
    assert single.returncode == 0, (
        f"single failed:\n{single.stdout}\n{single.stderr[-3000:]}")
    a_s = parse(single.stdout)
    assert a_s.shape == a0.shape == (3,)
    np.testing.assert_allclose(a0, a_s, rtol=2e-5, atol=1e-6)


@pytest.mark.slow
def test_two_process_gather_reconciles_empty_stripes():
    """A process whose stripe is empty (n_total < process count) passes a
    bare np.zeros((0,)) to gather_process_stripes; the descriptor gather
    reconciles its trailing shape AND dtype to the non-empty processes'
    (regression for the int64-vs-int32 mismatch in
    bucket_real_images_by_cluster's old hand-built placeholder)."""
    port = str(_free_port())
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), "gather", str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(WORKER.parent.parent)) for pid in (0, 1)]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        assert "GATHER 66.0 16" in out, out


@pytest.mark.slow
def test_two_process_mixed_reality_matches_single_controller():
    """Multi-process mixed_reality (round-4 verdict #3): each process
    renders its stride of 7 frames (uneven stripes: 4 vs 3, plus a padded
    tail batch) and run_gangealing_on_video reassembles global frame order
    via gather_process_stripes. Per-frame propagated/congealed image means
    and per-frame correspondence-point means must match the
    single-controller run."""
    import numpy as np

    def parse(out):
        vals = {}
        for key in ("PROPAGATED", "CONGEALED", "CORRESPONDENCES"):
            m = re.search(key + r" ([-\d.,e]+)", out)
            assert m, f"no {key} line in output:\n{out}"
            vals[key] = np.asarray([float(x) for x in m.group(1).split(",")])
        return vals

    port = str(_free_port())
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), "mr", str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(WORKER.parent.parent)) for pid in (0, 1)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
    v0, v1 = parse(outs[0][0]), parse(outs[1][0])

    single = _run(["mr_single"])
    assert single.returncode == 0, (
        f"single failed:\n{single.stdout}\n{single.stderr[-3000:]}")
    vs = parse(single.stdout)
    for key in v0:
        assert v0[key].shape == vs[key].shape == (7,)
        # both processes hold the full gathered result
        np.testing.assert_allclose(v0[key], v1[key], atol=1e-7)
        np.testing.assert_allclose(v0[key], vs[key], rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_two_process_propagate_matches_single_controller():
    """Newly wired multi-process APP path (round-4 verdict #3): each
    process congeals its stride of 7 images (uneven stripes: 4 vs 3, plus
    a padded tail batch) and propagate_to_images reassembles global order
    via gather_process_stripes. Per-image congealed means and the
    average-congealed mean must match the single-controller run."""
    import numpy as np

    def parse(out):
        m = re.search(r"PROP ([-\d.,e]+) AVG ([-\d.e]+)", out)
        assert m, f"no PROP line in output:\n{out}"
        return (np.asarray([float(x) for x in m.group(1).split(",")]),
                float(m.group(2)))

    port = str(_free_port())
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER), "prop", str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(WORKER.parent.parent)) for pid in (0, 1)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
    c0, a0 = parse(outs[0][0])
    c1, a1 = parse(outs[1][0])
    # every process returns the full gathered result
    np.testing.assert_allclose(c0, c1, atol=1e-7)
    assert a0 == pytest.approx(a1, abs=1e-7)

    single = _run(["prop_single"])
    assert single.returncode == 0, (
        f"single failed:\n{single.stdout}\n{single.stderr[-3000:]}")
    cs, as_ = parse(single.stdout)
    assert cs.shape == c0.shape == (7,)
    np.testing.assert_allclose(c0, cs, rtol=2e-5, atol=1e-6)
    assert a0 == pytest.approx(as_, rel=2e-5, abs=1e-6)


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
