"""True multi-PROCESS runtime test (VERDICT r2 item 4).

Everything else in the suite runs one process x 8 virtual devices; this is
the first real exercise of the multi-host path: ``jax.distributed.initialize``
over a CPU coordination service, per-rank ``InferenceSampler`` shards whose
union is the exact dataset, and ``metrics_gather_fn``
(``multihost_utils.process_allgather``) reassembling per-sample metric lists
— the TPU-native analog of the reference's Gloo object gather
(``nmrf/utils/dist_utils.py:142-183``, ``evaluation.py:386-397``).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training_matches_single(tmp_path):
    """DDP gradient equivalence (VERDICT r3 item 5): N train steps across 2
    ``jax.distributed`` processes (global data=2 mesh, per-rank
    ``ShardedBatchSampler`` shards assembled by
    ``jax.make_array_from_process_local_data``) produce BIT-IDENTICAL params
    to a single-process run over the same global batches on a 1-process
    data=2 mesh.  The psum over the data axis is the same 2-term reduction in
    both topologies, so f32 tolerance is exactly 0 — any drift means the
    multi-process batch assembly or rendezvous is wrong (the reference gets
    this property implicitly from DDP, ``main.py:334-339``).

    Both topologies run as fresh subprocesses of identical configuration:
    measured 2026-08-19, running the ground truth inside the pytest parent
    leaves ~1e-5 reduction-order residue (inherited process state), while
    fresh-process runs are bit-identical."""
    coord = f"127.0.0.1:{_free_port()}"
    sp_path = str(tmp_path / "params_sp.npz")
    mp_path = str(tmp_path / "params_mp.npz")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # worker picks device count from nproc
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(ROOT, "tests", "mp_train_worker.py")
    procs = [
        # single-process ground truth (1 proc x 2 devices)
        subprocess.Popen(
            [sys.executable, worker, "none", "1", "0", sp_path],
            env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE),
    ] + [
        # the 2-process run under test (2 procs x 1 device)
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(rank), mp_path],
            env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{out}\n{err[-3000:]}"

    want = np.load(sp_path)
    got = np.load(mp_path)
    assert set(got.files) == set(want.files) and len(want.files) > 50
    for k in want.files:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


@pytest.mark.slow
def test_two_process_spatial_training_matches_single(tmp_path):
    """SPATIAL sequence parallelism across a real process boundary (VERDICT
    r4 item 5): N train steps on a global (data=1, spatial=2) mesh split
    over 2 ``jax.distributed`` processes — every ppermute window roll, halo
    exchange and CSWin stripe all-gather in ``parallel/spatial.py`` crosses
    the process boundary — vs a single-process run of the SAME mesh on 2
    virtual devices.  Identical SPMD program in both topologies, so params
    must match bit-for-bit (same contract as the DP test above); each
    process feeds its H-half of the global batch through
    ``jax.make_array_from_process_local_data`` along `spatial`."""
    coord = f"127.0.0.1:{_free_port()}"
    sp_path = str(tmp_path / "params_sp.npz")
    mp_path = str(tmp_path / "params_mp.npz")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(ROOT, "tests", "mp_train_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "none", "1", "0", sp_path, "1x2"],
            env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE),
    ] + [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(rank), mp_path, "1x2"],
            env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{out}\n{err[-3000:]}"

    want = np.load(sp_path)
    got = np.load(mp_path)
    assert set(got.files) == set(want.files) and len(want.files) > 50
    for k in want.files:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


@pytest.mark.slow
def test_two_process_eval_matches_single(tmp_path):
    from tests.mp_eval_worker import N_SAMPLES, run_eval

    # single-process ground truth over the full dataset
    want = run_eval(range(N_SAMPLES))["disp"]

    coord = f"127.0.0.1:{_free_port()}"
    out_path = str(tmp_path / "rank0.json")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(ROOT, "tests", "mp_eval_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(rank), out_path],
            env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{out}\n{err[-3000:]}"

    with open(out_path) as f:
        payload = json.load(f)
    assert payload["world"] == 2
    # rank 0's shard is the contiguous first ceil(N/2) indices, not the set
    assert payload["shard_len"] == (N_SAMPLES + 1) // 2
    # gathered 2-process metrics == single-process run, exactly (the metric
    # lists are concatenated in rank order, so the mean is over the same
    # floats in the same order)
    got = payload["result"]
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=0, atol=1e-12), k
