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
