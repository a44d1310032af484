"""Unit tests for the bench_scaling communication contract.

The contract is load-bearing (SCALING.json is self-validating through it;
VERDICT r3 item 6) — pin its accept/reject behavior on synthetic
collective-stat dicts so a silent loosening or a broken bound shows up here,
not only in a full mesh sweep.
"""

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

from bench_scaling import check_comm_contract, collective_stats  # noqa: E402

PB = 24_452_840  # measured resnet param bytes (f32)
PX2 = 2 * 96 * 192  # global batch 2 at the sweep crop
PX4 = 4 * 96 * 192


def comm(ar=0, ag=0, cp=0, rs=0):
    d = {}
    if ar:
        d["all-reduce"] = {"count": 1, "bytes": ar}
    if ag:
        d["all-gather"] = {"count": 1, "bytes": ag}
    if cp:
        d["collective-permute"] = {"count": 1, "bytes": cp}
    if rs:
        d["reduce-scatter"] = {"count": 1, "bytes": rs}
    return d


class TestDPContract:
    def test_measured_rows_pass(self):
        # the actual r4 sweep rows (SCALING.json)
        check_comm_contract(comm(ar=39994704, cp=5898496, ag=18432),
                            PB, 2, 1, batch_px=PX2)
        check_comm_contract(comm(ar=39994704, cp=16220160, ag=18432),
                            PB, 4, 1, batch_px=PX4)

    def test_single_device_must_be_silent(self):
        check_comm_contract({}, PB, 1, 1, batch_px=PX2)
        with pytest.raises(AssertionError):
            check_comm_contract(comm(ar=100), PB, 1, 1, batch_px=PX2)

    def test_missing_gradient_allreduce_rejected(self):
        with pytest.raises(AssertionError, match="all-reduce"):
            check_comm_contract(comm(ar=PB // 2), PB, 2, 1, batch_px=PX2)

    def test_redundant_reduction_rejected(self):
        with pytest.raises(AssertionError, match="all-reduce"):
            check_comm_contract(comm(ar=2 * PB), PB, 2, 1, batch_px=PX2)

    def test_batch_replication_allgather_rejected(self):
        with pytest.raises(AssertionError, match="all-gather"):
            check_comm_contract(comm(ar=PB, ag=10 * 1 << 20),
                                PB, 2, 1, batch_px=PX2)

    def test_permute_beyond_pair_resharding_rejected(self):
        with pytest.raises(AssertionError, match="pair-resharding"):
            check_comm_contract(comm(ar=PB, cp=600 * PX2),
                                PB, 2, 1, batch_px=PX2)


class TestSpatialContract:
    def test_halo_required(self):
        with pytest.raises(AssertionError, match="halo"):
            check_comm_contract(comm(ar=PB), PB, 2, 2, batch_px=PX2)

    def test_gradients_still_reduced(self):
        with pytest.raises(AssertionError, match="reduction"):
            check_comm_contract(comm(ar=PB // 4, cp=1 << 20),
                                PB, 2, 2, batch_px=PX2)
        check_comm_contract(comm(ar=PB, cp=1 << 20), PB, 2, 2, batch_px=PX2)


class TestCollectiveStats:
    def test_parses_hlo_shapes(self):
        hlo = """
  %ar = (f32[100,10]{1,0}, f32[5]{0}) all-reduce-start(f32[100,10] %a, f32[5] %b)
  %cp = bf16[2,8]{1,0} collective-permute(bf16[2,8] %x)
"""
        ops = collective_stats(hlo)
        assert ops["all-reduce"]["bytes"] == 100 * 10 * 4 + 5 * 4
        assert ops["collective-permute"]["bytes"] == 2 * 8 * 2
