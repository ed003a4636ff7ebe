"""Timing run: measured bucketing-policy selection + block_timings
persistence (the reference's 2-iteration timing-run flow,
/root/reference/src/sdpb/main.cxx:50-91 / write_timing.cxx)."""
import json

import numpy as np
import pytest


def _skewed_host():
    """One big block (np=40) + several tiny ones (np=4): quantized merging
    at quant=8 keeps them apart, but a coarse merge would pad every tiny
    block to 40 points — the policy decision the timing run measures."""
    from sdpb_tpu.models.synthetic import random_sdp

    big = random_sdp(num_blocks=1, dim=1, num_points=40, dual_dim=6, K=2,
                     np_dtype=np.float64, seed=0)
    small = random_sdp(num_blocks=6, dim=1, num_points=4, dual_dim=6, K=2,
                       np_dtype=np.float64, seed=1)
    for i, b in enumerate(small.blocks):
        b.index = 1 + i
    big.blocks.extend(small.blocks)
    return big


def test_timing_run_selects_and_persists(tmp_path):
    from sdpb_tpu.parallel.timing import (load_timings, save_timings,
                                          timing_run)
    from sdpb_tpu.solver.params import SolverParameters

    host = _skewed_host()
    params = SolverParameters(
        precision=106,
        initial_matrix_scale_primal="1e2", initial_matrix_scale_dual="1e2")
    rec = timing_run(host, params, verbosity=0)

    assert {m["policy"] for m in rec["measured"]} == {"quantized", "exact"}
    assert all(m["s_per_iteration"] > 0 for m in rec["measured"])
    chosen = rec["chosen"]
    best = min(rec["measured"], key=lambda m: m["s_per_iteration"])
    assert chosen["policy"] == best["policy"]
    # per-block costs cover every block and are positive
    assert sorted(map(int, rec["block_costs"])) == list(range(7))
    assert all(v > 0 for v in rec["block_costs"].values())

    save_timings(tmp_path, rec)
    loaded = load_timings(tmp_path)
    assert loaded == json.loads(json.dumps(rec))


def test_measured_costs_drive_slot_plan():
    """build_device_sdp consumes measured block costs for the LPT slot
    placement (read_block_costs.cxx analog): a cost table that inverts the
    RAM heuristic's ranking must produce the corresponding slot order."""
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.models.synthetic import random_sdp

    host = random_sdp(num_blocks=4, dim=1, num_points=8, dual_dim=4, K=2,
                      np_dtype=np.float64, seed=2)
    # same shapes -> heuristic says uniform; measured costs say block 3 is
    # 100x the rest (e.g. future intra-block sharding), so LPT must isolate
    # it on its own device chunk
    costs = {"0": 1.0, "1": 1.0, "2": 1.0, "3": 100.0}
    sdp = build_device_sdp(host, pad_to=2, block_costs=costs)
    (bk,) = sdp.buckets
    per_device = [
        [rs.block_index for rs in bk.real_sizes[i * 2:(i + 1) * 2]
         if rs.block_index >= 0]
        for i in range(2)
    ]
    heavy_chunk = [c for c in per_device if 3 in c]
    assert heavy_chunk, per_device
    # LPT: the expensive block's chunk carries at most one cheap sibling
    # less than the other chunk
    others = [c for c in per_device if 3 not in c][0]
    assert len(others) >= 2, per_device
