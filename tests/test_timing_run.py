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
    placement (read_block_costs.cxx analog): the per-device contiguous
    chunks must achieve the OPTIMAL makespan on this instance (checked by
    brute force), not merely place the heavy block somewhere."""
    from itertools import combinations

    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.models.synthetic import random_sdp

    host = random_sdp(num_blocks=6, dim=1, num_points=8, dual_dim=4, K=2,
                      np_dtype=np.float64, seed=2)
    # same shapes -> heuristic says uniform; measured costs disagree
    costs = {"0": 8.0, "1": 7.0, "2": 6.0, "3": 5.0, "4": 4.0, "5": 3.0}
    sdp = build_device_sdp(host, pad_to=2, block_costs=costs)
    (bk,) = sdp.buckets
    assert bk.batch == 6
    per_device = [
        [rs.block_index for rs in bk.real_sizes[i * 3:(i + 1) * 3]
         if rs.block_index >= 0]
        for i in range(2)
    ]
    assert sorted(i for c in per_device for i in c) == list(range(6))
    loads = [sum(costs[str(i)] for i in chunk) for chunk in per_device]
    # optimal 3+3 split by brute force
    total = sum(costs.values())
    best = min(
        max(s, total - s)
        for pick in combinations(range(6), 3)
        for s in [sum(costs[str(i)] for i in pick)])
    assert max(loads) == best, (per_device, loads, best)


def test_slot_plan_isolates_heavy_block():
    """A 100x block must NOT share its device chunk beyond the forced
    capacity: the other device takes all remaining blocks it can hold."""
    from sdpb_tpu.parallel.planner import plan_block_slots

    slots = plan_block_slots([1.0, 1.0, 1.0, 100.0], 2)
    cap = 2
    chunks = [
        [s for s in slots[d * cap:(d + 1) * cap] if s is not None]
        for d in range(2)
    ]
    heavy = next(c for c in chunks if 3 in c)
    light = next(c for c in chunks if 3 not in c)
    # LPT on this instance: heavy chunk = [3] + the one forced leftover,
    # light chunk filled to capacity first
    assert len(light) == cap, chunks
    assert len(heavy) == 2 and 3 in heavy, chunks
