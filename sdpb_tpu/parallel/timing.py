"""Measured-cost planning: the reference's "timing run" re-imagined for the
bucketed SPMD architecture.

The reference solves 2 throwaway iterations, records per-block
`cholesky_i + solve_i + syrk_i` timer totals into a `block_timings` file,
then re-allocates blocks to ranks by measured cost and re-solves
(/root/reference/src/sdpb/main.cxx:50-91, write_timing.cxx:17-47,
read_block_costs.cxx:15-28).

Here blocks are batched into shape buckets and every device executes the
same program on its shard, so per-device balance WITHIN a bucket is
automatic (padding blocks cost the same flops as real ones).  What measured
cost actually decides in this design:

  * the BUCKETING POLICY — merging near-shapes ("quantized") wastes flops
    on padding but compiles fewer programs; keeping shapes exact does the
    reverse.  Which wins is hardware/problem dependent: only a measurement
    can tell.  The timing run times 2 real iterations under each candidate
    and picks the fastest.
  * the per-block cost table — the measured winner's s/iteration split
    over blocks proportionally to the RAM-cost heuristic, persisted like
    `block_timings` and fed to parallel.planner.plan_block_slots so the
    contiguous shard_map split balances per-device cost.

The result is persisted in the checkpoint directory as
`block_timings.json`; like the reference, the run happens automatically
when no timings exist and is skipped afterwards.
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

TIMINGS_FILE = "block_timings.json"

# candidate bucketing policies measured by the timing run
CANDIDATES: List[Tuple[str, int]] = [("quantized", 8), ("exact", 0)]


def _time_iterations(sdp, params, n_timed: int = 2) -> float:
    """Steady-state seconds/iteration of the production-config jitted step
    (1 warm-up iteration excluded — XLA compiles are a one-time cost the
    reference does not have)."""
    import jax

    from ..solver.solve import run_solver  # noqa: F401 (production config laws)
    from ..solver.state import initial_state
    from ..solver.step import StepConfig, make_iteration
    from ..utils.strings import str_to_limbs, str_to_scaled_limbs
    import jax.numpy as jnp
    import mpmath

    K = sdp.b.K
    dtype = sdp.b.dtype
    scaled = sdp.b.scaled
    npdt = np.float32 if dtype == jnp.float32 else np.float64

    def parse(s):
        return str_to_scaled_limbs(s, K) if scaled else str_to_limbs(s, K, npdt)

    state = initial_state(sdp, parse(params.initial_matrix_scale_primal),
                          parse(params.initial_matrix_scale_dual))
    factor_limbs = max(2, (K + 2) // 2)
    cfg = StepConfig(
        total_psd_rows=sdp.total_psd_rows, axis=None,
        factor_limbs=factor_limbs,
        n_refine=0 if K <= factor_limbs else -(-K // factor_limbs),
        gamma=float(mpmath.mpf(params.step_length_reduction)),
        feasible_beta_limbs=parse(params.feasible_centering_parameter),
        infeasible_beta_limbs=parse(params.infeasible_centering_parameter),
        primal_error_threshold=1e-10, dual_error_threshold=1e-10,
        max_complementarity=1e30)
    iteration = jax.jit(make_iteration(cfg))
    stats, state = iteration(sdp, state)
    np.asarray(stats.primal_error_P)        # warm-up + compile
    t0 = time.time()
    for _ in range(n_timed):
        stats, state = iteration(sdp, state)
        np.asarray(stats.primal_error_P)    # per-iteration host sync
    return (time.time() - t0) / n_timed


def timing_run(host_sdp, params, pad_to: int = 1, scaled_limbs: int = 0,
               verbosity: int = 1, print_fn=print) -> dict:
    """Measure candidate bucketing policies (2 iterations each) and the
    per-block cost table under the winner.  Returns the record persisted as
    block_timings.json."""
    from ..models.sdp import bucket_key, build_device_sdp

    measured = []
    for policy, quant in CANDIDATES:
        sdp = build_device_sdp(host_sdp, pad_to=pad_to, shape_policy=policy,
                               quant=quant, scaled_limbs=scaled_limbs)
        secs = _time_iterations(sdp, params)
        measured.append({"policy": policy, "quant": quant,
                         "s_per_iteration": secs,
                         "num_buckets": len(sdp.buckets)})
        if verbosity >= 1:
            print_fn(f"timing run: {policy:9s} quant={quant}: "
                     f"{secs * 1e3:.1f} ms/iteration "
                     f"({len(sdp.buckets)} buckets)")
    best = min(measured, key=lambda r: r["s_per_iteration"])

    # per-block cost table: the measured total s/iteration, split over
    # blocks proportionally to the reference's RAM-cost heuristic
    # (read_block_costs.cxx:69-87).  Measuring each bucket separately would
    # compile one extra XLA program per bucket — minutes each on TPU, often
    # exceeding the solve itself — and would only recover uniform costs
    # WITHIN a bucket anyway; the heuristic split is per-block heterogeneous
    # and costs nothing.
    from .planner import block_cost_heuristic

    heur = {b.index: block_cost_heuristic(
        b.dim, b.num_points, b.bases_even.shape[1], b.bases_odd.shape[1],
        host_sdp.dual_dim) for b in host_sdp.blocks}
    total_heur = sum(heur.values()) or 1.0
    scale = best["s_per_iteration"] / total_heur
    block_costs: Dict[str, float] = {
        str(idx): h * scale for idx, h in heur.items()}

    return {"version": 1, "measured": measured,
            "chosen": {"policy": best["policy"], "quant": best["quant"]},
            "block_costs": block_costs}


def load_timings(ck_dir) -> Optional[dict]:
    path = Path(ck_dir) / TIMINGS_FILE
    if not path.exists():
        return None
    try:
        return json.loads(path.read_text())
    except (OSError, json.JSONDecodeError):
        return None


def save_timings(ck_dir, record: dict) -> None:
    ck = Path(ck_dir)
    ck.mkdir(parents=True, exist_ok=True)
    tmp = ck / (TIMINGS_FILE + ".tmp")
    tmp.write_text(json.dumps(record, indent=1))
    import os

    os.replace(tmp, ck / TIMINGS_FILE)


def timing_run_broadcast(host_sdp, params, ck_dir, verbosity: int = 0,
                         scaled_limbs: int = 0,
                         timeout_s: int = 7200) -> dict:
    """Multihost timing run: the COORDINATOR measures, every process
    receives the identical record — the reference's root-decides pattern
    (src/sdpb/main.cxx:50-91 measures and re-allocates; decisions broadcast
    at run/run.cxx:125-126).  Wall-clock measurement on every process would
    fork the SPMD program (each host times differently).

    Distribution rides the coordination-service key-value store rather
    than a collective: a Gloo collective would time out its ~30 s
    rendezvous while the coordinator is still measuring (compiles take
    minutes); the blocking KV get waits up to `timeout_s`."""
    import jax

    key = "sdpb_tpu/block_timings"
    client = None
    try:
        from jax._src import distributed as _dist

        client = _dist.global_state.client
    except (ImportError, AttributeError):  # pragma: no cover - jax internals
        client = None

    if jax.process_index() == 0:
        record = timing_run(host_sdp, params, verbosity=verbosity,
                            scaled_limbs=scaled_limbs)
        if ck_dir is not None:
            save_timings(ck_dir, record)
        payload = json.dumps(record)
        if client is not None:
            client.key_value_set(key, payload)
        return record
    assert client is not None, (
        "multihost timing run requires jax.distributed initialization")
    payload = client.blocking_key_value_get(key, timeout_s * 1000)
    return json.loads(payload)
