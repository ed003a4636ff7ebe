#!/usr/bin/env python
"""Benchmark: IPM iterations/s on a 3D-Ising-class workload (single chip).

Runs the full jitted predictor-corrector iteration (the solver hot loop —
everything in /root/reference/src/sdp_solve/SDP_Solver/run/run.cxx:113-183)
on a synthetic problem at production scale (200 blocks, 48 sample
points, dual dimension 100 — the 3D-Ising configuration class of
BASELINE.json) and reports steady-state iterations/s, excluding
compilation.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "iterations/s", "vs_baseline": N}

vs_baseline: ratio to the reference's CI anchor for the real fixture
(39 s solve on 6 ranks at 768 bits; see BASELINE.md).  The metric label
carries the working precision (K=5 f32 limbs ~= 115 bits on TPU) so rounds
stay comparable.
"""
import json
import os
import sys
import time

REFERENCE_SDP = "/root/reference/test/data/sdp.zip"
REPO = os.path.dirname(os.path.abspath(__file__))


def main():
    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sdpb_tpu.utils import platform as plat

    platform = jax.devices()[0].platform
    if platform == "cpu":
        # CPU path requires strict-FP codegen; only effective pre-init, so
        # re-exec if the flag is missing (bench is normally run on TPU).
        flags = os.environ.get("XLA_FLAGS", "")
        if "--xla_cpu_use_fusion_emitters=false" not in flags:
            os.environ["XLA_FLAGS"] = (flags + " --xla_cpu_use_fusion_emitters=false").strip()
            os.execv(sys.executable, [sys.executable] + sys.argv)

    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.models.synthetic import random_sdp
    from sdpb_tpu.solver.state import initial_state
    from sdpb_tpu.solver.step import StepConfig, make_iteration
    from sdpb_tpu.utils.strings import str_to_limbs

    dtype = plat.default_base_dtype()
    np_dtype = np.float32 if dtype == jnp.float32 else np.float64
    # K=5 float32 limbs on TPU ~= 115 bits (the double-double-class
    # working precision of BASELINE.json); K=2 float64 on CPU (106 bits).
    # TPU compile at K=5 is ~4 min (scan-deduped iteration + Pallas matmul).
    K = 5 if np_dtype == np.float32 else 2

    # nmax6-class workload: the shape profile of the reference's
    # SingletScalar_cT_test_nmax6 fixture (11 blocks, num_points up to 31,
    # dual dimension 20) — big enough to exercise the Pallas matmul path.
    host = random_sdp(num_blocks=200, dim=1, num_points=48, dual_dim=100,
                      K=K, np_dtype=np_dtype)
    workload = "3D-Ising-class synthetic (200 blocks, np=48, N=100)"

    sdp = build_device_sdp(host)
    omega = str_to_limbs("1e2", K, np_dtype)
    state = initial_state(sdp, omega, omega)
    cfg = StepConfig(
        total_psd_rows=sdp.total_psd_rows, axis=None, gamma=0.7,
        feasible_beta_limbs=str_to_limbs("0.1", K, np_dtype),
        infeasible_beta_limbs=str_to_limbs("0.3", K, np_dtype),
        primal_error_threshold=1e-15, dual_error_threshold=1e-15,
        max_complementarity=1e30)
    iteration = jax.jit(make_iteration(cfg))

    t0 = time.time()
    stats, state = iteration(sdp, state)
    jax.block_until_ready(state)
    compile_s = time.time() - t0

    # steady state: chain iterations without host sync
    warm = 2
    for _ in range(warm):
        stats, state = iteration(sdp, state)
    jax.block_until_ready(state)
    n = 10
    t0 = time.time()
    for _ in range(n):
        stats, state = iteration(sdp, state)
    jax.block_until_ready(state)
    elapsed = time.time() - t0
    its_per_s = n / elapsed

    # reference anchor: SDPB's CI solves its nmax6 fixture (an ~18x
    # smaller problem than this workload) in 39 s on 6 CPU ranks at 768
    # bits ~= 2.8 it/s; kept as the in-tree anchor until a measured
    # 3D-Ising baseline exists (BASELINE.md).
    baseline = None
    try:
        with open(os.path.join(REPO, "BASELINE.json")) as f:
            baseline = json.load(f).get("published", {}).get(
                "nmax6_ipm_iterations_per_s", 2.8)
    except Exception:
        baseline = 2.8
    vs_baseline = (its_per_s / baseline) if baseline else 1.0

    print(json.dumps({
        "metric": f"ipm_iterations_per_s[{workload}, {platform}, K={K} {np_dtype.__name__} limbs]",
        "value": round(its_per_s, 3),
        "unit": "iterations/s",
        "vs_baseline": round(vs_baseline, 3),
        "compile_s": round(compile_s, 1),
        "baseline_note": "SDPB CI: real nmax6 fixture in 39 s on 6 ranks at 768 bits (~110 iters, estimated)",
    }))


if __name__ == "__main__":
    main()
