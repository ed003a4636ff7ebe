#!/usr/bin/env python
"""Benchmark: IPM iterations/s on the reference toy SDP (single chip).

Runs the full jitted predictor-corrector iteration (the solver hot loop —
everything in /root/reference/src/sdp_solve/SDP_Solver/run/run.cxx:113-183)
on the shipped toy problem at ~115-bit working precision and reports
steady-state iterations/s, excluding compilation.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "iterations/s", "vs_baseline": N}

vs_baseline: ratio to BASELINE.json published["toy_ipm_iterations_per_s"]
when present (reference numbers are not published in-tree; see BASELINE.md),
else 1.0.
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
    # K=2 limbs: double-double (106 bits) on CPU f64, 48 bits on TPU f32.
    # Higher K inflates XLA compile ~K^2 until the MP primitives are Pallas
    # kernels; throughput is timed per-iteration so precision does not
    # change the measured loop cost structure.
    K = 2

    if os.path.exists(REFERENCE_SDP):
        host = read_sdp(REFERENCE_SDP, K, np_dtype)
        workload = "toy sdp.zip"
    else:
        host = random_sdp(num_blocks=1, dim=1, num_points=5, dual_dim=1,
                          K=K, np_dtype=np_dtype)
        workload = "synthetic toy"

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

    baseline = None
    try:
        with open(os.path.join(REPO, "BASELINE.json")) as f:
            baseline = json.load(f).get("published", {}).get("toy_ipm_iterations_per_s")
    except Exception:
        pass
    vs_baseline = (its_per_s / baseline) if baseline else 1.0

    print(json.dumps({
        "metric": f"ipm_iterations_per_s[{workload}, {platform}, K={K} {np_dtype.__name__} limbs]",
        "value": round(its_per_s, 3),
        "unit": "iterations/s",
        "vs_baseline": round(vs_baseline, 3),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
