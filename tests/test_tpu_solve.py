"""End-to-end solve on the REAL TPU with float32 limbs (the production
compute path; the rest of the suite pins CPU/float64).

float32 limbs carry ~24 bits each but only ~10^±38 of exponent range, so
limb tails below ~1e-38 flush and the practically reachable duality gap on
TPU is ~1e-12 at K=5 (observed: the toy converges to gap 1.7e-13 before
the tails die).  The test targets 1e-10 with margin."""
import os
import subprocess
import sys

import pytest

SCRIPT = r"""
import jax
if jax.default_backend() == "cpu":
    print("NO_TPU"); raise SystemExit(0)
import numpy as np, mpmath
from sdpb_tpu.io.sdp_zip import read_sdp
from sdpb_tpu.models.sdp import build_device_sdp
from sdpb_tpu.solver.params import SolverParameters
from sdpb_tpu.solver.solve import TerminateReason, run_solver

K = 5  # ~115 bits of float32 limbs
host = read_sdp("/root/reference/test/data/sdp.zip", K, np.float32)
sdp = build_device_sdp(host)
params = SolverParameters(
    precision=110, duality_gap_threshold="1e-10",
    primal_error_threshold="1e-10", dual_error_threshold="1e-10",
    initial_matrix_scale_primal="1e2", initial_matrix_scale_dual="1e2",
    max_iterations=200)
res = run_solver(sdp, params, verbosity=0)
assert res.terminate_reason == TerminateReason.PrimalDualOptimal, (
    str(res.terminate_reason), res.iterations)
with mpmath.workprec(200):
    oracle = mpmath.mpf("1.84026576313204924668804017173055")
    err = abs(res.primal_objective - oracle)
    assert err < mpmath.mpf("1e-9"), mpmath.nstr(res.primal_objective, 16)
print("OK", mpmath.nstr(err, 3))
"""


@pytest.mark.slow
def test_toy_solve_on_tpu_f32_limbs():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    result = subprocess.run([sys.executable, "-c", SCRIPT], env=env,
                            capture_output=True, text=True, timeout=1200)
    out = result.stdout.strip().splitlines()
    if result.returncode == 0 and out and out[-1] == "NO_TPU":
        pytest.skip("no TPU backend available")
    assert result.returncode == 0, result.stdout[-2000:] + result.stderr[-2000:]
    assert out and out[-1].startswith("OK"), result.stdout + result.stderr
