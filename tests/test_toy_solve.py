"""End-to-end solve of the reference's toy SDP (test/data/sdp.zip:
maximize -y s.t. 1 + x^4 + y(x^4/12 + x^2) >= 0 for x >= 0).

Oracle: /root/reference/test/data/sdpb/test_out_orig/out.txt —
  terminateReason = "found primal-dual optimal solution"
  primalObjective = 1.840265763132049246688040171730...
  dualityGap ~ 3.6e-31 at 1024-bit GMP.

With ~106-212-bit MP arithmetic we require the objective to match to the
duality-gap threshold we can reach.
"""
import os
from pathlib import Path

import mpmath
import numpy as np
import pytest

REFERENCE_SDP = "/root/reference/test/data/sdp.zip"
ORACLE_PRIMAL = mpmath.mpf("1.84026576313204924668804017173055")


@pytest.mark.skipif(not os.path.exists(REFERENCE_SDP), reason="no reference data")
@pytest.mark.parametrize("precision,gap_threshold", [(96, "1e-25")])
def test_toy_solve(precision, gap_threshold):
    import jax.numpy as jnp

    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.solver.params import SolverParameters
    from sdpb_tpu.solver.solve import run_solver, TerminateReason
    from sdpb_tpu.utils.platform import limbs_for_precision

    K = limbs_for_precision(precision, jnp.float64)
    sdp_host = read_sdp(REFERENCE_SDP, K, np.float64)
    assert sdp_host.num_blocks == 1
    assert sdp_host.dual_dim == 1
    sdp = build_device_sdp(sdp_host)

    params = SolverParameters(
        precision=precision,
        duality_gap_threshold=gap_threshold,
        primal_error_threshold="1e-25",
        dual_error_threshold="1e-25",
        max_iterations=200,
    )
    result = run_solver(sdp, params, verbosity=0)

    assert result.terminate_reason == TerminateReason.PrimalDualOptimal, (
        result.terminate_reason, result.iterations)
    with mpmath.workprec(200):
        err = abs(result.primal_objective - ORACLE_PRIMAL)
        assert err < mpmath.mpf("1e-20"), (
            f"primalObjective {mpmath.nstr(result.primal_objective, 35)} vs oracle, "
            f"err {mpmath.nstr(err, 3)}")
        err_d = abs(result.dual_objective - ORACLE_PRIMAL)
        assert err_d < mpmath.mpf("1e-20")
    assert result.duality_gap < mpmath.mpf(gap_threshold)
