"""End-to-end solve of the reference's toy SDP (test/data/sdp.zip:
maximize -y s.t. 1 + x^4 + y(x^4/12 + x^2) >= 0 for x >= 0).

Oracle: /root/reference/test/data/sdpb/test_out_orig/out.txt —
  terminateReason = "found primal-dual optimal solution"
  primalObjective = 1.840265763132049246688040171730...
  dualityGap ~ 3.6e-31 at 1024-bit GMP.

Conditioning along the IPM path scales with initialMatrixScale (the
objectives transiently reach ~Omega*1e4 before feasibility), so the
required precision grows with Omega: the reference's default Omega=1e20
needs ~200 bits (verified: f64 K=4 converges in 152 iterations and
matches the oracle to 24 digits).  The quick test below uses a smaller
Omega so double-double (K=2) suffices; the full-oracle run is marked slow.
"""
import os

import mpmath
import numpy as np
import pytest

REFERENCE_SDP = "/root/reference/test/data/sdp.zip"
ORACLE_PRIMAL = mpmath.mpf("1.84026576313204924668804017173055")


def _solve(precision, omega, gap_threshold, err_threshold, max_iterations=250):
    import jax.numpy as jnp

    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.solver.params import SolverParameters
    from sdpb_tpu.solver.solve import run_solver
    from sdpb_tpu.utils.platform import limbs_for_precision

    K = limbs_for_precision(precision, jnp.float64)
    sdp_host = read_sdp(REFERENCE_SDP, K, np.float64)
    assert sdp_host.num_blocks == 1 and sdp_host.dual_dim == 1
    sdp = build_device_sdp(sdp_host)
    params = SolverParameters(
        precision=precision,
        duality_gap_threshold=gap_threshold,
        primal_error_threshold=err_threshold,
        dual_error_threshold=err_threshold,
        initial_matrix_scale_primal=omega,
        initial_matrix_scale_dual=omega,
        max_iterations=max_iterations,
    )
    return run_solver(sdp, params, verbosity=0)


@pytest.mark.skipif(not os.path.exists(REFERENCE_SDP), reason="no reference data")
def test_toy_solve_quick():
    from sdpb_tpu.solver.solve import TerminateReason

    result = _solve(96, "1e2", "1e-15", "1e-15")
    assert result.terminate_reason == TerminateReason.PrimalDualOptimal, (
        result.terminate_reason, result.iterations)
    with mpmath.workprec(200):
        assert abs(result.primal_objective - ORACLE_PRIMAL) < mpmath.mpf("1e-13")
        assert abs(result.dual_objective - ORACLE_PRIMAL) < mpmath.mpf("1e-13")
    assert result.duality_gap < mpmath.mpf("1e-15")
    assert result.iterations < 60


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(REFERENCE_SDP), reason="no reference data")
def test_toy_solve_full_oracle():
    """Reference defaults (Omega=1e20) at 212-bit precision: must reproduce
    the published objective to ~20 digits."""
    from sdpb_tpu.solver.solve import TerminateReason

    result = _solve(200, "1e20", "1e-25", "1e-25")
    assert result.terminate_reason == TerminateReason.PrimalDualOptimal
    with mpmath.workprec(300):
        assert abs(result.primal_objective - ORACLE_PRIMAL) < mpmath.mpf("1e-20")
    assert result.duality_gap < mpmath.mpf("1e-25")
