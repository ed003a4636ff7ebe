"""End-to-end oracle: the reference's SingletScalar_cT_test_nmax6 CI
fixture (realistic nmax=6 bootstrap SDP, 11 blocks, N=20).

The reference solves it at 768 bits to gap 9e-31
(test/data/end-to-end_tests/.../out/out.txt); here we run 212 bits
(K=4 f64) at Omega=1e10 to gap 1e-12, which its published objective must
match to ~12 digits.  ~35 min on this machine's single CPU core -> slow."""
import os

import mpmath
import numpy as np
import pytest

FIXTURE = ("/root/reference/test/data/end-to-end_tests/"
           "SingletScalar_cT_test_nmax6/primal_dual_optimal/sdp.orig.zip")
ORACLE = mpmath.mpf("-0.283884666328349913107791200043437245362902095745491")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="no reference data")
def test_singlet_scalar_nmax6():
    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.solver.params import SolverParameters
    from sdpb_tpu.solver.solve import TerminateReason, run_solver

    K = 4
    host = read_sdp(FIXTURE, K, np.float64)
    assert host.num_blocks == 11 and host.dual_dim == 20
    sdp = build_device_sdp(host)
    params = SolverParameters(
        precision=212,
        duality_gap_threshold="1e-12",
        primal_error_threshold="1e-12", dual_error_threshold="1e-12",
        initial_matrix_scale_primal="1e10", initial_matrix_scale_dual="1e10",
        max_iterations=300)
    res = run_solver(sdp, params, verbosity=0)
    assert res.terminate_reason == TerminateReason.PrimalDualOptimal, (
        res.terminate_reason, res.iterations)
    with mpmath.workprec(300):
        assert abs(res.primal_objective - ORACLE) < mpmath.mpf("1e-11"), \
            mpmath.nstr(res.primal_objective, 20)
        assert abs(res.dual_objective - ORACLE) < mpmath.mpf("1e-11")


JUMP_FIXTURE = ("/root/reference/test/data/end-to-end_tests/"
                "SingletScalarAllowed_test_nmax6/dual_feasible_jump/"
                "sdp.orig.zip")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(JUMP_FIXTURE), reason="no reference data")
def test_singlet_scalar_allowed_dual_feasible_jump():
    """The reference's feasible-jump fixture: with --detectDualFeasibleJump
    the solve must terminate 'dual feasible jump detected' when a dual step
    hits 1, at the published objective (oracle out/out.txt; the reference
    test config is end-to-end.test.cxx:159-167).  ~8 min single-core."""
    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.solver.params import SolverParameters
    from sdpb_tpu.solver.solve import TerminateReason, run_solver

    K = 4
    host = read_sdp(JUMP_FIXTURE, K, np.float64)
    sdp = build_device_sdp(host)
    params = SolverParameters(
        precision=212,
        duality_gap_threshold="1e-30",
        primal_error_threshold="1e-200", dual_error_threshold="1e-200",
        initial_matrix_scale_primal="1e20", initial_matrix_scale_dual="1e20",
        detect_primal_feasible_jump=True, detect_dual_feasible_jump=True,
        max_iterations=200)
    res = run_solver(sdp, params, verbosity=0)
    assert res.terminate_reason == TerminateReason.DualFeasibleJumpDetected, (
        res.terminate_reason, res.iterations)
    with mpmath.workprec(200):
        oracle = mpmath.mpf("-8840353.8076005652934424333782332173811931")
        assert abs(res.primal_objective - oracle) < mpmath.mpf("1e-6")


PRIMAL_JUMP_FIXTURE = ("/root/reference/test/data/end-to-end_tests/"
                       "SingletScalarAllowed_test_nmax6/primal_feasible_jump/"
                       "sdp.orig.zip")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(PRIMAL_JUMP_FIXTURE),
                    reason="no reference data")
def test_singlet_scalar_allowed_primal_feasible_jump():
    """Primal-jump variant: terminates 'primal feasible jump detected' at
    the published objective (~1e23 scale, matched to 14 digits)."""
    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.solver.params import SolverParameters
    from sdpb_tpu.solver.solve import TerminateReason, run_solver

    K = 4
    host = read_sdp(PRIMAL_JUMP_FIXTURE, K, np.float64)
    sdp = build_device_sdp(host)
    params = SolverParameters(
        precision=212,
        duality_gap_threshold="1e-30",
        primal_error_threshold="1e-200", dual_error_threshold="1e-200",
        initial_matrix_scale_primal="1e20", initial_matrix_scale_dual="1e20",
        detect_primal_feasible_jump=True, detect_dual_feasible_jump=True,
        max_iterations=200)
    res = run_solver(sdp, params, verbosity=0)
    assert res.terminate_reason == TerminateReason.PrimalFeasibleJumpDetected, (
        res.terminate_reason, res.iterations)
    with mpmath.workprec(200):
        oracle = mpmath.mpf("-79110084952780525272758.683656979215875949714")
        assert abs(res.primal_objective - oracle) < abs(oracle) * mpmath.mpf("1e-12")


DFIBO_FIXTURE = ("/root/reference/test/data/end-to-end_tests/"
                 "dfibo-0-0-j=3-c=3.0000-d=3-s=6/sdp.orig.zip")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(DFIBO_FIXTURE), reason="no reference data")
def test_dfibo_find_primal_feasible():
    """dfibo (98 blocks incl. num_points=1): --findPrimalFeasible
    --findDualFeasible must terminate 'found primal feasible solution'
    (the reference's outcome; the feasible point itself is
    trajectory/precision dependent, so only the reason is asserted)."""
    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.solver.params import SolverParameters
    from sdpb_tpu.solver.solve import TerminateReason, run_solver

    K = 4
    host = read_sdp(DFIBO_FIXTURE, K, np.float64)
    assert host.num_blocks == 98
    sdp = build_device_sdp(host)
    assert len(sdp.buckets) == 1  # np=1 and np=4 share a quantized bucket
    params = SolverParameters(
        precision=212, find_primal_feasible=True, find_dual_feasible=True,
        duality_gap_threshold="1e-30", primal_error_threshold="1e-30",
        dual_error_threshold="1e-30",
        initial_matrix_scale_primal="1e20", initial_matrix_scale_dual="1e20",
        max_iterations=300)
    res = run_solver(sdp, params, verbosity=0)
    assert res.terminate_reason == TerminateReason.PrimalFeasible, (
        res.terminate_reason, res.iterations)
    assert res.primal_error_P < 1e-30
