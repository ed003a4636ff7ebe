"""KKT solve-residual guard (round 5): the detector for the factor-sizing
law's SILENT failure mode — an under-ranged factor degrades the trajectory
with every stat finite (solver/solve.py::initial_factor_limbs docstring;
observed live on nmax6 at 96 bits in round 4).

The guard measures max_blocks ||S u - rhs|| / ||rhs|| of the Schur solves
at full precision each iteration; a trip raises the same self-heal as a
non-finite stat (factor bump + replay) while the factor is below its cap,
and a loud warning at the cap."""
import numpy as np

TOY = "/root/reference/test/data/sdp.zip"


def _solve(kkt_threshold: str, factor_limbs: int, max_iterations: int = 40):
    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.solver.params import SolverParameters
    from sdpb_tpu.solver.solve import run_solver

    K = 3
    host = read_sdp(TOY, K, np.float64)
    sdp = build_device_sdp(host)
    params = SolverParameters(
        precision=159, duality_gap_threshold="1e-10",
        primal_error_threshold="1e-10", dual_error_threshold="1e-10",
        initial_matrix_scale_primal="1e2", initial_matrix_scale_dual="1e2",
        max_iterations=max_iterations, factor_limbs=factor_limbs,
        kkt_residual_threshold=kkt_threshold)
    lines = []
    res = run_solver(sdp, params, verbosity=1,
                     print_fn=lambda *a: lines.append(" ".join(map(str, a))))
    return res, "\n".join(lines)


def test_healthy_solve_residual_below_threshold():
    """A well-sized factor keeps the measured residual far below the
    default 1e-2 threshold: the guard must NOT fire (no heal lines), and
    the solve completes normally."""
    from sdpb_tpu.solver.solve import TerminateReason

    res, log = _solve(kkt_threshold="1e-2", factor_limbs=2)
    assert res.terminate_reason == TerminateReason.PrimalDualOptimal
    assert "increasing factor precision" not in log
    assert "WARNING: KKT" not in log


def test_guard_fires_and_self_heals():
    """With the threshold forced below the healthy residual level, the
    guard must TRIP (the REASON_RETRY path), bump the factor exactly as a
    non-finite stat would, and the solve must still complete once the
    factor reaches its cap (where the guard demotes to a warning) —
    proving the silent-mode detector is wired through the whole heal
    machinery."""
    from sdpb_tpu.solver.solve import TerminateReason

    res, log = _solve(kkt_threshold="1e-60", factor_limbs=2)
    assert "increasing factor precision" in log          # the trip healed
    # at the cap the guard warns instead of spinning
    assert "WARNING: KKT" in log
    assert res.terminate_reason == TerminateReason.PrimalDualOptimal, (
        res.terminate_reason, log[-400:])


def test_guard_disabled_by_zero_threshold():
    from sdpb_tpu.solver.solve import TerminateReason

    res, log = _solve(kkt_threshold="0", factor_limbs=2)
    assert res.terminate_reason == TerminateReason.PrimalDualOptimal
    assert "increasing factor precision" not in log
