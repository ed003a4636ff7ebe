"""dim-2 PMP end-to-end with an INDEPENDENT optimality certificate.

No reference fixture solves a dim>1 block (they are all 1x1), so correct-
ness of the matrix path (pair ordering, Schur swaps, block-diagonal bases)
is certified here without a solver oracle: for

    maximize -y  s.t.  M(x) = [[t(x), y s(x)], [y s(x), t(x)]] >= 0,
    t(x) = 1 + x^4 + y (x^4/12 + x^2),  s(x) = x^2/10,

the eigenvalues are t +- y s, so the feasibility boundary in y is computed
independently in mpmath by bisection on min_x (t - |y| s) (ternary-search
refined).  At 300 bits that boundary is

    y_opt = -1.68565077061960465752647...

and the solver must reproduce it to its duality-gap accuracy."""
import json
import os

import mpmath
import numpy as np
import pytest

PMP = {
    "objective": ["0", "-1"],
    "normalization": ["1", "0"],
    "PositiveMatrixWithPrefactorArray": [
        {"DampedRational": {
            "constant": "1",
            "base": "0.36787944117144232159552377016146086744581113103177",
            "poles": []},
         "polynomials": [
             [  # row 0
                 [["1", "0", "0", "0", "1"],
                  ["0", "0", "1", "0",
                   "0.083333333333333333333333333333333333333333"]],
                 [["0"], ["0", "0", "0.1"]],
             ],
             [  # row 1
                 [["0"], ["0", "0", "0.1"]],
                 [["1", "0", "0", "0", "1"],
                  ["0", "0", "1", "0",
                   "0.083333333333333333333333333333333333333333"]],
             ],
         ]}
    ],
}

# independent 300-bit bisection of min_x lambda_min((1,y).M(x)) = 0
Y_OPT = "-1.685650770619604657526474"


def _margin(y):
    """min over x >= 0 of lambda_min((1,y).M(x)) = t - |y| x^2/10."""
    def f(x):
        t = 1 + x ** 4 + y * (x ** 4 / 12 + x ** 2)
        return t - abs(y) * x ** 2 / 10

    xs = [mpmath.mpf(3) * i / 2000 for i in range(2001)]
    vals = [f(x) for x in xs]
    i = min(range(len(vals)), key=lambda j: vals[j])
    a, b = xs[max(0, i - 1)], xs[min(len(xs) - 1, i + 1)]
    for _ in range(150):
        m1 = a + (b - a) / 3
        m2 = b - (b - a) / 3
        if f(m1) < f(m2):
            b = m2
        else:
            a = m1
    return f((a + b) / 2)


@pytest.mark.slow
def test_dim2_solve_with_certificate(tmp_path):
    from sdpb_tpu.cli.sdp2input import convert
    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.solver.params import SolverParameters
    from sdpb_tpu.solver.solve import TerminateReason, run_solver
    from sdpb_tpu.utils.strings import limbs_to_mpf

    pmp = tmp_path / "dim2.json"
    pmp.write_text(json.dumps(PMP))
    out = tmp_path / "sdp.zip"
    convert(pmp, out, 400, "json")

    K = 3
    host = read_sdp(out, K, np.float64)
    assert host.blocks[0].dim == 2
    sdp = build_device_sdp(host)
    params = SolverParameters(
        precision=150, duality_gap_threshold="1e-12",
        primal_error_threshold="1e-12", dual_error_threshold="1e-12",
        initial_matrix_scale_primal="1e2", initial_matrix_scale_dual="1e2",
        max_iterations=250)
    res = run_solver(sdp, params, verbosity=0)
    assert res.terminate_reason == TerminateReason.PrimalDualOptimal

    with mpmath.workprec(300):
        y_star = limbs_to_mpf(np.asarray(res.state.y.limbs)[:, 0])
        # matches the independently computed boundary to the gap accuracy
        assert abs(y_star - mpmath.mpf(Y_OPT)) < mpmath.mpf("1e-10"), y_star
        # and the coupling genuinely binds (differs from the 1x1 toy)
        assert abs(y_star + mpmath.mpf("1.840265763132")) > mpmath.mpf("1e-3")
        # functional feasible at y*, infeasible one gap-width beyond
        assert _margin(y_star) > mpmath.mpf("-1e-9")
        assert _margin(y_star - mpmath.mpf("1e-6")) < 0
