"""outer_limits: golden parity with the reference's toy_functions fixture
(test/data/outer_limits/, oracle toy_functions_out_orig.json at its own
128-bit / gap-1e-10 test configuration)."""
import json
import os

import mpmath
import pytest

DATA = "/root/reference/test/data/outer_limits"


@pytest.mark.skipif(not os.path.exists(DATA), reason="no reference data")
def test_outer_limits_toy_golden(tmp_path):
    from sdpb_tpu.cli.outer_limits import main

    out = tmp_path / "out.json"
    rc = main([
        "--functions", f"{DATA}/toy_functions.json",
        "--points", f"{DATA}/toy_functions_points.json",
        "--out", str(out), "--precision", "128",
        "--dualityGapThreshold", "1e-10",
        "--primalErrorThreshold", "1e-10", "--dualErrorThreshold", "1e-10",
        "--initialMatrixScalePrimal", "10", "--initialMatrixScaleDual", "10",
        "--maxIterations", "1000", "--verbosity", "0"])
    assert rc == 0
    ours = json.loads(out.read_text())
    ref = json.loads(open(f"{DATA}/toy_functions_out_orig.json").read())
    with mpmath.workprec(256):
        # converged to the oracle within the 1e-10 duality-gap tolerance's
        # actual accuracy (~1e-20 for this problem)
        diff = abs(mpmath.mpf(ours["optimal"]) - mpmath.mpf(ref["optimal"]))
        assert diff < mpmath.mpf("1e-18"), ours["optimal"]
        for a, b in zip(ours["y"], ref["y"]):
            assert abs(mpmath.mpf(a) - mpmath.mpf(b)) < mpmath.mpf("1e-18")


def test_functions_roundtrip(tmp_path):
    """values -> coeffs -> Clenshaw evaluation reproduces a polynomial."""
    from sdpb_tpu.convert.poly import Polynomial
    from sdpb_tpu.tools.functions import (Function, chebyshev_points,
                                          values_to_coeffs)

    with mpmath.workprec(200):
        poly = Polynomial([mpmath.mpf(v) for v in ("1", "-2", "0.5", "3")])
        max_delta = mpmath.mpf(10)
        pts = chebyshev_points(6, max_delta)
        values = [poly(x) for x in pts]
        f = Function(max_delta=max_delta, epsilon_value=poly(0),
                     infinity_value=mpmath.mpf(3),
                     chebyshev_coeffs=values_to_coeffs(values))
        for x in (mpmath.mpf("0.37"), mpmath.mpf(5), mpmath.mpf("9.9")):
            assert abs(f.eval(-1, -2, x) - poly(x)) < mpmath.mpf("1e-45")
