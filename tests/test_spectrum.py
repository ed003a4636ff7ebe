"""spectrum tool: golden-file parity with the reference's shipped
spectrum_orig.json (zeros, lambda, error) at the reference's own test
configuration (1024-bit, threshold 1e-10, PVM format —
test/src/integration_tests/cases/spectrum.test.cxx)."""
import json
import os

import mpmath
import pytest

DATA = "/root/reference/test/data/spectrum"


@pytest.mark.skipif(not os.path.exists(DATA), reason="no reference data")
def test_spectrum_golden(tmp_path):
    from sdpb_tpu.cli.spectrum import main

    out = tmp_path / "spectrum.json"
    rc = main(["--input", f"{DATA}/pvm.xml", "--solution", f"{DATA}/solution",
               "--precision", "1024", "--threshold", "1e-10",
               "--format", "PVM", "--output", str(out)])
    assert rc == 0
    ours = json.loads(out.read_text())
    ref = json.loads(open(f"{DATA}/spectrum_orig.json").read())
    assert len(ours) == len(ref) == 1
    with mpmath.workprec(1100):
        tol = mpmath.mpf("1e-250")
        for o, r in zip(ours, ref):
            assert len(o["zeros"]) == len(r["zeros"])
            for zo, zr in zip(o["zeros"], r["zeros"]):
                assert abs(mpmath.mpf(zo["zero"]) - mpmath.mpf(zr["zero"])) < tol
                assert len(zo["lambda"]) == len(zr["lambda"])
                for lo, lr in zip(zo["lambda"], zr["lambda"]):
                    assert abs(mpmath.mpf(lo) - mpmath.mpf(lr)) < tol
            assert abs(mpmath.mpf(o["error"]) - mpmath.mpf(r["error"])) < tol


def test_mesh_zero_finding():
    """Adaptive mesh + quadratic fit locates a double root."""
    from sdpb_tpu.tools.mesh import Mesh, get_zeros

    with mpmath.workprec(200):
        root = mpmath.mpf("1.75")

        def fn(x):
            return (x - root) ** 2 * (1 + x)

        mesh = Mesh.create(mpmath.mpf(0), mpmath.mpf(6), fn,
                           mpmath.mpf("0.001"), mpmath.mpf("1e-50"))
        zeros = get_zeros(mesh, mpmath.mpf("1e-10"))
        assert len(zeros) == 1
        assert abs(zeros[0] - root) < mpmath.mpf("1e-6")


TOY_PMP = {
    "objective": ["0", "-1"],
    "normalization": ["1", "0"],
    "PositiveMatrixWithPrefactorArray": [
        {"DampedRational": {
            "constant": "1",
            "base": "0.36787944117144232159552377016146086744581113103177",
            "poles": []},
         "polynomials": [[[["1", "0", "0", "0", "1"],
                           ["0", "0", "1", "0",
                            "0.083333333333333333333333333333333333333333"]]]]}
    ],
}


def test_spectrum_pmp_format(tmp_path):
    """PMP-format spectrum: solve the toy PMP, extract the operator zero,
    and check it against the independently computed double-root location
    of the optimal functional (x0 = 1.0424967857181581...)."""
    import json as _json

    import numpy as np

    from sdpb_tpu.cli.sdp2input import convert
    from sdpb_tpu.cli.spectrum import main as spectrum_main
    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.io.solution import WriteSolution, save_solution
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.solver.params import SolverParameters
    from sdpb_tpu.solver.solve import TerminateReason, run_solver

    pmp = tmp_path / "toy.json"
    pmp.write_text(_json.dumps(TOY_PMP))
    sdp_zip = tmp_path / "sdp.zip"
    convert(pmp, sdp_zip, 512, "json")

    K = 2
    host = read_sdp(sdp_zip, K, np.float64)
    sdp = build_device_sdp(host)
    params = SolverParameters(
        precision=96, duality_gap_threshold="1e-15",
        primal_error_threshold="1e-15", dual_error_threshold="1e-15",
        initial_matrix_scale_primal="1e2", initial_matrix_scale_dual="1e2",
        max_iterations=250)
    res = run_solver(sdp, params, verbosity=0)
    assert res.terminate_reason == TerminateReason.PrimalDualOptimal
    sol = tmp_path / "out"
    save_solution(sol, res, sdp, WriteSolution(True, True, False, False),
                  verbosity=0)

    out = tmp_path / "spectrum.json"
    rc = spectrum_main([
        "--input", str(pmp), "--solution", str(sol),
        "--precision", "96", "--threshold", "1e-8",
        "--format", "PMP", "--output", str(out)])
    assert rc == 0
    doc = json.loads(out.read_text())
    assert len(doc) == 1 and len(doc[0]["zeros"]) == 1
    with mpmath.workprec(200):
        zero = mpmath.mpf(doc[0]["zeros"][0]["zero"])
        x0 = mpmath.mpf("1.042496785718158120984007")
        assert abs(zero - x0) < mpmath.mpf("1e-5"), mpmath.nstr(zero, 12)
