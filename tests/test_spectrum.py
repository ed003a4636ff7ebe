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
