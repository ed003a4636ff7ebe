"""Converter tests: pvm2sdp golden-file parity, sdp2input end-to-end,
NSV recursion, measure-orthonormality of the generated bilinear basis."""
import json
import os

import mpmath
import numpy as np
import pytest

PVM_XML = "/root/reference/test/data/pvm2sdp/pvm.xml"
REF_SDP = "/root/reference/test/data/sdp.zip"

TOY_PMP = {
    "objective": ["0", "-1"],
    "normalization": ["1", "0"],
    "PositiveMatrixWithPrefactorArray": [
        {"DampedRational": {
            "constant": "1",
            # 1/e
            "base": "0.36787944117144232159552377016146086744581113103177",
            "poles": []},
         "polynomials": [[[["1", "0", "0", "0", "1"],
                           ["0", "0", "1", "0",
                            "0.083333333333333333333333333333333333333333"]]]]}
    ],
}


@pytest.mark.skipif(not os.path.exists(PVM_XML), reason="no reference data")
def test_pvm2sdp_matches_reference_golden(tmp_path):
    """Converting the toy pvm.xml must reproduce the reference's shipped
    sdp.zip bit-for-bit at 4x53-bit limbs (same sampling formulas)."""
    from sdpb_tpu.cli.pvm2sdp import convert
    from sdpb_tpu.io.sdp_zip import read_sdp

    out = tmp_path / "sdp.zip"
    n = convert([PVM_XML], out, 1024, "json")
    assert n == 1
    K = 4
    ours = read_sdp(out, K, np.float64)
    ref = read_sdp(REF_SDP, K, np.float64)
    np.testing.assert_array_equal(ours.b, ref.b)
    np.testing.assert_array_equal(ours.objective_const, ref.objective_const)
    for a, r in zip(ours.blocks, ref.blocks):
        np.testing.assert_array_equal(a.c, r.c)
        np.testing.assert_array_equal(a.B, r.B)
        np.testing.assert_array_equal(a.bases_even, r.bases_even)
        np.testing.assert_array_equal(a.bases_odd, r.bases_odd)


def test_nsv_recursion(tmp_path):
    from sdpb_tpu.convert.pmp import read_nsv_paths

    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "inner.nsv").write_bytes(b"a.xml\0b.xml\0")
    (tmp_path / "top.nsv").write_bytes(b"sub/inner.nsv\0c.xml\0")
    paths = read_nsv_paths(tmp_path / "top.nsv")
    assert [p.name for p in paths] == ["a.xml", "b.xml", "c.xml"]
    assert paths[0].parent == tmp_path / "sub"


def test_bilinear_basis_orthonormal():
    """q_m from the Gram-Hankel construction must satisfy
    integral q_a q_b dmu = delta_ab for the damped-rational measure."""
    from sdpb_tpu.convert.pmp import _moment, bilinear_basis
    from sdpb_tpu.convert.poly import DampedRational, Polynomial

    with mpmath.workprec(256):
        damped = DampedRational(
            constant=mpmath.mpf(2), base=mpmath.exp(mpmath.mpf(-1)),
            poles=[mpmath.mpf(-1), mpmath.mpf("-0.25")])
        hmd = 3
        basis = bilinear_basis(damped, hmd)
        assert len(basis) == hmd + 1
        for m, q in enumerate(basis):
            assert q.degree == m
        table = [_moment(damped, m) for m in range(2 * hmd + 1)]

        def inner(qa, qb):
            s = mpmath.mpf(0)
            for i, ca in enumerate(qa.coefficients):
                for j, cb in enumerate(qb.coefficients):
                    s += ca * cb * table[i + j]
            return s

        for a in range(hmd + 1):
            for b in range(hmd + 1):
                expect = 1 if a == b else 0
                assert abs(inner(basis[a], basis[b]) - expect) < mpmath.mpf("1e-60")


def test_sdp2input_toy_pmp_solves_to_oracle(tmp_path):
    """Full sdp2input pipeline (own sample points, scalings, ON basis) must
    reach the same optimum as the reference's XML sampling."""
    from sdpb_tpu.cli.sdp2input import convert
    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.solver.params import SolverParameters
    from sdpb_tpu.solver.solve import TerminateReason, run_solver

    pmp = tmp_path / "toy.json"
    pmp.write_text(json.dumps(TOY_PMP))
    out = tmp_path / "sdp.zip"
    convert(pmp, out, 512, "json")

    K = 2
    host = read_sdp(out, K, np.float64)
    sdp = build_device_sdp(host)
    params = SolverParameters(
        precision=96, duality_gap_threshold="1e-15",
        primal_error_threshold="1e-15", dual_error_threshold="1e-15",
        initial_matrix_scale_primal="1e2", initial_matrix_scale_dual="1e2",
        max_iterations=250)
    res = run_solver(sdp, params, verbosity=0)
    assert res.terminate_reason == TerminateReason.PrimalDualOptimal
    with mpmath.workprec(200):
        oracle = mpmath.mpf("1.84026576313204924668804017173055")
        assert abs(res.primal_objective - oracle) < mpmath.mpf("1e-13")


def test_pmp_negative_pole_validation(tmp_path):
    from sdpb_tpu.convert.pmp import read_pmp_input

    bad = dict(TOY_PMP)
    bad["PositiveMatrixWithPrefactorArray"] = [
        {"DampedRational": {"constant": "1", "base": "0.5", "poles": ["2"]},
         "polynomials": [[[["1"], ["1"]]]]}]
    p = tmp_path / "bad.json"
    p.write_text(json.dumps(bad))
    with pytest.raises(ValueError, match="poles must be negative"):
        read_pmp_input(p)


MATHEMATICA_TOY = r"""
(* toy: maximize -y s.t. 1 + x^4 + y(x^4/12 + x^2) >= 0 *)
SDP[{0, -1}, {1, 0},
 {PositiveMatrixWithPrefactor[DampedRational[1.`200, {}, 0.36787944117144232159552377016146086744581113103\
177`200.1, x],
   {{{1 + 1.`200*x^4, x^2 + 8.3333333333333333333333333333333333333333*^-2*x^4}}}]}]
"""


def test_mathematica_parser_toy(tmp_path):
    """Hand-written .m with backtick precision marks, *^ exponents, and
    line continuations parses to the same PMP as the JSON toy."""
    from sdpb_tpu.convert.mathematica import read_pmp_mathematica
    from sdpb_tpu.convert.pmp import read_pmp_input

    with mpmath.workprec(256):
        mfile = tmp_path / "toy.m"
        mfile.write_text(MATHEMATICA_TOY)
        obj, norm, mats = read_pmp_input(mfile)
        assert [float(o) for o in obj] == [0.0, -1.0]
        assert [float(v) for v in norm] == [1.0, 0.0]
        assert len(mats) == 1
        jfile = tmp_path / "toy.json"
        jfile.write_text(json.dumps(TOY_PMP))
        jobj, jnorm, jmats = read_pmp_input(jfile)
        m, jm = mats[0], jmats[0]
        assert abs(m.damped_rational.base - jm.damped_rational.base) < mpmath.mpf("1e-45")
        for pm, pj in zip(m.polynomials[0][0], jm.polynomials[0][0]):
            assert pm.degree == pj.degree
            for cm, cj in zip(pm.coefficients, pj.coefficients):
                assert abs(cm - cj) < mpmath.mpf("1e-38")


def test_mathematica_parser_fixture():
    """The reference's split2.m (461-component normalization, 24 poles,
    line continuations everywhere) parses."""
    import os

    path = "/root/reference/test/data/sdp2input/sdp2input_split2.m"
    if not os.path.exists(path):
        pytest.skip("no reference data")
    from sdpb_tpu.convert.mathematica import read_pmp_mathematica

    with mpmath.workprec(700):
        obj, norm, mats = read_pmp_mathematica(path)
    assert obj == []
    assert len(norm) == 461
    assert len(mats) == 1
    assert len(mats[0].damped_rational.poles) == 24
    assert all(p <= 0 for p in mats[0].damped_rational.poles)
    assert len(mats[0].polynomials[0][0]) == 461


DFIBO = "/root/reference/test/data/end-to-end_tests/dfibo-0-0-j=3-c=3.0000-d=3-s=6"


@pytest.mark.skipif(not os.path.exists(DFIBO), reason="no reference data")
def test_pvm2sdp_dfibo_golden(tmp_path):
    """98-block conversion golden: dfibo's pvm.xml must reproduce its
    shipped sdp.orig.zip bit-for-bit (covers num_points=1 blocks with empty
    odd bilinear bases — the regression case of end-to-end.test.cxx)."""
    from sdpb_tpu.cli.pvm2sdp import convert
    from sdpb_tpu.io.sdp_zip import read_sdp

    out = tmp_path / "dfibo.zip"
    n = convert([f"{DFIBO}/pvm.xml"], out, 1024, "json")
    assert n == 98
    K = 4
    ours = read_sdp(out, K, np.float64)
    ref = read_sdp(f"{DFIBO}/sdp.orig.zip", K, np.float64)
    np.testing.assert_array_equal(ours.b, ref.b)
    for a, r in zip(ours.blocks, ref.blocks):
        np.testing.assert_array_equal(a.c, r.c)
        np.testing.assert_array_equal(a.B, r.B)
        np.testing.assert_array_equal(a.bases_even, r.bases_even)
        np.testing.assert_array_equal(a.bases_odd, r.bases_odd)
