"""WriteBootstrapSDP front-end: PMP -> PVM XML -> pvm2sdp must agree with
the direct PMP reduction (the sdp2input path) — the two entry pipelines of
the reference (mathematica/SDPB.m:111-127 + pvm2sdp vs sdp2input) land on
the same SDP."""
import mpmath
import numpy as np

from sdpb_tpu.convert.pmp import reduce_pmp
from sdpb_tpu.convert.poly import (DampedRational, Polynomial,
                                   PositiveMatrixWithPrefactor)


def _toy_pmp():
    # maximize b.y with one 1x1 PMP block; vectors of length 2
    damped = DampedRational(constant=mpmath.mpf(2),
                            base=mpmath.exp(mpmath.mpf(-1)),
                            poles=[mpmath.mpf(-1), mpmath.mpf("-0.25")])
    p0 = Polynomial([mpmath.mpf(1), mpmath.mpf(0), mpmath.mpf("0.5")])
    p1 = Polynomial([mpmath.mpf("0.125"), mpmath.mpf(3)])
    mat = PositiveMatrixWithPrefactor(
        damped_rational=damped, polynomials=[[[p0, p1]]])
    objective = [mpmath.mpf(1), mpmath.mpf(-2)]
    normalization = [mpmath.mpf(1), mpmath.mpf("0.5")]
    return objective, normalization, [mat]


def test_xml_roundtrip_matches_direct_reduction(tmp_path):
    from sdpb_tpu.convert.xml_input import read_pvm_xml
    from sdpb_tpu.tools.write_bootstrap_sdp import write_bootstrap_sdp

    with mpmath.workprec(200):
        objective, normalization, mats = _toy_pmp()
        const, b, pvms = reduce_pmp(objective, normalization, mats)
        xml = tmp_path / "problem.xml"
        write_bootstrap_sdp(xml, objective, normalization, mats)
        obj2, pvms2 = read_pvm_xml(xml)

        tol = mpmath.mpf(10) ** -55
        assert abs(obj2[0] - const) < tol
        assert len(obj2) == 1 + len(b)
        for g, e in zip(obj2[1:], b):
            assert abs(g - e) <= tol * max(1, abs(e))
        assert len(pvms2) == len(pvms) == 1
        g, e = pvms2[0], pvms[0]
        assert (g.rows, g.cols) == (e.rows, e.cols)
        for gp, ep in zip(g.sample_points, e.sample_points):
            assert abs(gp - ep) <= tol * max(1, abs(ep))
        for gs, es in zip(g.sample_scalings, e.sample_scalings):
            assert abs(gs - es) <= tol * max(1, abs(es))
        for gq, eq in zip(g.bilinear_basis, e.bilinear_basis):
            for gc, ec in zip(gq.coefficients, eq.coefficients):
                assert abs(gc - ec) <= tol * max(1, abs(ec))
        for gv, ev in zip(g.elements, e.elements):
            for gp_, ep_ in zip(gv, ev):
                for gc, ec in zip(gp_.coefficients, ep_.coefficients):
                    assert abs(gc - ec) <= tol * max(1, abs(ec))


def test_xml_converts_to_sdp_zip(tmp_path):
    from sdpb_tpu.cli.pvm2sdp import convert
    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.tools.write_bootstrap_sdp import write_bootstrap_sdp

    with mpmath.workprec(200):
        objective, normalization, mats = _toy_pmp()
        xml = tmp_path / "problem.xml"
        write_bootstrap_sdp(xml, objective, normalization, mats)
    out = tmp_path / "sdp.zip"
    n = convert([str(xml)], str(out), precision=192)
    assert n == 1
    host = read_sdp(str(out), 4, np.float64)
    assert host.num_blocks == 1 and host.dual_dim == 1


def test_mathematica_package_writes_readable_json(tmp_path):
    """The .m front-end's JSON output schema (hand-built here exactly as
    mathematica/SDPB.m emits it) parses through the PMP JSON reader."""
    from sdpb_tpu.convert.pmp import read_pmp_json

    js = ('{"objective":["1","-2"],"normalization":["1","0.5"],'
          '"PositiveMatrixWithPrefactorArray":[{"DampedRational":'
          '{"constant":"2","base":"0.36787944117144233","poles":'
          '["-1","-0.25"]},"polynomials":[[[["1","0","0.5"],'
          '["0.125","3"]]]]}]}')
    p = tmp_path / "m_out.json"
    p.write_text(js)
    obj, norm, mats = read_pmp_json(p)
    assert len(obj) == 2 and len(norm) == 2 and len(mats) == 1
    assert mats[0].polynomials[0][0][0].degree == 2
