"""Reference BINARY checkpoint migration: a synthesized rank-0 checkpoint
file in the reference's raw format (save_checkpoint.cxx:11-35) must load
into a SolverState with full precision, and multi-rank dumps must be
refused with the text-solution pointer."""
import json
import struct

import mpmath
import numpy as np
import pytest

import jax

TOY = "/root/reference/test/data/sdp.zip"
PREC = 448


def _write_bf(out: bytearray, v):
    from sdpb_tpu.io.sdpb_bin import _write_bigfloat

    _write_bigfloat(out, v, PREC)


def _build_toy():
    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.models.sdp import build_device_sdp

    host = read_sdp(TOY, 4, np.float64)
    return build_device_sdp(host)


def _synth_checkpoint(tmp_path, sdp):
    """Reference-format checkpoint for the toy block structure with
    recognizable values; returns the expected mpf arrays."""
    rng = np.random.default_rng(5)
    sh = sdp.buckets[0].shape
    rs = sdp.buckets[0].real_sizes[0]
    P = sh.n_pairs * rs.num_points
    ne, no = sh.dim * rs.h_even, sh.dim * rs.h_odd
    N = sdp.dual_dim

    def val():
        # full-precision value: double + deep tail
        with mpmath.workprec(PREC + 64):
            return (mpmath.mpf(float(rng.standard_normal()))
                    + mpmath.mpf(float(rng.standard_normal()))
                    * mpmath.mpf(2) ** -200)

    with mpmath.workprec(PREC + 64):
        x = [val() for _ in range(P)]
        Xe = [[val() for _ in range(ne)] for _ in range(ne)]
        Xo = [[val() for _ in range(no)] for _ in range(no)]
        y = [val() for _ in range(N)]
        Ye = [[val() for _ in range(ne)] for _ in range(ne)]
        Yo = [[val() for _ in range(no)] for _ in range(no)]

    out = bytearray()

    def block(h, w, get):
        out.extend(struct.pack("<qq", h, w))
        for c in range(w):
            for r in range(h):
                _write_bf(out, get(r, c))

    block(P, 1, lambda r, c: x[r])
    block(ne, ne, lambda r, c: Xe[r][c])
    block(no, no, lambda r, c: Xo[r][c])
    block(N, 1, lambda r, c: y[r])
    block(ne, ne, lambda r, c: Ye[r][c])
    block(no, no, lambda r, c: Yo[r][c])
    (tmp_path / "checkpoint_7_0").write_bytes(bytes(out))
    (tmp_path / "checkpoint.json").write_text(json.dumps(
        {"current": 7, "backup": 6, "version": "2.5.1",
         "options": {"precision": PREC}}))
    return x, y, Xe, Ye


def test_reference_binary_checkpoint_roundtrip(tmp_path):
    from sdpb_tpu.solver.checkpoint import load_checkpoint
    from sdpb_tpu.utils.strings import limbs_to_mpf

    sdp = _build_toy()
    x, y, Xe, Ye = _synth_checkpoint(tmp_path, sdp)
    state = load_checkpoint(tmp_path, sdp, verbosity=0)
    assert state is not None

    with mpmath.workprec(PREC + 64):
        tol = mpmath.mpf(2) ** -(53 * 4 - 6)   # device K=4 f64 limbs
        got_y = np.asarray(state.y.limbs, np.float64)
        for i in range(sdp.dual_dim):
            g = limbs_to_mpf(got_y[:, i])
            assert abs(g - y[i]) <= tol * max(1, abs(y[i])), (i, g, y[i])
        got_x = np.asarray(state.buckets[0].x.limbs, np.float64)
        for i in range(len(x)):
            g = limbs_to_mpf(got_x[:, 0, i])
            assert abs(g - x[i]) <= tol * max(1, abs(x[i]))
        got_Xe = np.asarray(state.buckets[0].X_even.limbs, np.float64)
        ne = len(Xe)
        for r in range(ne):
            for c in range(ne):
                g = limbs_to_mpf(got_Xe[:, 0, r, c])
                assert abs(g - Xe[r][c]) <= tol * max(1, abs(Xe[r][c]))
        got_Ye = np.asarray(state.buckets[0].Y_even.limbs, np.float64)
        for r in range(ne):
            for c in range(ne):
                g = limbs_to_mpf(got_Ye[:, 0, r, c])
                assert abs(g - Ye[r][c]) <= tol * max(1, abs(Ye[r][c]))


def test_multirank_checkpoint_refused(tmp_path):
    from sdpb_tpu.io.ref_checkpoint import load_reference_binary_checkpoint

    sdp = _build_toy()
    (tmp_path / "checkpoint_3_0").write_bytes(b"")
    (tmp_path / "checkpoint_3_1").write_bytes(b"")
    with pytest.raises(ValueError, match="text solution"):
        load_reference_binary_checkpoint(tmp_path, sdp, PREC, verbosity=0)
