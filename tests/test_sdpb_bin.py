"""Binary block_data (.bin) round-trips and layout auto-detection.

No .bin fixtures ship in the reference's test data (its fixtures are all
json), so cross-validation is writer->parser round-trip plus framing
perturbations that simulate other SDPB builds (El::Int widths, boost
metadata sizes)."""
import numpy as np
import pytest

from sdpb_tpu.io.sdp_zip import read_sdp, write_sdp

TOY = "/root/reference/test/data/sdp.zip"


def test_bin_roundtrip_toy(tmp_path):
    import os

    if not os.path.exists(TOY):
        pytest.skip("no reference data")
    K = 4
    sdp = read_sdp(TOY, K, np.float64)
    write_sdp(tmp_path / "sdp_bin.zip", sdp, block_format="bin", precision=384)
    back = read_sdp(tmp_path / "sdp_bin.zip", K, np.float64)

    np.testing.assert_array_equal(sdp.b, back.b)
    for a, b in zip(sdp.blocks, back.blocks):
        assert (a.dim, a.num_points) == (b.dim, b.num_points)
        # 384-bit storage covers the full 4x53-limb expansion span: exact round-trip
        np.testing.assert_array_equal(a.c, b.c)
        np.testing.assert_array_equal(a.B, b.B)
        np.testing.assert_array_equal(a.bases_even, b.bases_even)
        np.testing.assert_array_equal(a.bases_odd, b.bases_odd)


def test_bin_roundtrip_synthetic_shapes(tmp_path):
    """dim > 1, empty odd basis, and negative/zero values survive."""
    from sdpb_tpu.io.sdp_zip import BlockData, SDPData

    K = 3
    rng = np.random.default_rng(5)

    def limbify(a):
        out = np.zeros((K,) + a.shape)
        out[0] = a
        return out

    # P = num_points * dim*(dim+1)/2 = 3 * 3 = 9
    blocks = [
        BlockData(index=0, dim=2, num_points=3,
                  bases_even=limbify(rng.standard_normal((2, 3))),
                  bases_odd=limbify(np.zeros((0, 3))),
                  c=limbify(np.array([0.0, -1.5, 2.0, 0.0, 3.25, -0.125,
                                      1.0, -2.0, 4.5])),
                  B=limbify(rng.standard_normal((9, 2)))),
    ]
    sdp = SDPData(objective_const=limbify(np.asarray(-2.0)),
                  b=limbify(np.array([1.0, -3.0])), blocks=blocks)
    write_sdp(tmp_path / "s.zip", sdp, block_format="bin", precision=192)
    back = read_sdp(tmp_path / "s.zip", K, np.float64)
    np.testing.assert_array_equal(sdp.blocks[0].c, back.blocks[0].c)
    np.testing.assert_array_equal(sdp.blocks[0].B, back.blocks[0].B)
    assert back.blocks[0].bases_odd.shape == (K, 0, 3)


def test_bin_layout_autodetect():
    """Re-frame a canonical archive with 8-byte El::Int and no class
    metadata (older boost / 64-bit Elemental) — parser must still read it."""
    import mpmath

    from sdpb_tpu.io.sdpb_bin import (
        SIGNATURE, _write_bigfloat, parse_block_data_bin)
    import struct

    prec = 128
    dim, num_points, N = 1, 2, 2
    P = 2
    vals = [mpmath.mpf(v) for v in
            ("1.5", "-0.25", "3", "0", "2.5", "-1", "0.125", "7",
             "1", "2", "4", "8")]

    out = bytearray()
    out += struct.pack("<Q", len(SIGNATURE)) + SIGNATURE
    out += struct.pack("<H", 11)
    out += struct.pack("<Q", prec)
    i = 0

    def mat(h, w):
        nonlocal i
        ld = max(h, 1)
        buf = struct.pack("<qqq", h, w, ld)
        elems = bytearray()
        for c in range(w):
            for r in range(ld):
                if r < h:
                    _write_bigfloat(elems, vals[i % len(vals)], prec)
                    i += 1
                else:
                    _write_bigfloat(elems, mpmath.mpf(0), prec)
        return buf + bytes(elems)

    out += mat(P, N)                       # B
    out += struct.pack("<Q", P)            # c count, no item_version
    cb = bytearray()
    for _ in range(P):
        _write_bigfloat(cb, vals[i % len(vals)], prec)
        i += 1
    out += bytes(cb)
    out += mat(1, num_points)              # bases even
    out += mat(1, num_points)              # bases odd

    blk = parse_block_data_bin(bytes(out), 0, dim, num_points, N, 4, np.float64)
    assert blk.B.shape == (4, P, N)
    assert blk.bases_even.shape == (4, 1, num_points)
    # first B element is vals[0] = 1.5 exactly
    assert blk.B[0, 0, 0] == 1.5


def test_bin_garbage_rejected():
    from sdpb_tpu.io.sdpb_bin import parse_block_data_bin

    with pytest.raises(ValueError):
        parse_block_data_bin(b"not an archive at all" * 10, 0, 1, 2, 2, 2)
