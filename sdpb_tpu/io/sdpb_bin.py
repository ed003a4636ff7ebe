"""Parser/writer for SDPB's binary block_data format.

The reference writes block_data_<j>.bin as a boost binary_oarchive
(non-portable, little-endian x86_64) containing, in order
(/root/reference/src/sdp_convert/write_block_data.cxx:87-100):

    GMP/MPFR precision            (mp_bitcnt_t, u64)
    constraint_matrix B           (El::Matrix<El::BigFloat>)
    constraint_constants c        (std::vector<El::BigFloat>)
    bilinear_bases_even           (El::Matrix<El::BigFloat>)
    bilinear_bases_odd            (El::Matrix<El::BigFloat>)

with the custom serializers of /root/reference/src/boost_serialization.hxx:
El::Matrix saves Height/Width/LDim (El::Int) then LDim*Width elements
column-major; each El::BigFloat saves its El::Serialize byte image =
mpfr struct fields {prec: i64, sign: i32, exp: i64, limbs: ceil(prec/64) x
u64 little-endian} (value = sign * 0.<limbs> * 2^exp, top bit of the top
limb set for normal numbers; special exponents near -2^63 encode 0/NaN/inf).

Boost archive framing varies across boost releases and Elemental int
widths (El::Int 4 vs 8 bytes; class tracking/version metadata sizes), so
the parser AUTO-DETECTS the layout: it tries the known framing variants
and accepts exactly the one that parses with consistent dimensions
(B height = P, bases width = num_points, archive fully consumed).  This
keeps us byte-compatible with archives from different SDPB builds without
linking boost.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import List, Optional, Tuple

import mpmath
import numpy as np

SIGNATURE = b"serialization::archive"

# mpfr special exponents (mpfr-impl.h): MPFR_EXP_MAX = 2^63-1 on LP64
_EXP_MAX = (1 << 63) - 1
_EXP_ZERO = -_EXP_MAX + 1
_EXP_NAN = -_EXP_MAX + 2
_EXP_INF = -_EXP_MAX + 3


@dataclass(frozen=True)
class BinLayout:
    """One boost-framing variant."""
    int_size: int        # sizeof(El::Int): 4 or 8
    class_meta: int      # bytes of tracking+version emitted at a class's
                         # first occurrence (e.g. 1+4, 1+2, 0)
    item_version: int    # bytes of item_version before vector elements


# Most-likely-first: modern boost (>=1.59) stores tracking as u8 and class
# version via the common path (u32); item_version u32.  Older variants and
# 64-bit El::Int builds follow.
_LAYOUTS = [
    BinLayout(4, 5, 4), BinLayout(8, 5, 4),
    BinLayout(4, 3, 2), BinLayout(8, 3, 2),
    BinLayout(4, 0, 4), BinLayout(8, 0, 4),
    BinLayout(4, 0, 0), BinLayout(8, 0, 0),
    BinLayout(4, 5, 0), BinLayout(8, 5, 0),
]


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.off = 0

    def take(self, n: int) -> bytes:
        if self.off + n > len(self.data):
            raise ValueError("unexpected EOF")
        out = self.data[self.off:self.off + n]
        self.off += n
        return out

    def u(self, n: int) -> int:
        return int.from_bytes(self.take(n), "little", signed=False)

    def i(self, n: int) -> int:
        return int.from_bytes(self.take(n), "little", signed=True)


def _bigfloat_bytes(prec: int) -> int:
    nlimbs = -(-prec // 64)
    return 8 + 4 + 8 + 8 * nlimbs


def _read_bigfloat(r: _Reader, prec: int) -> mpmath.mpf:
    p = r.i(8)
    if p != prec:
        raise ValueError(f"BigFloat precision {p} != archive precision {prec}")
    sign = r.i(4)
    exp = r.i(8)
    nlimbs = -(-prec // 64)
    limbs = r.take(8 * nlimbs)
    if exp == _EXP_ZERO:
        return mpmath.mpf(0)
    if exp in (_EXP_NAN, _EXP_INF):
        raise ValueError("non-finite BigFloat in block data")
    if sign not in (-1, 1):
        raise ValueError(f"bad BigFloat sign {sign}")
    m = int.from_bytes(limbs, "little", signed=False)
    if m == 0:
        return mpmath.mpf(0)
    with mpmath.workprec(prec + 64):
        val = mpmath.mpf(m) * mpmath.power(2, exp - 64 * nlimbs)
        # negate INSIDE workprec: mpmath rounds every operation (unary minus
        # included) to the ambient precision
        return val if sign > 0 else -val


class _Archive:
    """Boost binary archive reader for this file's object sequence."""

    def __init__(self, data: bytes, layout: BinLayout):
        self.r = _Reader(data)
        self.layout = layout
        self.seen_matrix_meta = False
        self.seen_bigfloat_meta = False
        siglen = self.r.u(8)
        if siglen != len(SIGNATURE) or self.r.take(siglen) != SIGNATURE:
            raise ValueError("not a boost serialization archive")
        self.libver = self.r.u(2)
        if not (3 <= self.libver <= 40):
            raise ValueError(f"implausible boost archive version {self.libver}")

    def class_meta(self, flag: str):
        seen = getattr(self, f"seen_{flag}_meta")
        if not seen:
            self.r.take(self.layout.class_meta)
            setattr(self, f"seen_{flag}_meta", True)

    def read_matrix(self, prec: int) -> Tuple[int, int, List[mpmath.mpf]]:
        self.class_meta("matrix")
        isz = self.layout.int_size
        h = self.r.i(isz)
        w = self.r.i(isz)
        ld = self.r.i(isz)
        if not (0 <= h <= 10**7 and 0 <= w <= 10**7 and ld >= max(h, 1)):
            raise ValueError(f"implausible matrix dims {h}x{w} ld {ld}")
        vals = []
        total = ld * w
        self.class_meta("bigfloat") if total else None
        for i in range(total):
            vals.append(_read_bigfloat(self.r, prec))
        # column-major with leading dimension ld: element (row, col) at
        # col*ld + row; drop the ld-padding rows
        mat = [[vals[c * ld + r] for c in range(w)] for r in range(h)]
        return h, w, mat

    def read_vector(self, prec: int) -> List[mpmath.mpf]:
        count = self.r.u(8)
        if count > 10**7:
            raise ValueError(f"implausible vector count {count}")
        self.r.take(self.layout.item_version)
        self.class_meta("bigfloat") if count else None
        return [_read_bigfloat(self.r, prec) for _ in range(count)]


def _mpf_matrix_to_limbs(mat, K, np_dtype, rows, cols) -> np.ndarray:
    out = np.zeros((K, rows, cols), dtype=np_dtype)
    for rr in range(rows):
        for cc in range(cols):
            x = mat[rr][cc]
            for k in range(K):
                hi = np_dtype(float(x))
                out[k, rr, cc] = hi
                x = x - mpmath.mpf(float(hi))
    return out


def parse_block_data_bin(data: bytes, index: int, dim: int, num_points: int,
                         N: int, K: int, np_dtype=np.float64):
    """Parse one block_data_<j>.bin into a BlockData (limb arrays)."""
    from .sdp_zip import BlockData

    P = num_points * dim * (dim + 1) // 2
    errors = []
    for layout in _LAYOUTS:
        try:
            ar = _Archive(data, layout)
            prec = ar.r.u(8)
            if not (16 <= prec <= 1 << 20):
                raise ValueError(f"implausible precision {prec}")
            hB, wB, B = ar.read_matrix(prec)
            if (hB, wB) != (P, N):
                raise ValueError(f"B dims {hB}x{wB}, expected {P}x{N}")
            c = ar.read_vector(prec)
            if len(c) != P:
                raise ValueError(f"c length {len(c)}, expected {P}")
            he, we, be = ar.read_matrix(prec)
            ho, wo, bo = ar.read_matrix(prec)
            if we != num_points or (wo not in (num_points, 0)):
                raise ValueError(f"bases widths {we}/{wo} != {num_points}")
            if ar.r.off != len(data):
                raise ValueError(
                    f"{len(data) - ar.r.off} trailing bytes (layout mismatch)")
        except ValueError as e:
            errors.append((layout, str(e)))
            continue
        with mpmath.workprec(prec + 64):
            return BlockData(
                index=index, dim=dim, num_points=num_points,
                bases_even=_mpf_matrix_to_limbs(be, K, np_dtype, he, we),
                bases_odd=_mpf_matrix_to_limbs(bo, K, np_dtype, ho, wo)
                if ho else np.zeros((K, 0, num_points), dtype=np_dtype),
                c=_mpf_matrix_to_limbs([c], K, np_dtype, 1, P)[:, 0],
                B=_mpf_matrix_to_limbs(B, K, np_dtype, hB, wB),
            )
    detail = "; ".join(f"{l}: {e}" for l, e in errors[:4])
    raise ValueError(
        f"block_data_{index}.bin matches no known boost archive layout "
        f"({detail}).  Re-export with the json format if this persists.")


# ---------------------------------------------------------------------------
# Writer (canonical layout: El::Int = 4 bytes, boost >= 1.59 framing)


def _write_bigfloat(out: bytearray, x: mpmath.mpf, prec: int) -> None:
    nlimbs = -(-prec // 64)
    out += struct.pack("<q", prec)
    if x == 0:
        out += struct.pack("<i", 1)
        out += struct.pack("<q", _EXP_ZERO)
        out += b"\0" * (8 * nlimbs)
        return
    # exact path via mpmath internals: x = (-1)^s * man * 2^e, man with
    # bit length b -> mpfr form M * 2^(exp - 64*nlimbs), 2^(64n-1) <= M
    sgn_bit, man, e, b = x._mpf_
    sign = -1 if sgn_bit else 1
    shift = 64 * nlimbs - b
    if shift >= 0:
        m = man << shift
        exp = e + b
    else:
        # round to nearest (ties to even) when narrowing
        drop = -shift
        half = 1 << (drop - 1)
        low = man & ((1 << drop) - 1)
        m = man >> drop
        if low > half or (low == half and (m & 1)):
            m += 1
        exp = e + b
        if m >= 1 << (64 * nlimbs):
            m >>= 1
            exp += 1
    out += struct.pack("<i", sign)
    out += struct.pack("<q", exp)
    out += m.to_bytes(8 * nlimbs, "little")


_CANON = BinLayout(int_size=4, class_meta=5, item_version=4)


def write_block_data_bin(blk, prec: int, limbs_to_mpf=None) -> bytes:
    """Serialize a BlockData to the canonical .bin layout (round-trips with
    parse_block_data_bin; framing matches modern boost binary_oarchive)."""
    from ..utils.strings import limbs_to_mpf as _ltm

    ltm = limbs_to_mpf or _ltm
    out = bytearray()
    out += struct.pack("<Q", len(SIGNATURE))
    out += SIGNATURE
    out += struct.pack("<H", 19)          # boost archive library version
    out += struct.pack("<Q", prec)

    state = {"matrix": False, "bigfloat": False}

    def class_meta(flag):
        if not state[flag]:
            out.extend(b"\0" * _CANON.class_meta)
            state[flag] = True

    def write_matrix(limbs3):  # [K, h, w]
        class_meta("matrix")
        K, h, w = limbs3.shape
        ld = max(h, 1)
        out.extend(struct.pack("<iii", h, w, ld))
        if ld * w:
            class_meta("bigfloat")
        for cc in range(w):
            for rr in range(ld):
                val = ltm(limbs3[:, rr, cc]) if rr < h else mpmath.mpf(0)
                _write_bigfloat(out, val, prec)

    write_matrix(blk.B)
    out.extend(struct.pack("<Q", blk.c.shape[1]))
    out.extend(b"\0" * _CANON.item_version)
    if blk.c.shape[1]:
        class_meta("bigfloat")
    for i in range(blk.c.shape[1]):
        _write_bigfloat(out, ltm(blk.c[:, i]), prec)
    write_matrix(blk.bases_even)
    write_matrix(blk.bases_odd)
    return bytes(out)
