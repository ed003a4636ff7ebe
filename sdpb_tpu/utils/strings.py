"""Host-side exact conversions between decimal strings and MP limb arrays.

The reference parses all input numbers into GMP BigFloats at --precision
bits (e.g. /root/reference/src/sdp_read — SAX parsers feeding El::BigFloat).
Here the host parses decimal strings with mpmath at generous precision and
peels off base-dtype limbs exactly; the device never sees strings.
"""
from __future__ import annotations

import numpy as np
import mpmath

try:  # native GMP-backed parser (see native/fastio.cpp); mpmath fallback
    from sdpb_tpu import _fastio
except ImportError:  # pragma: no cover - extension not built
    _fastio = None


def _workdps(nbits: int) -> int:
    return int(nbits * 0.30103) + 12


def str_to_limbs(s: str, K: int, np_dtype) -> np.ndarray:
    """Parse one decimal string into K limbs (exact peel-off)."""
    nbits = (24 if np_dtype == np.float32 else 53) * K + 16
    with mpmath.workprec(nbits + 32):
        x = mpmath.mpf(s)
        limbs = np.zeros(K, dtype=np_dtype)
        for k in range(K):
            hi = np_dtype(float(x))
            limbs[k] = hi
            x = x - mpmath.mpf(float(hi))
        return limbs


def strs_to_limbs(strings, K: int, np_dtype) -> np.ndarray:
    """Parse a flat list of decimal strings -> limbs array [K, n].

    Uses the native GMP extension when available (orders of magnitude
    faster on production-scale inputs); mpmath otherwise."""
    n = len(strings)
    nbits = (24 if np_dtype == np.float32 else 53) * K + 16
    if _fastio is not None and np_dtype == np.float64:
        buf = _fastio.parse_decimals(list(strings), K, nbits + 32)
        return np.frombuffer(buf, dtype=np.float64).reshape(K, n).copy()
    out = np.zeros((K, n), dtype=np_dtype)
    tiny = np.finfo(np_dtype).tiny
    with mpmath.workprec(nbits + 32):
        for i, s in enumerate(strings):
            x = mpmath.mpf(s)
            for k in range(K):
                hi = np_dtype(float(x))
                if abs(hi) < tiny:  # flush subnormal limbs (see fastio.cpp)
                    break
                out[k, i] = hi
                x = x - mpmath.mpf(float(hi))
    return out


def str_to_scaled_limbs(s: str, K: int):
    """Parse one decimal string -> (float32 limbs [K], int32 exp scalar) in
    the scaled (exponent-tracked) representation used on TPU.  K > 9 uses
    the WIDE representation (ops.mpwide): returns a LIST of per-word
    (limbs, exp) parts."""
    K64 = -(-(24 * K) // 53) + 1
    l64 = str_to_limbs(s, K64, np.float64)
    if K > 9:
        from ..ops.mpwide import f64_limbs_to_wide_parts

        parts = f64_limbs_to_wide_parts(l64.reshape(K64, 1), K)
        return [(l[:, 0], e[0]) for l, e in parts]
    from ..ops.mpfloat import f64_limbs_to_scaled_parts

    limbs, exp = f64_limbs_to_scaled_parts(l64.reshape(K64, 1), K)
    return limbs[:, 0], exp[0]


def scaled_limbs_to_mpf(limbs, exp) -> mpmath.mpf:
    """Exact mpmath value of a scaled (limbs [K], exp int) number."""
    prec = 30 * len(limbs) + 64
    with mpmath.workprec(prec):
        acc = mpmath.mpf(0)
        for l in np.asarray(limbs, dtype=np.float64):
            acc = acc + mpmath.mpf(float(l))
        return acc * mpmath.power(2, int(exp))


def mp_host_to_mpf(mp_host) -> mpmath.mpf:
    """mpmath value of a host (numpy-leaved) scalar MP in any mode
    (classic, scaled, or wide)."""
    if hasattr(mp_host, "words"):
        prec = 30 * sum(w.K for w in mp_host.words) + 64
        with mpmath.workprec(prec):
            acc = mpmath.mpf(0)
            for w in mp_host.words:
                acc = acc + scaled_limbs_to_mpf(w.limbs, w.exp)
            return acc
    if getattr(mp_host, "exp", None) is not None:
        return scaled_limbs_to_mpf(mp_host.limbs, mp_host.exp)
    return limbs_to_mpf(mp_host.limbs)


def limbs_to_mpf(limbs) -> mpmath.mpf:
    """Exact mpmath value of a single K-limb number (host numpy input)."""
    prec = 60 * len(limbs) + 64
    with mpmath.workprec(prec):
        acc = mpmath.mpf(0)
        for l in np.asarray(limbs, dtype=np.float64):
            acc = acc + mpmath.mpf(float(l))
        return acc


def limbs_to_str(limbs, ndigits=None) -> str:
    """Decimal string of a K-limb number, full precision by default.

    Mirrors set_stream_precision in the reference (out.txt is written at
    full working precision, /root/reference/src/sdp_solve/set_stream_precision.hxx).
    """
    limbs = np.asarray(limbs, dtype=np.float64)
    K = len(limbs)
    nbits = 53 * K + 16
    if ndigits is None:
        ndigits = int(nbits * 0.30103) + 1
    with mpmath.workprec(nbits):
        acc = mpmath.mpf(0)
        for l in limbs:
            acc = acc + mpmath.mpf(float(l))
        return mpmath.nstr(
            acc, ndigits, strip_zeros=False, min_fixed=1, max_fixed=0
        )
