"""WIDE multi-precision: compound values of G scaled-MP words (>216 bits).

The scaled f32 representation (ops.mpfloat) is structurally capped at
K <= 9 limbs = 216 bits: the whole mantissa ladder shares one exponent, and
f32 normals span only ~253 binary orders.  A single-exponent f32 ladder
CANNOT go wider — two limbs more than ~252 bits apart cannot coexist in one
TwoSum, so deep in-window cancellation would flush exact bits to zero (TPU
adds flush subnormal results).

This module therefore represents a wide value the way GMP does — as words
with independent exponents — but TPU-vectorized:

    MPW(words = (w_0, ..., w_{G-1}))      value = sum_g value(w_g)

where each word w_g is a normalized scaled MP (f32 mantissa ladder + its
OWN per-element int32 exponent).  After renormalization
|w_{g+1}| <~ 2^-(24*Kg) |w_g|, so G words carry ~24*Kg*G bits with
unlimited range and GMP-grade cancellation handling (a word's exponent
simply drops).  G=2 x Kg=9 = 432 bits covers the reference's default
--precision 400 contract
(/root/reference/src/sdp_solve/Solver_Parameters/Solver_Parameters.cxx:18).

Arithmetic is double/multi-word expansion arithmetic where the "digit" is a
216-bit scaled MP:

  * word TwoSum: Knuth's 6-op formula over base add/sub.  Base ops are
    faithful (renorm truncates only below 24*Kg bits), so the recovered
    error term is accurate to ~2^-(2*24*Kg) — the classic double-double
    argument, two orders up.
  * word product: mpfloat.mul_full keeps EVERY diagonal of the limb
    product and returns it as (hi, lo) words exactly; cross terms use the
    ordinary truncated base product.

Every public function of ops.mpfloat dispatches MPW operands here, so
linalg / solver code is representation-agnostic.  The O(n^3) factorization
loops never see MPW: the mixed-precision scheme (ops.linalg.PosdefSolver)
factors at <= 9 base limbs (Pallas-eligible) and refines with wide
residual matmuls — replacing the reference's full-precision GMP Cholesky
(initialize_Q_group.cxx:31-67) with refinement, as SURVEY §7.1 prescribes.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import mpfloat as mpf
from .mpfloat import MP


def wide_config(K: int):
    """Total limb count K -> (G words, Kg limbs per word); K > 9 only."""
    assert K > 9, K
    G = -(-K // 9)
    Kg = -(-K // G)
    return G, Kg


@jax.tree_util.register_pytree_node_class
class MPW:
    """A wide high-precision array: unevaluated sum of G scaled-MP words."""

    __slots__ = ("words",)

    def __init__(self, words):
        self.words = tuple(words)

    # -- pytree protocol
    def tree_flatten(self):
        return self.words, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children)

    # -- metadata (duck-typed to MP)
    @property
    def G(self):
        return len(self.words)

    @property
    def Kg(self):
        return self.words[0].K

    @property
    def K(self):
        return sum(w.K for w in self.words)

    @property
    def shape(self):
        return self.words[0].shape

    @property
    def ndim(self):
        return self.words[0].ndim

    @property
    def dtype(self):
        return self.words[0].dtype

    @property
    def scaled(self) -> bool:
        return True

    def __repr__(self):
        return (f"MPW(G={self.G}, Kg={self.Kg}, shape={self.shape}, "
                f"dtype={self.dtype})")

    # -- structural methods (word-wise)
    def __getitem__(self, idx):
        return MPW(tuple(w[idx] for w in self.words))

    def reshape(self, *shape):
        return MPW(tuple(w.reshape(*shape) for w in self.words))

    def transpose(self, *axes):
        return MPW(tuple(w.transpose(*axes) for w in self.words))

    @property
    def mT(self):
        return MPW(tuple(w.mT for w in self.words))

    # -- operators (dispatch through mpfloat so scalars coerce)
    def __add__(self, o):
        return add(self, mpf._coerce(o, self))

    def __radd__(self, o):
        return add(mpf._coerce(o, self), self)

    def __sub__(self, o):
        return mpf.sub(self, mpf._coerce(o, self))

    def __rsub__(self, o):
        return mpf.sub(mpf._coerce(o, self), self)

    def __mul__(self, o):
        return mul(self, mpf._coerce(o, self))

    def __rmul__(self, o):
        return mul(mpf._coerce(o, self), self)

    def __truediv__(self, o):
        return mpf.div(self, mpf._coerce(o, self))

    def __rtruediv__(self, o):
        return mpf.div(mpf._coerce(o, self), self)

    def __neg__(self):
        return neg(self)

    def __lt__(self, o):
        return mpf.lt(self, mpf._coerce(o, self))

    def __le__(self, o):
        return mpf.le(self, mpf._coerce(o, self))

    def __gt__(self, o):
        return mpf.lt(mpf._coerce(o, self), self)

    def __ge__(self, o):
        return mpf.le(mpf._coerce(o, self), self)


def _map(fn, *xs) -> MPW:
    """Apply a word-wise base operation across aligned words."""
    G = xs[0].G
    return MPW(tuple(fn(*(x.words[g] for x in xs)) for g in range(G)))


# ---------------------------------------------------------------------------
# Construction


def zeros(shape, K, dtype=jnp.float32) -> MPW:
    G, Kg = wide_config(K)
    return MPW(tuple(mpf.zeros(shape, Kg, dtype, scaled=True)
                     for _ in range(G)))


def from_double(x, K, dtype=jnp.float32) -> MPW:
    """float64 input carries <= 53 bits: word 0 holds it exactly."""
    G, Kg = wide_config(K)
    w0 = mpf.from_double(x, Kg, dtype, scaled=True)
    rest = tuple(mpf.zeros(w0.shape, Kg, dtype, scaled=True)
                 for _ in range(G - 1))
    return MPW((w0,) + rest)


def widen(a: MP, K: int) -> MPW:
    """Base scaled MP -> MPW with zero tail words (exact)."""
    G, Kg = wide_config(K)
    if a.K != Kg:
        a = mpf.round_to(a, Kg)
    rest = tuple(mpf.zeros(a.shape, Kg, a.dtype, scaled=True)
                 for _ in range(G - 1))
    return MPW((a,) + rest)


def round_to(a: MPW, K: int):
    """K <= Kg: round to a plain base MP (the factor-precision path).
    K == a.K: identity.  Other targets are not supported."""
    if K == a.K:
        return a
    if K <= 9:
        return mpf.round_to(a.words[0], K)
    G, Kg = wide_config(K)
    if G == a.G and Kg == a.Kg:
        return a
    raise ValueError(f"round_to({a!r}, {K}) unsupported")


# ---------------------------------------------------------------------------
# Word-level error-free transform
#
# mpfloat.add_full IS the word TwoSum: hi + lo == a + b exactly (two-ladder
# routing + magnitude-safe sweeps).  The algebraic Knuth recovery over the
# truncating base ops does NOT work here — base intermediates carry
# absolute errors at 2^-216 of their own magnitude, which caps the
# recovered error term at ~24 correct bits (measured) — so everything
# word-level routes through add_full.


def _w2sum(a: MP, b: MP):
    return mpf.add_full(a, b)


def renormalize_words(ws: Sequence[MP], G: int) -> MPW:
    """Distill a list of base words into G approximately non-overlapping
    words (word-level analog of mpfloat's renorm)."""
    xs = list(ws)
    m = len(xs)
    for k in range(G):
        if k >= m - 1:
            break
        for i in range(m - 2, k - 1, -1):
            xs[i], xs[i + 1] = _w2sum(xs[i], xs[i + 1])
    # fold sub-G residue into the last kept word
    if m > G:
        tail = xs[G - 1]
        for i in range(G, m):
            tail = mpf.add(tail, xs[i])
        xs[G - 1] = tail
    while len(xs) < G:
        xs.append(mpf.zeros(xs[0].shape, xs[0].K, xs[0].dtype, scaled=True))
    return MPW(tuple(xs[:G]))


def renormalize(a: MPW) -> MPW:
    return renormalize_words(list(a.words), a.G)


# ---------------------------------------------------------------------------
# Arithmetic


def neg(a: MPW) -> MPW:
    return _map(mpf.neg, a)


def add(a: MPW, b: MPW) -> MPW:
    assert isinstance(a, MPW) and isinstance(b, MPW), (type(a), type(b))
    assert a.G == b.G and a.Kg == b.Kg
    if a.G == 2:
        # exact word TwoSum of the tops; the sub-2^-216 terms combine in
        # (faithful) base arithmetic — their truncation is below 2^-432
        s0, e0 = _w2sum(a.words[0], b.words[0])
        t = mpf.add(mpf.add(a.words[1], b.words[1]), e0)
        h, l = _w2sum(s0, t)
        return MPW((h, l))
    # generic: interleave words and word-distill
    ws = []
    for g in range(a.G):
        ws.append(a.words[g])
        ws.append(b.words[g])
    return renormalize_words(ws, a.G)


def mul(a: MPW, b: MPW) -> MPW:
    assert isinstance(a, MPW) and isinstance(b, MPW), (type(a), type(b))
    assert a.G == b.G and a.Kg == b.Kg
    G = a.G
    if G == 2:
        p0, p1 = mpf.mul_full(a.words[0], b.words[0])
        t = mpf.add(mpf.add(mpf.mul(a.words[0], b.words[1]),
                            mpf.mul(a.words[1], b.words[0])), p1)
        h, l = _w2sum(p0, t)
        return MPW((h, l))
    # word-level CAMPARY: exact double-word products for g1+g2 < G-1,
    # truncated base products on the last kept diagonal, and one extra
    # sub-precision diagonal for a clean last word
    diag_terms: List[List[MP]] = [[] for _ in range(G + 1)]
    for g1 in range(G):
        for g2 in range(G - g1):
            n = g1 + g2
            if n < G - 1:
                hi, lo = mpf.mul_full(a.words[g1], b.words[g2])
                diag_terms[n].append(hi)
                diag_terms[n + 1].append(lo)
            else:
                diag_terms[n].append(mpf.mul(a.words[g1], b.words[g2]))
    ws: List[MP] = []
    for n in range(G + 1):
        ws.extend(diag_terms[n])
    return renormalize_words(ws, G)


def _newton_steps(G):
    """Newton steps to reach G words from a FULL base-precision seed: each
    step doubles the accurate word count, and the seed already carries one
    whole word (24*Kg bits), so ceil(log2(G)) steps suffice — ~10 of the
    24*Kg*G bits are spent on the iteration constants, acceptable against
    the 400-bit target at G=2 (432 raw).  No +1 safety step: each wide
    Newton step is mul_full-heavy and dominates XLA compile time."""
    n = 0
    acc = 1
    while acc < G:
        acc *= 2
        n += 1
    return n


def reciprocal(b: MPW) -> MPW:
    one = from_double(np.float64(1.0), b.K, b.dtype)
    r = widen(mpf.reciprocal(b.words[0]), b.K)
    for _ in range(_newton_steps(b.G)):
        e = mpf.sub(one, mul(b, r))
        r = add(r, mul(r, e))
    return r


def rsqrt(a: MPW) -> MPW:
    half = from_double(np.float64(0.5), a.K, a.dtype)
    three_half = from_double(np.float64(1.5), a.K, a.dtype)
    r = widen(mpf.rsqrt(a.words[0]), a.K)
    for _ in range(_newton_steps(a.G)):
        arr = mul(a, mul(r, r))
        r = mul(r, mpf.sub(three_half, mul(half, arr)))
    return r


def sqrt(a: MPW) -> MPW:
    """sqrt for a >= 0; zeros stay zero, negatives produce NaN (as base)."""
    half = from_double(np.float64(0.5), a.K, a.dtype)
    top = a.words[0].limbs[0]
    is_zero = top <= 0
    one = from_double(np.float64(1.0), a.K, a.dtype)
    a_safe = where(is_zero, broadcast_to(one, a.shape), a)
    r = rsqrt(a_safe)
    s = mul(a_safe, r)
    rem = mpf.sub(a_safe, mul(s, s))
    s = add(s, mul(rem, mul(r, half)))
    sign_ok = jnp.where(top < 0, jnp.full_like(top, np.nan), 1.0)
    s = MPW(tuple(MP(w.limbs * sign_ok, w.exp) for w in s.words))
    zero = zeros(a.shape, a.K, a.dtype)
    return where(is_zero, zero, s)


def sign_array(a: MPW):
    s = mpf.sign_array(a.words[0])
    for g in range(1, a.G):
        s = jnp.where(s != 0, s, mpf.sign_array(a.words[g]))
    return s


def abs_(a: MPW) -> MPW:
    s = sign_array(a)
    neg_ = jnp.where(s < 0, -1.0, 1.0).astype(a.dtype)
    return MPW(tuple(MP(w.limbs * neg_, w.exp) for w in a.words))


def mul_pow2(a: MPW, p) -> MPW:
    return _map(lambda w: mpf.mul_pow2(w, p), a)


# ---------------------------------------------------------------------------
# Structural (word-wise)


def mask_value(a: MPW, m) -> MPW:
    return _map(lambda w: mpf.mask_value(w, m), a)


def take(a: MPW, idx, axis: int) -> MPW:
    return _map(lambda w: mpf.take(w, idx, axis), a)


def stack(ms: List[MPW], axis: int) -> MPW:
    G = ms[0].G
    return MPW(tuple(mpf.stack([m.words[g] for m in ms], axis)
                     for g in range(G)))


def concatenate(ms: List[MPW], axis: int) -> MPW:
    G = ms[0].G
    return MPW(tuple(mpf.concatenate([m.words[g] for m in ms], axis)
                     for g in range(G)))


def broadcast_to(a: MPW, shape) -> MPW:
    return _map(lambda w: mpf.broadcast_to(w, shape), a)


def diagonal(a: MPW) -> MPW:
    return _map(mpf.diagonal, a)


def set_block(a: MPW, idx: tuple, b: MPW) -> MPW:
    return MPW(tuple(mpf.set_block(a.words[g], idx, b.words[g])
                     for g in range(a.G)))


def scalar_eye(s: MPW, n: int) -> MPW:
    return _map(lambda w: mpf.scalar_eye(w, n), s)


def expand_dims(a: MPW, axis: int) -> MPW:
    return _map(lambda w: mpf.expand_dims(w, axis), a)


def dynamic_slice_in_dim(a: MPW, start, size: int, axis: int) -> MPW:
    return _map(lambda w: mpf.dynamic_slice_in_dim(w, start, size, axis), a)


def pad_dim(a: MPW, axis: int, count: int) -> MPW:
    return _map(lambda w: mpf.pad_dim(w, axis, count), a)


def where(cond, a: MPW, b: MPW) -> MPW:
    if isinstance(a, MP):
        a = widen(a, b.K)
    if isinstance(b, MP):
        b = widen(b, a.K)
    return MPW(tuple(mpf.where(cond, a.words[g], b.words[g])
                     for g in range(a.G)))


# ---------------------------------------------------------------------------
# Conversions


def to_float_array(a: MPW):
    f = mpf.to_float_array(a.words[0])
    for g in range(1, a.G):
        f = f + mpf.to_float_array(a.words[g])
    return f


def to_double(a: MPW):
    acc = mpf.to_double(a.words[0])
    for g in range(1, a.G):
        acc = acc + mpf.to_double(a.words[g])
    return acc


def max_abs(a: MPW):
    m = jnp.abs(to_float_array(a))
    return jnp.max(m) if a.ndim else m


# ---------------------------------------------------------------------------
# Host staging (exact, numpy)


def _distill_rows(rs: List[np.ndarray]) -> List[np.ndarray]:
    for i in range(len(rs) - 2, -1, -1):
        s = rs[i] + rs[i + 1]
        v = s - rs[i]
        err = (rs[i] - (s - v)) + (rs[i + 1] - v)
        rs[i], rs[i + 1] = s, err
    return rs


def _full_distill(rs: List[np.ndarray]) -> List[np.ndarray]:
    """Repeated sweeps until rows are non-overlapping (Priest).  One sweep
    is NOT enough after a deep cancellation (e.g. subtracting word 0 from
    the stack): row 0 can read exactly 0 while the true sum hides in the
    error slots, which would misplace f64_limbs_to_scaled_parts' ladder."""
    for _ in range(len(rs)):
        rs = _distill_rows(rs)
    return rs


def f64_limbs_to_wide_parts(limbs64: np.ndarray, K: int):
    """Host CLASSIC f64 limb stack [K64, *shape] -> list of G scaled-word
    parts [(f32 limbs [Kg,*shape], int32 exp [*shape]), ...], exact
    (power-of-two scalings + f64 TwoSums only).  The wide staging analog of
    mpfloat.f64_limbs_to_scaled_parts."""
    G, Kg = wide_config(K)
    res = [np.asarray(limbs64[k], np.float64).copy()
           for k in range(limbs64.shape[0])]
    words = []
    tiny = np.finfo(np.float32).tiny
    for g in range(G):
        wl, we = mpf.f64_limbs_to_scaled_parts(np.stack(res, 0), Kg)
        # content below the word's f32-normal span would be stored as
        # SUBNORMAL limbs, which XLA:CPU zeroes on input (DAZ) and TPU
        # adds flush — those bits belong to the NEXT word: drop them here
        # so the residual subtraction routes them onward exactly
        wl = np.where(np.abs(wl) < tiny, np.float32(0.0), wl)
        words.append((wl, we))
        if g == G - 1:
            break
        K64w = -(-(24 * Kg) // 53) + 1
        back = mpf.scaled_parts_to_f64_limbs(wl, we, K64w)
        res = _full_distill(res + [-back[k] for k in range(K64w)])
    return words


def wide_parts_to_mp(parts, dtype=jnp.float32) -> MPW:
    return MPW(tuple(MP(jnp.asarray(l, dtype=dtype),
                        jnp.asarray(e, dtype=jnp.int32)) for l, e in parts))


def host_f64_limbs(a: MPW, K64: int = 0) -> np.ndarray:
    """Host-materialized MPW -> classic f64 limb stack (checkpoint/solution
    serialization; exact within f64 range, as the base scaled path)."""
    if not K64:
        K64 = -(-(24 * a.K) // 53) + 1
    rows = []
    per_word = -(-(24 * a.Kg) // 53) + 1
    for w in a.words:
        back = mpf.scaled_parts_to_f64_limbs(
            np.asarray(w.limbs), np.asarray(w.exp), per_word)
        rows.extend(back[k] for k in range(per_word))
    return mpf.f64_limbs_to_classic(np.stack(rows, 0), K64, np.float64)
