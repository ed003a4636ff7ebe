"""Kernel-safe WIDE (two-word, >216-bit) arithmetic for Pallas bodies.

The XLA composite path for wide (MPW) operands traces the full
mul_full/add_full graphs at every call site — for the 432-bit nmax6
program that graph "cannot cold-compile inside the bench budget"
(round-4 finding), which is what kept the reference's default precision
contract (400 bits / duality gap 1e-30,
/root/reference/src/sdp_solve/Solver_Parameters/Solver_Parameters.cxx:18,59-64)
from ever landing in a driver bench.  This module provides the same
arithmetic in a form a Mosaic (Pallas TPU) kernel can carry:

  * distillation sweeps are statically unrolled two_sum chains — Mosaic
    lowers neither dynamic indexing on values nor scan-over-rows, and
    handles bodies of this size fine (the base MP matmul kernel at
    K=6/chunk=8 carries a comparable instruction count);
  * no jax.lax.optimization_barrier on the TPU path (Mosaic does not
    lower it, and does not apply the FP contraction it defends against —
    the same contract ops.mplist relies on); traced as plain XLA on CPU
    (pallas interpret mode, parity tests) the rows ARE barrier-pinned,
    mirroring ops.mplist's `_b` discipline.

Semantics mirror ops.mpfloat's scaled-mode add / _mul_vectorized /
add_full / mul_full and ops.mpwide's G=2 word composition (wmul / wadd);
parity is pinned by tests/test_mpwide_kernel.py (CPU, Kg=5) and the on-chip
wide solve tests against mpmath.  The wide value model (two 216-bit scaled words with
independent exponents, |w1| <~ 2^-(24K) |w0|) is documented in ops.mpwide.

A value here is an SVal pair (limbs [K, *shape] f32, exp [*shape] int32);
a wide value is a (w0, w1) pair of SVals.  Shapes follow jnp broadcasting
(e.g. the matmul kernel feeds [M, 1] x [1, N] factors).
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .eft import quick_two_sum, split, two_sum
from .mpfloat import (EXP_ZERO, _MUL_UNIFORM_EXP, _mul_term_plan,
                      _mul_term_plan_full, center_for)

# A stacked scaled value: (limbs [K, *shape] float32, exp [*shape] int32).
SVal = Tuple[jnp.ndarray, jnp.ndarray]
# A wide two-word value: (w0, w1) with |w1| <~ 2^-(24K) |w0|.
WVal = Tuple[SVal, SVal]

_BARRIER = None


def _use_barrier() -> bool:
    """Pin rows against cross-op FP contraction when traced as plain XLA
    on CPU (parity tests, pallas interpret mode).  Mosaic neither lowers
    optimization_barrier nor contracts — kernels on the chip need none."""
    global _BARRIER
    if _BARRIER is None:
        _BARRIER = jax.default_backend() == "cpu"
    return _BARRIER


def _bx(x):
    if _use_barrier():
        return jax.lax.optimization_barrier(x)
    return x


def _pow2f(e):
    """Exact float32 2^e for int32 e in [-126, 127] by bit assembly."""
    bits = ((e + 127) << 23).astype(jnp.int32)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _exp_bits(x):
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    return (bits >> 23) & 0xFF


def _scale_arr(S, d, steps: int = 3):
    """S * 2^d for int32 d broadcastable to S; `steps` clipped stages
    (3 covers |d| <= 381), residual negative d flushes to zero
    (mpfloat._scale_pow2_arr semantics)."""
    d = jnp.asarray(d, jnp.int32)
    out = S
    for _ in range(steps):
        step = jnp.clip(d, -126, 127)
        out = _bx(out * _pow2f(step))
        d = d - step
    return _bx(jnp.where(d < 0, jnp.zeros_like(out), out))


def _mul_pow2_lift(x, p: int):
    """Exact x * 2^p (static p >= 23) for normal AND subnormal x.

    Normals scale by exponent-field addition (immune to constant-folding
    overflow; no multiply to flush).  Subnormal values — which legally
    appear as deep residual/limb content when operands carry content gaps
    wider than the ~242-bit f32-normal window — are re-expressed through
    an EXACT int->float conversion of their mantissa (< 2^23) times a
    normal power of two: Mosaic flushes subnormal multiply results, so a
    plain staged multiply would silently drop exactly the bits this lift
    exists to save (measured: a flushed 2^-243-relative hi limb cost the
    432-bit product its contract)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    eb = (bits >> 23) & 0xFF
    normal = jax.lax.bitcast_convert_type(
        jnp.where(eb == 0, jnp.zeros_like(bits), bits + jnp.int32(p << 23)),
        jnp.float32)
    mant = (bits & 0x7FFFFF).astype(jnp.float32)     # exact: < 2^23
    sign = jnp.where(bits < 0, np.float32(-1.0), np.float32(1.0))
    sub = sign * mant * np.float32(2.0 ** (p - 149))
    return jnp.where(eb == 0, sub, normal)


# ---------------------------------------------------------------------------
# Distillation sweeps (row lists, statically unrolled)
#
# The carry-chain recurrence of mpfloat._sweep_scan / mplist.renorm_list:
# carry = S[m-1]; for i = m-2 .. k: (carry, S[i+1]) = two_sum(S[i], carry);
# S[k] = carry.


def _sweeps_exact(rows, K: int) -> List:
    """K extraction sweeps over a row list; rows [0..K-1] hold the limbs,
    rows [K..m-1] the EXACT residual (mpfloat._sweeps_exact_scan)."""
    xs = [_bx(x) for x in rows] if _use_barrier() else list(rows)
    m = len(xs)
    for k in range(min(K, m - 1)):
        carry = xs[m - 1]
        for i in range(m - 2, k - 1, -1):
            carry, xs[i + 1] = two_sum(xs[i], carry)
        xs[k] = carry
    return xs


def _renorm_sweeps(rows, K: int) -> List:
    """renorm sweeps: K carry-chain sweeps plus the k == K plain chain-sum
    of the residue into row K (mplist.renorm_list)."""
    xs = _sweeps_exact(rows, K)
    m = len(xs)
    if m - 1 > K:
        s = xs[m - 1]
        for i in range(m - 2, K - 1, -1):
            s = s + xs[i]
        xs[K] = s
    return xs


def _normalize_st(limbs, e, K: int) -> SVal:
    """Re-center limbs[0] on the CENTER(K) rung; exact zeros get EXP_ZERO
    (mpfloat._normalize_scaled)."""
    C = center_for(K)
    eb = _exp_bits(limbs[0])
    is_zero = eb == 0
    shift = jnp.where(is_zero, 0, eb - 127 - C)
    limbs = _scale_arr(limbs, -shift)
    limbs = jnp.where(is_zero[None], jnp.zeros_like(limbs), limbs)
    e = jnp.where(is_zero, EXP_ZERO, e + shift).astype(jnp.int32)
    return limbs, e


def renorm_st(rows, K: int, exp) -> SVal:
    """Distill value rows (list, at common exponent `exp`) into a
    normalized K-limb SVal (mpfloat._renorm_stacked, scaled mode)."""
    rows = list(rows)
    if len(rows) < K + 2:
        z = jnp.zeros_like(rows[0])
        rows = rows + [z] * (K + 2 - len(rows))
    xs = _renorm_sweeps(rows, K)
    for i in range(K):
        xs[i], xs[i + 1] = quick_two_sum(xs[i], xs[i + 1])
    for i in range(K - 1, 0, -1):
        xs[i - 1], xs[i] = quick_two_sum(xs[i - 1], xs[i])
    limbs = jnp.stack(xs[:K], axis=0)
    shape = jnp.broadcast_shapes(limbs.shape[1:], jnp.shape(exp))
    limbs = jnp.broadcast_to(limbs, (K,) + shape)
    return _normalize_st(limbs, jnp.broadcast_to(exp, shape), K)


# ---------------------------------------------------------------------------
# Base (single-word) scaled ops


def zeros_st(shape, K: int) -> SVal:
    return (jnp.zeros((K,) + tuple(shape), jnp.float32),
            jnp.full(tuple(shape), EXP_ZERO, jnp.int32))


def add_st(a: SVal, b: SVal, K: int) -> SVal:
    """Aligned scaled add (mpfloat.add, scaled mode)."""
    al, ae = a
    bl, be = b
    shape = jnp.broadcast_shapes(al.shape[1:], bl.shape[1:],
                                 jnp.shape(ae), jnp.shape(be))
    ae = jnp.broadcast_to(ae, shape)
    be = jnp.broadcast_to(be, shape)
    e = jnp.maximum(ae, be)
    al = _scale_arr(jnp.broadcast_to(al, (K,) + shape), ae - e)
    bl = _scale_arr(jnp.broadcast_to(bl, (K,) + shape), be - e)
    rows = []
    for i in range(K):
        rows.append(al[i])
        rows.append(bl[i])
    return renorm_st(rows, K, e)


def neg_st(a: SVal) -> SVal:
    return -a[0], a[1]


def mul_st(a: SVal, b: SVal, K: int) -> SVal:
    """Truncated scaled product (mpfloat._mul_vectorized semantics with a
    static row gather — kernel-friendly, no dynamic gather)."""
    al, ae = a
    bl, be = b
    C = center_for(K)
    U = _MUL_UNIFORM_EXP
    # per-limb static scalar prescales (scalars inline into the kernel;
    # a [K]-shaped jnp constant would be a captured array, which
    # pallas_call rejects)
    pre = [np.float32(2.0 ** (24 * i - C + U)) for i in range(K)]
    al = _bx(jnp.stack([al[i] * pre[i] for i in range(K)], 0))
    bl = _bx(jnp.stack([bl[i] * pre[i] for i in range(K)], 0))
    ah, alo = split(al)
    bh, blo = split(bl)
    P = al[:, None] * bl[None, :]
    E = ((ah[:, None] * bh[None, :] - P) + ah[:, None] * blo[None, :]
         + alo[:, None] * bh[None, :]) + alo[:, None] * blo[None, :]
    shape = P.shape[2:]
    Pr = P.reshape((K * K,) + shape)
    Er = E.reshape((K * K,) + shape)
    idx, diag = _mul_term_plan(K)
    # static per-diagonal two-factor scales back onto the CENTER ladder
    d = (C - 2 * U - 24 * diag).astype(np.int64)
    d1 = np.clip(d, -126, 127)
    d2 = np.clip(d - d1, -126, 127)
    f1 = np.exp2(d1.astype(np.float64)).astype(np.float32)
    f2 = np.exp2(d2.astype(np.float64)).astype(np.float32)
    rows = []
    for r, i in enumerate(idx):
        t = Pr[int(i)] if i < K * K else Er[int(i) - K * K]
        rows.append(_bx(t * f1[r]) * f2[r])
    e = (jnp.broadcast_to(ae, shape).astype(jnp.int32)
         + jnp.broadcast_to(be, shape) + C)
    return renorm_st(rows, K, e)


# ---------------------------------------------------------------------------
# Word-level error-free transforms (two-ladder routing)


def _extract_hi(xs, K: int):
    """Compact the K extracted sweep rows into hi limbs, SPILLING
    sub-window content to the lo ladder.

    With gapped operands the extraction can leave hi limbs more than
    ~242 bits below the word top — at or near f32 subnormal, where any
    Mosaic multiply (including _normalize_st's re-centering and every
    downstream op) flushes them to zero, silently costing the two-word
    pair its 432-bit contract (measured round 5).  Limbs whose biased
    exponent is < 26 (mantissa tail at/under 2^-125, margin 2 for the
    normalize shift) are therefore moved EXACTLY onto the lo ladder via
    the subnormal-safe lift; hi keeps only flush-proof limbs.  Returns
    (hi limb stack [K, *shape], spill rows for the lo stack)."""
    his = list(xs[:K])
    for i in range(K - 1):
        his[i], his[i + 1] = two_sum(his[i], his[i + 1])
    for i in range(K - 1, 0, -1):
        his[i - 1], his[i] = two_sum(his[i - 1], his[i])
    stack = jnp.stack(his, axis=0)
    ebh = _exp_bits(stack)
    keep = ebh >= 26
    spill = [_mul_pow2_lift(jnp.where(keep[k], np.float32(0.0), stack[k]),
                            24 * K) for k in range(K)]
    return jnp.where(keep, stack, np.float32(0.0)), spill


def add_full_st(a: SVal, b: SVal, K: int) -> Tuple[SVal, SVal]:
    """TwoSum of scaled words: hi + lo == a + b exactly (to the -242-bit
    routing bound documented in mpfloat.add_full)."""
    al, ae = a
    bl, be = b
    shape = jnp.broadcast_shapes(al.shape[1:], bl.shape[1:],
                                 jnp.shape(ae), jnp.shape(be))
    al = jnp.broadcast_to(al, (K,) + shape)
    bl = jnp.broadcast_to(bl, (K,) + shape)
    ae = jnp.broadcast_to(ae, shape)
    be = jnp.broadcast_to(be, shape)
    e_hi = jnp.maximum(ae, be)
    e_lo = e_hi - 24 * K

    def route(limbs, we):
        # content-based per-row routing: a row stays on the HI ladder only
        # if its whole mantissa survives the 2^d rescale as f32 normals
        d = we - e_hi
        eb = _exp_bits(limbs)
        keep_hi = (eb + d[None]) >= 24
        hi = _scale_arr(jnp.where(keep_hi, limbs, 0.0), d)
        lo = _scale_arr(jnp.where(keep_hi, 0.0, limbs), d + 24 * K)
        return hi, lo

    a_hi, a_lo = route(al, ae)
    b_hi, b_lo = route(bl, be)
    rows = []
    for i in range(K):
        rows.append(a_hi[i])
        rows.append(b_hi[i])
    xs = _sweeps_exact(rows, K)
    his, spill = _extract_hi(xs, K)
    hi = _normalize_st(his, e_hi, K)

    lo_rows = spill + [_mul_pow2_lift(x, 24 * K) for x in xs[K:]]
    for i in range(K):
        lo_rows.append(a_lo[i])
        lo_rows.append(b_lo[i])
    lo = renorm_st(lo_rows, K, e_lo)
    return hi, lo


def mul_full_st(a: SVal, b: SVal, K: int) -> Tuple[SVal, SVal]:
    """Product of scaled words as TWO words with hi + lo == a * b exactly
    (mpfloat.mul_full: content-lifted limbs, per-pair placement exponents,
    content-based hi/lo routing, exact hi extraction)."""
    al, ae = a
    bl, be = b
    C = center_for(K)
    U = _MUL_UNIFORM_EXP
    ea = _exp_bits(al)
    eb = _exp_bits(bl)
    lift_a = jnp.where(ea == 0, 0, U + 127 - ea)
    lift_b = jnp.where(eb == 0, 0, U + 127 - eb)
    As = _scale_arr(al, lift_a, steps=2)
    Bs = _scale_arr(bl, lift_b, steps=2)
    ah, alo = split(As)
    bh, blo = split(Bs)
    P = As[:, None] * Bs[None, :]
    E = ((ah[:, None] * bh[None, :] - P) + ah[:, None] * blo[None, :]
         + alo[:, None] * bh[None, :]) + alo[:, None] * blo[None, :]
    shape = P.shape[2:]
    Pr = P.reshape((K * K,) + shape)
    Er = E.reshape((K * K,) + shape)
    D = -(lift_a[:, None] + lift_b[None, :]) - C
    D = jnp.broadcast_to(D, (K, K) + shape).reshape((K * K,) + shape)
    exp_hi = (jnp.broadcast_to(ae, shape) + jnp.broadcast_to(be, shape) + C)
    exp_lo = exp_hi - 24 * K

    idx = _mul_term_plan_full(K)
    hi_rows, lo_rows = [], []
    for i in idx:
        t = Pr[int(i)] if i < K * K else Er[int(i) - K * K]
        Drow = D[int(i) % (K * K)]
        ebt = _exp_bits(t)
        keep_hi = (ebt + Drow) >= 24
        hi_rows.append(_scale_arr(jnp.where(keep_hi, t, 0.0), Drow))
        lo_rows.append(_scale_arr(jnp.where(keep_hi, 0.0, t),
                                  Drow + 24 * K))

    xs = _sweeps_exact(hi_rows, K)
    his, spill = _extract_hi(xs, K)
    hi = _normalize_st(his, exp_hi, K)

    res = spill + [_mul_pow2_lift(x, 24 * K) for x in xs[K:]]
    lo = renorm_st(res + lo_rows, K, exp_lo)
    return hi, lo


# ---------------------------------------------------------------------------
# Wide two-word composition (ops.mpwide G=2 semantics)


def wzeros(shape, K: int) -> WVal:
    return zeros_st(shape, K), zeros_st(shape, K)


def wadd(a: WVal, b: WVal, K: int) -> WVal:
    s0, e0 = add_full_st(a[0], b[0], K)
    t = add_st(add_st(a[1], b[1], K), e0, K)
    return add_full_st(s0, t, K)


def wmul(a: WVal, b: WVal, K: int) -> WVal:
    p0, p1 = mul_full_st(a[0], b[0], K)
    t = add_st(add_st(mul_st(a[0], b[1], K),
                      mul_st(a[1], b[0], K), K),
               p1, K)
    return add_full_st(p0, t, K)


def wfma_acc(acc: WVal, a: WVal, b: WVal, K: int) -> WVal:
    """acc + a*b with a CHEAPER carry than wadd(acc, wmul(a, b)): the hi
    product accumulates through one word-TwoSum and everything at the
    2^-(24K) level rides plain truncated adds.  The accumulator's lo word
    can grow to ~log2(#terms) bits above its nominal rung; callers
    re-establish the |w1| <= 2^-(24K)|w0| invariant with one final
    add_full (see wnormalize).  Same error class as wadd-per-term (both
    truncate the lo ladder at 2^-(48K)); ~40% fewer sweep ops."""
    p0, p1 = mul_full_st(a[0], b[0], K)
    cross = add_st(mul_st(a[0], b[1], K), mul_st(a[1], b[0], K), K)
    h, e = add_full_st(acc[0], p0, K)
    l = add_st(add_st(acc[1], e, K), add_st(cross, p1, K), K)
    return h, l


def wnormalize(a: WVal, K: int) -> WVal:
    """Re-establish the two-word invariant after wfma_acc chains."""
    return add_full_st(a[0], a[1], K)
