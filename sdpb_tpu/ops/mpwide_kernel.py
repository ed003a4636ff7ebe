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


# ---------------------------------------------------------------------------
# COMPACT kernel ops (scratch-ref row stacks + SMEM plan tables)
#
# The list-form ops above trace ~50k eqns per wide product; embedded once
# per matmul call site that made the 432-bit nmax6 program an 85 MB MLIR
# blob the server compiler could not hold (SIGKILL, round 5).  The compact
# forms below carry every row stack in a VMEM scratch ref and run the
# distillation sweeps as fori loops with dynamic REF indexing (supported
# by Mosaic, unlike dynamic indexing on values), with the static product
# plans passed as SMEM tables — a wide fused multiply-accumulate traces
# ~2k eqns instead of ~60k.  Numerical semantics are IDENTICAL to the
# list forms except the lo-stack row ORDER inside mul_full (plan-permuted
# in place of diagonal-sorted; distillation sweeps redistribute exactly
# regardless of order, and the extraction tail is covered by the same
# K-sweep count — audited on-chip against mpmath).
#
# Scratch layout (f32 rows of [M, N] tiles, one buffer `S`):
#   [0          : NPE)         PE bulk / in-place routed-lo rows
#   [NPE        : NPE + NPE)   hi stack / mul_st scaled rows / generic work
#   [2*NPE      : 2*NPE + K+4) spill & small tails
# plus an int32 buffer `D` of K*K rows for mul_full's placement exponents.
# NPE = 2*K*K.  Total f32 rows: ROWS_FOR(K) = 4*K*K + K + 2.


def plan_tables(K: int):
    """(int32 [2 + 2K^2 + len(plan_mul)], f32 [2, len(plan_mul)]) SMEM
    tables: header [n_full, n_mul], the full-product plan, the truncated-
    product plan; f1/f2 static diagonal scales for the truncated plan."""
    full = _mul_term_plan_full(K)
    idx, diag = _mul_term_plan(K)
    C = center_for(K)
    U = _MUL_UNIFORM_EXP
    d = (C - 2 * U - 24 * diag).astype(np.int64)
    d1 = np.clip(d, -126, 127)
    d2 = np.clip(d - d1, -126, 127)
    f1 = np.exp2(d1.astype(np.float64)).astype(np.float32)
    f2 = np.exp2(np.clip(d2, -126, 127).astype(np.float64)).astype(np.float32)
    ints = np.concatenate([np.asarray([len(full), len(idx)], np.int32),
                           full.astype(np.int32), idx.astype(np.int32)])
    return ints, np.stack([f1, f2], 0)


def rows_for(K: int) -> int:
    return 4 * K * K + K + 2


class KCtx:
    """Kernel-side context: scratch refs + plan tables."""

    def __init__(self, S, D, plan_ref, fmul_ref, K: int):
        self.S = S                  # f32 [rows_for(K), M, N] VMEM
        self.D = D                  # int32 [K*K, M, N] VMEM
        self.plan = plan_ref        # int32 SMEM (see plan_tables)
        self.fmul = fmul_ref        # f32 [2, n_mul] SMEM
        self.K = K
        self.NPE = 2 * K * K
        self.n_full = 2 * K * K
        _, idx = _mul_term_plan(K)
        self.n_mul = len(idx)

    def full_idx(self, j):
        return self.plan[2 + j]

    def mul_idx(self, j):
        return self.plan[2 + self.n_full + j]


def _pl():
    import jax.experimental.pallas as pl

    return pl


def _sweeps_ref(ctx: KCtx, segs, K: int, extract_only: bool):
    """Distillation sweeps over scratch rows addressed by static segments
    segs = [(start, length), ...] in LOGICAL order.  extract_only=True is
    _sweeps_exact (K sweeps, exact residual left in place); False appends
    the renorm chain-sum of the residue into logical row K."""
    pl = _pl()
    S = ctx.S
    m = sum(n for _, n in segs)

    def phys(j):
        # static piecewise map logical j -> physical row
        out = None
        base = 0
        for start, n in segs:
            expr = start + (j - base)
            out = expr if out is None else jnp.where(j < base, out, expr)
            base += n
        return out

    def read(j):
        return S[pl.ds(phys(j), 1)][0]

    def write(j, v):
        S[pl.ds(phys(j), 1)] = v[None]

    for k in range(min(K, m - 1)):
        def body(t, carry, _k=k):
            i = (m - 2) - t
            s, e = two_sum(read(i), carry)
            write(i + 1, e)
            return s

        carry = jax.lax.fori_loop(0, m - 1 - k, body, read(m - 1))
        write(k, carry)
    if not extract_only and m - 1 > K:
        def chain(t, carry):
            return carry + read((m - 2) - t)

        carry = jax.lax.fori_loop(0, m - 1 - K, chain, read(m - 1))
        write(K, carry)
    return m, phys


def _finish_renorm(ctx: KCtx, segs, K: int, exp) -> SVal:
    """Chain-sum tail + compaction + normalize over logical rows 0..K of
    the swept segments (renorm_st semantics)."""
    pl = _pl()
    m, phys = _sweeps_ref(ctx, segs, K, extract_only=False)
    xs = [ctx.S[pl.ds(phys(i), 1)][0] for i in range(min(K + 1, m))]
    while len(xs) < K + 1:
        xs.append(jnp.zeros_like(xs[0]))
    for i in range(K):
        xs[i], xs[i + 1] = quick_two_sum(xs[i], xs[i + 1])
    for i in range(K - 1, 0, -1):
        xs[i - 1], xs[i] = quick_two_sum(xs[i - 1], xs[i])
    limbs = jnp.stack(xs[:K], axis=0)
    shape = limbs.shape[1:]
    return _normalize_st(limbs, jnp.broadcast_to(exp, shape), K)


def add_st_c(ctx: KCtx, a: SVal, b: SVal) -> SVal:
    """Compact aligned scaled add (semantics of add_st)."""
    K = ctx.K
    al, ae = a
    bl, be = b
    shape = jnp.broadcast_shapes(al.shape[1:], bl.shape[1:],
                                 jnp.shape(ae), jnp.shape(be))
    ae = jnp.broadcast_to(ae, shape)
    be = jnp.broadcast_to(be, shape)
    e = jnp.maximum(ae, be)
    al = _scale_arr(jnp.broadcast_to(al, (K,) + shape), ae - e)
    bl = _scale_arr(jnp.broadcast_to(bl, (K,) + shape), be - e)
    W = ctx.NPE
    ctx.S[W:W + 2 * K] = jnp.stack([al, bl], 1).reshape((2 * K,) + shape)
    ctx.S[W + 2 * K:W + 2 * K + 2] = jnp.zeros((2,) + shape, jnp.float32)
    return _finish_renorm(ctx, [(W, 2 * K + 2)], K, e)


def add_full_c(ctx: KCtx, a: SVal, b: SVal) -> Tuple[SVal, SVal]:
    """Compact word TwoSum (semantics of add_full_st incl. the subnormal
    spill)."""
    K = ctx.K
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
        d = we - e_hi
        eb = _exp_bits(limbs)
        keep_hi = (eb + d[None]) >= 24
        hi = _scale_arr(jnp.where(keep_hi, limbs, 0.0), d)
        lo = _scale_arr(jnp.where(keep_hi, 0.0, limbs), d + 24 * K)
        return hi, lo

    a_hi, a_lo = route(al, ae)
    b_hi, b_lo = route(bl, be)
    W = ctx.NPE
    ctx.S[W:W + 2 * K] = jnp.stack([a_hi, b_hi], 1).reshape((2 * K,) + shape)
    m, phys = _sweeps_ref(ctx, [(W, 2 * K)], K, extract_only=True)
    pl = _pl()
    his = [ctx.S[pl.ds(W + i, 1)][0] for i in range(K)]
    for i in range(K - 1):
        his[i], his[i + 1] = two_sum(his[i], his[i + 1])
    for i in range(K - 1, 0, -1):
        his[i - 1], his[i] = two_sum(his[i - 1], his[i])
    stack = jnp.stack(his, axis=0)
    ebh = _exp_bits(stack)
    keep = ebh >= 26
    spill = _mul_pow2_lift(jnp.where(keep, np.float32(0.0), stack), 24 * K)
    hi = _normalize_st(jnp.where(keep, stack, np.float32(0.0)), e_hi, K)
    # lo stack: lifted residual rows (in place), spill, a_lo/b_lo
    res = _mul_pow2_lift(ctx.S[W + K:W + 2 * K], 24 * K)
    ctx.S[W + K:W + 2 * K] = res
    base2 = W + 2 * K
    ctx.S[base2:base2 + K] = spill
    ctx.S[base2 + K:base2 + 3 * K] = jnp.stack(
        [a_lo, b_lo], 1).reshape((2 * K,) + shape)
    ctx.S[base2 + 3 * K:base2 + 3 * K + 2] = jnp.zeros((2,) + shape,
                                                       jnp.float32)
    lo = _finish_renorm(ctx, [(W + K, K), (base2, 3 * K + 2)], K, e_lo)
    return hi, lo


def _pe_bulk(ctx: KCtx, a: SVal, b: SVal, lifted: bool):
    """Compute P/E term tensors of a word product and store them in the
    PE scratch region ([0 : K^2) products, [K^2 : 2K^2) errors).  With
    lifted=True uses mul_full's content lift and fills ctx.D with the
    per-pair placement exponents; returns the lift arrays."""
    K = ctx.K
    al, bl = a[0], b[0]
    if lifted:
        ea = _exp_bits(al)
        eb = _exp_bits(bl)
        lift_a = jnp.where(ea == 0, 0, _MUL_UNIFORM_EXP + 127 - ea)
        lift_b = jnp.where(eb == 0, 0, _MUL_UNIFORM_EXP + 127 - eb)
        As = _scale_arr(al, lift_a, steps=2)
        Bs = _scale_arr(bl, lift_b, steps=2)
    else:
        C = center_for(K)
        pre = [np.float32(2.0 ** (24 * i - C + _MUL_UNIFORM_EXP))
               for i in range(K)]
        As = jnp.stack([al[i] * pre[i] for i in range(K)], 0)
        Bs = jnp.stack([bl[i] * pre[i] for i in range(K)], 0)
        lift_a = lift_b = None
    ah, alo_ = split(As)
    bh, blo_ = split(Bs)
    P = As[:, None] * Bs[None, :]
    E = ((ah[:, None] * bh[None, :] - P) + ah[:, None] * blo_[None, :]
         + alo_[:, None] * bh[None, :]) + alo_[:, None] * blo_[None, :]
    shape = P.shape[2:]
    ctx.S[0:K * K] = P.reshape((K * K,) + shape)
    ctx.S[K * K:2 * K * K] = E.reshape((K * K,) + shape)
    if lifted:
        Dv = -(lift_a[:, None] + lift_b[None, :]) - center_for(K)
        ctx.D[0:K * K] = jnp.broadcast_to(
            Dv, (K, K) + shape).reshape((K * K,) + shape).astype(jnp.int32)
    return shape


def mul_st_c(ctx: KCtx, a: SVal, b: SVal) -> SVal:
    """Compact truncated scaled product (semantics of mul_st)."""
    pl = _pl()
    K = ctx.K
    C = center_for(K)
    shape = _pe_bulk(ctx, a, b, lifted=False)
    W = ctx.NPE

    def body(j, carry):
        i = ctx.mul_idx(j)
        row = ctx.S[pl.ds(i, 1)][0]
        row = row * ctx.fmul[0, j] * ctx.fmul[1, j]
        ctx.S[pl.ds(W + j, 1)] = row[None]
        return carry

    jax.lax.fori_loop(0, ctx.n_mul, body, jnp.int32(0))
    ctx.S[W + ctx.n_mul:W + ctx.n_mul + 2] = jnp.zeros((2,) + shape,
                                                       jnp.float32)
    e = (jnp.broadcast_to(a[1], shape).astype(jnp.int32)
         + jnp.broadcast_to(b[1], shape) + C)
    return _finish_renorm(ctx, [(W, ctx.n_mul + 2)], K, e)


def mul_full_c(ctx: KCtx, a: SVal, b: SVal) -> Tuple[SVal, SVal]:
    """Compact exact word product (semantics of mul_full_st incl. the
    subnormal spill).  Routed-lo rows land IN PLACE at their PE slot
    (each slot is read exactly once — the plan is a permutation), so the
    lo stack is plan-permuted; the distillation sweeps are order-exact."""
    pl = _pl()
    K = ctx.K
    C = center_for(K)
    shape = _pe_bulk(ctx, a, b, lifted=True)
    ae = jnp.broadcast_to(a[1], shape)
    be = jnp.broadcast_to(b[1], shape)
    exp_hi = ae + be + C
    exp_lo = exp_hi - 24 * K
    W = ctx.NPE

    def body(j, carry):
        i = ctx.full_idx(j)
        t = ctx.S[pl.ds(i, 1)][0]
        Dr = ctx.D[pl.ds(i % (K * K), 1)][0]
        ebt = _exp_bits(t)
        keep = (ebt + Dr) >= 24
        hi = _scale_arr(jnp.where(keep, t, 0.0), Dr)
        lo = _scale_arr(jnp.where(keep, 0.0, t), Dr + 24 * K)
        ctx.S[pl.ds(W + j, 1)] = hi[None]
        ctx.S[pl.ds(i, 1)] = lo[None]
        return carry

    jax.lax.fori_loop(0, ctx.n_full, body, jnp.int32(0))
    _sweeps_ref(ctx, [(W, ctx.n_full)], K, extract_only=True)
    his = [ctx.S[pl.ds(W + i, 1)][0] for i in range(K)]
    for i in range(K - 1):
        his[i], his[i + 1] = two_sum(his[i], his[i + 1])
    for i in range(K - 1, 0, -1):
        his[i - 1], his[i] = two_sum(his[i - 1], his[i])
    stack = jnp.stack(his, axis=0)
    ebh = _exp_bits(stack)
    keep = ebh >= 26
    spill = _mul_pow2_lift(jnp.where(keep, np.float32(0.0), stack), 24 * K)
    hi = _normalize_st(jnp.where(keep, stack, np.float32(0.0)), exp_hi, K)
    # residual rows lift in place; lo = residual + spill + routed-lo (PE)
    res = _mul_pow2_lift(ctx.S[W + K:W + ctx.n_full], 24 * K)
    ctx.S[W + K:W + ctx.n_full] = res
    T = 2 * ctx.NPE
    ctx.S[T:T + K] = spill
    ctx.S[T + K:T + K + 2] = jnp.zeros((2,) + shape, jnp.float32)
    lo = _finish_renorm(
        ctx, [(W + K, ctx.n_full - K), (T, K + 2), (0, ctx.n_full)],
        K, exp_lo)
    return hi, lo


def wfma_acc_c(ctx: KCtx, acc: WVal, a: WVal, b: WVal) -> WVal:
    """Compact acc + a*b (semantics of wfma_acc)."""
    K = ctx.K
    p0, p1 = mul_full_c(ctx, a[0], b[0])
    cross = add_st_c(ctx, mul_st_c(ctx, a[0], b[1]),
                     mul_st_c(ctx, a[1], b[0]))
    h, e = add_full_c(ctx, acc[0], p0)
    l = add_st_c(ctx, add_st_c(ctx, acc[1], e), add_st_c(ctx, cross, p1))
    return h, l


def wnormalize_c(ctx: KCtx, a: WVal) -> WVal:
    return add_full_c(ctx, a[0], a[1])
