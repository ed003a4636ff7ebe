"""List-form MP arithmetic for Pallas kernel bodies.

ops.mpfloat operates on STACKED limb arrays [K, *shape]; inside a Mosaic
(Pallas TPU) kernel the natural form is a Python LIST of K same-shape tiles
plus (scaled mode) an int32 exponent tile — no stacking, no
optimization_barrier (Mosaic does not lower it, and does not apply the FP
contraction the barrier defends against; verified by the EFT exactness
test in tests/test_pallas_kernels.py).

A value here is `(xs, e)`: xs a list of K base-dtype arrays, e an int32
array broadcastable to xs[i].shape, or None for the classic representation.
Semantics are IDENTICAL to ops.mpfloat (same CAMPARY product plan, same
distillation renorm, same CENTER(K) mantissa ladder; see mpfloat module
docstring) — parity is pinned by tests/test_mplist.py against mpfloat.

SAFETY: functions here are only contraction-safe under Mosaic or with
XLA:CPU fusion emitters disabled; outside kernels use ops.mpfloat.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .eft import quick_two_sum, split, two_prod_presplit, two_sum
from .mpfloat import EXP_ZERO, _MUL_UNIFORM_EXP, center_for

Val = Tuple[List[jnp.ndarray], Optional[jnp.ndarray]]


def pow2f(e):
    """Exact float32 2^e for int32 e in [-126, 127] by bit assembly."""
    bits = ((e + 127) << 23).astype(jnp.int32)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def scale_pow2(xs, d):
    """xs * 2^d elementwise for an int32 array d; three clipped steps cover
    |d| <= 381, residual negative d flushes to zero (mpfloat._scale_pow2_arr
    semantics)."""
    d = jnp.asarray(d, jnp.int32)
    out = list(xs)
    for _ in range(3):
        step = jnp.clip(d, -126, 127)
        f = pow2f(step)
        out = [x * f for x in out]
        d = d - step
    zero = d < 0
    return [jnp.where(zero, jnp.zeros_like(x), x) for x in out]


def _exp_bits_f32(x):
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    return (bits >> 23) & 0xFF


_BARRIER = None


def _use_barrier() -> bool:
    """Wrap renorm inputs in optimization_barrier off-TPU.  Mosaic neither
    lowers the barrier nor contracts FP ops, so kernels on the chip need
    (and must have) none — but the same code traced as plain XLA (parity
    tests, pallas interpret mode on CPU) gets cross-op fma contraction
    that silently destroys the error-free transforms even with fusion
    emitters disabled (observed: composed Newton chains lose limb 2)."""
    global _BARRIER
    if _BARRIER is None:
        _BARRIER = jax.default_backend() == "cpu"
    return _BARRIER


def _b(xs):
    """Pin a limb list against cross-op fusion on XLA:CPU (see
    _use_barrier); identity on TPU/Mosaic."""
    if _use_barrier():
        return list(jax.lax.optimization_barrier(tuple(xs)))
    return list(xs)


def renorm_list(xs, K):
    """Distillation renorm of a limb list into K limbs (classic ladder);
    mpfloat._sweep_unrolled + compaction, list form."""
    xs = _b(xs)
    if len(xs) < K + 1:
        xs = xs + [jnp.zeros_like(xs[0])] * (K + 1 - len(xs))
    m = len(xs)
    for k in range(K + 1):
        if k == m - 1:
            break
        if k == K:
            s = xs[m - 1]
            for i in range(m - 2, k - 1, -1):
                s = s + xs[i]
            xs[k] = s
            break
        for i in range(m - 2, k - 1, -1):
            xs[i], xs[i + 1] = two_sum(xs[i], xs[i + 1])
    for i in range(K):
        xs[i], xs[i + 1] = quick_two_sum(xs[i], xs[i + 1])
    for i in range(K - 1, 0, -1):
        xs[i - 1], xs[i] = quick_two_sum(xs[i - 1], xs[i])
    return xs[:K]


def normalize_scaled(xs, e, K) -> Val:
    """Re-center a renormalized mantissa list so xs[0] has binary exponent
    CENTER(K); exact zeros get EXP_ZERO (mpfloat._normalize_scaled)."""
    C = center_for(K)
    eb = _exp_bits_f32(xs[0])
    is_zero = eb == 0
    shift = jnp.where(is_zero, 0, eb - 127 - C)
    xs = scale_pow2(xs, -shift)
    xs = [jnp.where(is_zero, jnp.zeros_like(x), x) for x in xs]
    e = jnp.where(is_zero, EXP_ZERO, e + shift).astype(jnp.int32)
    return xs, e


def _bshape(a, b):
    return jnp.broadcast_shapes(a[0][0].shape, b[0][0].shape)


def add(a: Val, b: Val, K) -> Val:
    """Full add: classic when both exps are None, else aligned scaled add."""
    axs, ae = a
    bxs, be = b
    if ae is None:
        xs = []
        for i in range(K):
            xs.append(axs[i])
            xs.append(bxs[i])
        return renorm_list(xs, K), None
    e = jnp.maximum(ae, be)
    axs = _b(scale_pow2(axs, ae - e))
    bxs = _b(scale_pow2(bxs, be - e))
    xs = []
    for i in range(K):
        xs.append(axs[i])
        xs.append(bxs[i])
    xs = renorm_list(xs, K)
    shape = _bshape(a, b)
    return normalize_scaled(xs, jnp.broadcast_to(e, shape), K)


def neg(a: Val) -> Val:
    return [-x for x in a[0]], a[1]


def sub(a: Val, b: Val, K) -> Val:
    return add(a, neg(b), K)


def _mul_terms_classic(al, bl, K):
    """Raw CAMPARY term list (classic ladder): exact TwoProds for
    i+j <= K-1, error terms for i+j <= K-2, plain tail at i+j == K —
    ordered by magnitude diagonal (mpfloat.mul)."""
    asp = [split(x) for x in al]
    bsp = [split(x) for x in bl]
    diag = [[] for _ in range(K + 1)]
    for n in range(K):
        for i in range(n + 1):
            j = n - i
            p, e = two_prod_presplit(al[i], *asp[i], bl[j], *bsp[j])
            diag[n].append(p)
            if n + 1 <= K - 1:
                diag[n + 1].append(e)
    tail = None
    for i in range(1, K):
        t = al[i] * bl[K - i]
        tail = t if tail is None else tail + t
    if tail is not None:
        diag[K].append(tail)
    xs = []
    for n in range(K + 1):
        xs.extend(diag[n])
    return xs


def mul(a: Val, b: Val, K) -> Val:
    """Truncated expansion product; scaled mode rides the per-element
    exponent through the uniform-magnitude rescale (mpfloat._mul_vectorized
    semantics, list form)."""
    axs, ae = a
    bxs, be = b
    if ae is None:
        return renorm_list(_mul_terms_classic(_b(axs), _b(bxs), K), K), None
    C = center_for(K)
    U = _MUL_UNIFORM_EXP
    # static per-limb prescale to the uniform magnitude 2^U.  The barrier
    # pins the split/TwoProd inputs: composed XLA:CPU graphs otherwise fold
    # producers into the Dekker arithmetic with layout-dependent rounding.
    pre = [np.float32(2.0 ** (24 * i - C + U)) for i in range(K)]
    al = _b([axs[i] * pre[i] for i in range(K)])
    bl = _b([bxs[i] * pre[i] for i in range(K)])
    asp = [split(x) for x in al]
    bsp = [split(x) for x in bl]
    # diagonal term plan with STATIC two-factor scales back onto the
    # result's CENTER ladder: true term = raw * 2^(C - 2U - 24n), where n is
    # the PRODUCT's diagonal (error terms scale with their product's
    # diagonal, not their ordering diagonal)
    scales = []
    for n in range(K + 1):
        d = C - 2 * U - 24 * n
        d1 = int(np.clip(d, -126, 127))
        d2 = int(np.clip(d - d1, -126, 127))
        scales.append((np.float32(2.0 ** d1), np.float32(2.0 ** d2)))

    def put(term, n):
        f1, f2 = scales[n]
        return term * f1 * f2

    diag = [[] for _ in range(K + 1)]
    for n in range(K):
        for i in range(n + 1):
            j = n - i
            p, err = two_prod_presplit(al[i], *asp[i], bl[j], *bsp[j])
            diag[n].append(put(p, n))
            if n + 1 <= K - 1:
                diag[n + 1].append(put(err, n))
    tail = None
    for i in range(1, K):
        t = al[i] * bl[K - i]
        tail = t if tail is None else tail + t
    if tail is not None:
        diag[K].append(put(tail, K))
    xs = []
    for n in range(K + 1):
        xs.extend(diag[n])
    xs = renorm_list(xs, K)
    shape = _bshape(a, b)
    e = (jnp.broadcast_to(ae, shape).astype(jnp.int32)
         + jnp.broadcast_to(be, shape) + C)
    return normalize_scaled(xs, e, K)


def mask(a: Val, m) -> Val:
    """Zero elements where m is False; scaled mode floors dead exponents."""
    xs, e = a
    mf = m.astype(xs[0].dtype) if m.dtype != xs[0].dtype else m
    xs = [x * mf for x in xs]
    if e is None:
        return xs, None
    shape = jnp.broadcast_shapes(xs[0].shape, jnp.shape(m))
    e = jnp.where(m, jnp.broadcast_to(e, shape), EXP_ZERO)
    return xs, e


def where(cond, a: Val, b: Val) -> Val:
    axs, ae = a
    bxs, be = b
    shape = jnp.broadcast_shapes(axs[0].shape, bxs[0].shape, jnp.shape(cond))
    xs = [jnp.where(cond, jnp.broadcast_to(x, shape),
                    jnp.broadcast_to(y, shape)) for x, y in zip(axs, bxs)]
    if ae is None:
        return xs, None
    e = jnp.where(cond, jnp.broadcast_to(ae, shape),
                  jnp.broadcast_to(be, shape))
    return xs, e


def const(v: float, K, like: Val) -> Val:
    """Broadcastable constant from a float exactly representable in one
    f32 limb (0.5, 1.5, small integers)."""
    xs0, e = like
    shape = (1,) * xs0[0].ndim
    if e is None:
        xs = [jnp.full(shape, np.float32(v) if xs0[0].dtype == jnp.float32
                       else np.float64(v), dtype=xs0[0].dtype)]
        return xs + [jnp.zeros(shape, xs0[0].dtype)] * (K - 1), None
    C = center_for(K)
    m, ex = np.frexp(v)
    top = np.float32(m * 2.0 ** (C + 1))
    xs = [jnp.full(shape, top, jnp.float32)]
    xs += [jnp.zeros(shape, jnp.float32)] * (K - 1)
    return xs, jnp.full(shape, np.int32(ex - 1 - C), jnp.int32)


def from_float(f, e_arr, K, scaled: bool) -> Val:
    """Single-float seed -> MP value: value = f * 2^e_arr."""
    if not scaled:
        return [f] + [jnp.zeros_like(f)] * (K - 1), None
    xs = [f] + [jnp.zeros_like(f)] * (K - 1)
    return normalize_scaled(xs, jnp.asarray(e_arr, jnp.int32), K)


def zeros_like_val(v: Val, shape=None) -> Val:
    xs, e = v
    if shape is None:
        xs_z = [jnp.zeros_like(x) for x in xs]
        e_z = None if e is None else jnp.full(jnp.shape(e), EXP_ZERO, jnp.int32)
        return xs_z, e_z
    xs_z = [jnp.zeros(shape, xs[0].dtype) for _ in xs]
    e_z = None if e is None else jnp.full(shape, EXP_ZERO, jnp.int32)
    return xs_z, e_z


def sum_sublanes(v: Val, K) -> Val:
    """Full-precision MP reduction over axis 0 of [n, m] tiles -> [1, m]:
    zero-pad the sublane count to a power of two, then tree-halve with MP
    adds (mpfloat._sum_axis0 semantics).  MP zeros are exact no-ops in the
    adds, so padding never changes the value."""
    xs, e = v
    n = xs[0].shape[0]
    n_pad = 1
    while n_pad < n:
        n_pad *= 2
    if n_pad != n:
        pad = n_pad - n
        cfg = ((0, pad),) + ((0, 0),) * (xs[0].ndim - 1)
        xs = [jnp.pad(x, cfg) for x in xs]
        if e is not None:
            e = jnp.pad(e, cfg, constant_values=int(EXP_ZERO))
        n = n_pad
    while n > 1:
        h = n // 2
        a = ([x[:h] for x in xs], None if e is None else e[:h])
        b = ([x[h:] for x in xs], None if e is None else e[h:])
        xs, e = add(a, b, K)
        n = h
    return xs, e


def _newton_steps(K):
    n, acc = 0, 1.0
    while acc < K:
        acc *= 2
        n += 1
    return n + 1


def rsqrt(a: Val, K) -> Val:
    """1/sqrt(a) by Newton (a > 0; callers guard).  mpfloat.rsqrt, list
    form."""
    xs, e = a
    scaled = e is not None
    m = xs[0] if K == 1 else xs[0] + xs[1]
    if scaled:
        C = center_for(K)
        E = e + C
        q = E >> 1
        rem = E - 2 * q
        m1 = m * np.float32(2.0 ** -min(C, 126))
        x2 = m1 * pow2f(rem)
        r = from_float(jax.lax.rsqrt(x2), -q, K, True)
    else:
        r = from_float(jax.lax.rsqrt(m), None, K, False)
    half = const(0.5, K, a)
    three_half = const(1.5, K, a)
    for _ in range(_newton_steps(K)):
        arr = mul(a, mul(r, r, K), K)
        r = mul(r, sub(three_half, mul(half, arr, K), K), K)
    return r


def reciprocal(a: Val, K) -> Val:
    """1/a by Newton (mpfloat.reciprocal, list form)."""
    xs, e = a
    scaled = e is not None
    m = xs[0] if K == 1 else xs[0] + xs[1]
    if scaled:
        C = center_for(K)
        m1 = m * np.float32(2.0 ** -min(C, 126))
        r = from_float(1.0 / m1, -(e + C), K, True)
    else:
        r = from_float(1.0 / m, None, K, False)
    one = const(1.0, K, a)
    for _ in range(_newton_steps(K)):
        err = sub(one, mul(a, r, K), K)
        r = add(r, mul(r, err, K), K)
    return r
