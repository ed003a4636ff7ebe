"""Multi-limb floating-point expansions on JAX arrays.

An `MP` value represents a high-precision real number as an *unevaluated sum*
of K machine floats ("limbs"), kept approximately non-overlapping by
renormalization sweeps (Priest/Shewchuk/Bailey-style distillation).  This is
the TPU-native replacement for the reference solver's GMP `El::BigFloat`
(see /root/reference/src/sdp_solve/SDP_Solver — all arithmetic there is GMP
at --precision bits; here precision = limbs × mantissa bits of the base
dtype).

Base dtype selection:
  * float32 limbs — native/IEEE on TPU VPU (float64 on TPU is a non-IEEE
    ~47-bit emulation, verified empirically, so float64 limbs are WRONG on
    TPU).  K=5 limbs ≈ 115 bits ≈ GMP at 106+.
  * float64 limbs — on CPU; K=2 is classic double-double (106 bits),
    K=4 quad-double (212 bits).

Layout: limbs on the LEADING axis, value shape trailing: limbs[K, *shape].
This keeps the trailing (sublane, lane) axes of every tensor aligned with
TPU tiling, and makes limb-wise elementwise ops unit-stride.

All functions are traceable (jit/vmap/shard_map-compatible) and contain no
data-dependent Python control flow.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .eft import two_sum, quick_two_sum, split, two_prod, two_prod_presplit, MANT_BITS


# ---------------------------------------------------------------------------
# Container


@jax.tree_util.register_pytree_node_class
class MP:
    """A high-precision array: unevaluated sum of `K` base-dtype limbs.

    limbs: jnp array of shape [K, *shape]; value = limbs[0] + ... + limbs[K-1].
    """

    __slots__ = ("limbs",)

    def __init__(self, limbs):
        self.limbs = limbs

    # -- pytree protocol
    def tree_flatten(self):
        return (self.limbs,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    # -- metadata
    @property
    def K(self):
        return self.limbs.shape[0]

    @property
    def shape(self):
        return self.limbs.shape[1:]

    @property
    def ndim(self):
        return self.limbs.ndim - 1

    @property
    def dtype(self):
        return self.limbs.dtype

    def __repr__(self):
        return f"MP(K={self.limbs.shape[0]}, shape={self.shape}, dtype={self.dtype})"

    # -- indexing over the VALUE's axes (limbs axis hidden)
    def __getitem__(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        return MP(self.limbs[(slice(None),) + idx])

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return MP(self.limbs.reshape((self.K,) + tuple(shape)))

    def transpose(self, *axes):
        if len(axes) == 1 and isinstance(axes[0], (tuple, list)):
            axes = tuple(axes[0])
        axes = tuple(a + 1 for a in axes)
        return MP(self.limbs.transpose((0,) + axes))

    @property
    def mT(self):
        """Transpose of the last two value axes."""
        perm = list(range(self.limbs.ndim))
        perm[-1], perm[-2] = perm[-2], perm[-1]
        return MP(self.limbs.transpose(perm))

    # -- arithmetic operators
    def __add__(self, o):
        return add(self, _coerce(o, self))

    def __radd__(self, o):
        return add(_coerce(o, self), self)

    def __sub__(self, o):
        return sub(self, _coerce(o, self))

    def __rsub__(self, o):
        return sub(_coerce(o, self), self)

    def __mul__(self, o):
        return mul(self, _coerce(o, self))

    def __rmul__(self, o):
        return mul(_coerce(o, self), self)

    def __truediv__(self, o):
        return div(self, _coerce(o, self))

    def __rtruediv__(self, o):
        return div(_coerce(o, self), self)

    def __neg__(self):
        return MP(-self.limbs)

    def __lt__(self, o):
        return lt(self, _coerce(o, self))

    def __le__(self, o):
        return le(self, _coerce(o, self))

    def __gt__(self, o):
        return lt(_coerce(o, self), self)

    def __ge__(self, o):
        return le(_coerce(o, self), self)


def _coerce(x, like: MP) -> MP:
    if isinstance(x, MP):
        return x
    return from_double(x, like.K, like.dtype)


# ---------------------------------------------------------------------------
# Construction / conversion


def zeros(shape, K, dtype=jnp.float32) -> MP:
    return MP(jnp.zeros((K,) + tuple(shape), dtype=dtype))


def from_limbs(limb_list: Sequence) -> MP:
    return MP(jnp.stack(limb_list, axis=0))


def from_double(x, K, dtype=jnp.float32) -> MP:
    """Exact conversion from float64 (host scalar/ndarray or traced array).

    A float64 value is exactly representable in <= 3 float32 limbs (or 1
    float64 limb), so for host (numpy) input this is lossless.
    """
    if isinstance(x, MP):
        raise TypeError("already MP")
    dt = jnp.dtype(dtype)
    if not isinstance(x, (jax.Array,)):
        # host path — exact peel-off in float64 numpy
        xs = np.asarray(x, dtype=np.float64)
        limbs = []
        rem = xs
        nd = np.dtype("float32") if dt == jnp.dtype(jnp.float32) else np.dtype("float64")
        for _ in range(K):
            hi = rem.astype(nd)
            limbs.append(hi)
            rem = rem - hi.astype(np.float64)
        return MP(jnp.asarray(np.stack(limbs, axis=0), dtype=dt))
    # traced path
    limbs = []
    rem = x
    for _ in range(min(K, 3 if dt == jnp.dtype(jnp.float32) else 1)):
        hi = rem.astype(dt)
        limbs.append(hi)
        rem = rem - hi.astype(x.dtype)
    while len(limbs) < K:
        limbs.append(jnp.zeros_like(limbs[0]))
    return MP(jnp.stack(limbs, axis=0))


def to_double(a: MP):
    """Best float64 approximation (top limbs summed in float64).

    Only meaningful on backends with real float64 (host/CPU); used for
    logging and termination checks, never inside the precision-critical path.
    """
    acc = a.limbs[0].astype(jnp.float64)
    for i in range(1, a.K):
        acc = acc + a.limbs[i].astype(jnp.float64)
    return acc


def to_float_array(a: MP):
    """Approximation in the base dtype (top limb + next limb)."""
    if a.K == 1:
        return a.limbs[0]
    return a.limbs[0] + a.limbs[1]


def round_to(a: MP, K: int) -> MP:
    """Truncate to the leading K limbs (valid rounding for renormalized
    expansions: limbs are non-overlapping, so dropping the tail rounds to
    ~K*p bits).  K larger than a.K zero-extends."""
    if K == a.K:
        return a
    if K < a.K:
        return MP(a.limbs[:K])
    pad = jnp.zeros((K - a.K,) + a.shape, dtype=a.dtype)
    return MP(jnp.concatenate([a.limbs, pad], axis=0))


# ---------------------------------------------------------------------------
# Renormalization ("distillation by repeated extraction")
#
# Given a list of limb arrays whose SUM is the represented value (roughly
# magnitude-ordered), produce K limbs that are approximately
# non-overlapping.  Each bottom-up adjacent TwoSum sweep over positions
# [k..m) is error-free (the multiset sum is invariant) and leaves
# xs[k] = fl(sum of xs[k..m)) with the exact residual distributed over
# xs[k+1..m).  Extracting K times therefore yields limbs where limb k is
# within a few ulps of the exact k-th residual — i.e. each limb contributes
# ~p fresh bits.  (This is Priest-style renormalization via distillation;
# precision is verified against mpmath in tests/test_mpfloat.py.)


def renorm(xs, K):
    """Distill a list of limb arrays into a K-limb MP (value-exact until
    truncation; truncation drops only the smallest residue).

    The optimization_barrier at entry is load-bearing: limb lists arriving
    here may be raw products (or other mul outputs), and a contracting
    compiler would fuse them into the TwoSum adds as fma(a, b, x), breaking
    the error-free property (observed with XLA:CPU fusion emitters).
    """
    xs = list(jax.lax.optimization_barrier(tuple(xs)))
    if len(xs) < K + 1:
        xs = xs + [jnp.zeros_like(xs[0])] * (K + 1 - len(xs))
    m = len(xs)
    # K+1 extractions: limb k becomes fl(sum of residual k), errors kept.
    for k in range(K + 1):
        if k == m - 1:
            break
        if k == K:
            # extra limb: plain float chain-sum of the residue
            s = xs[m - 1]
            for i in range(m - 2, k - 1, -1):
                s = s + xs[i]
            xs[k] = s
            break
        for i in range(m - 2, k - 1, -1):
            xs[i], xs[i + 1] = two_sum(xs[i], xs[i + 1])
    # Each extracted limb can overlap its predecessor by ~log2(m) bits; a
    # top-down compaction pass repacks them so truncation to K limbs keeps
    # the full p*K-bit payload.
    for i in range(K):
        xs[i], xs[i + 1] = quick_two_sum(xs[i], xs[i + 1])
    for i in range(K - 1, 0, -1):
        xs[i - 1], xs[i] = quick_two_sum(xs[i - 1], xs[i])
    return MP(jnp.stack(xs[:K], axis=0))


# ---------------------------------------------------------------------------
# Addition / subtraction


def add(a: MP, b: MP) -> MP:
    assert a.K == b.K, (a.K, b.K)
    al, bl = _broadcast_limbs(a, b)
    # Interleave limbs so the merged list is roughly magnitude-sorted.
    xs = []
    for i in range(a.K):
        xs.append(al[i])
        xs.append(bl[i])
    return renorm(xs, a.K)


def sub(a: MP, b: MP) -> MP:
    return add(a, MP(-b.limbs))


def _broadcast_limbs(a: MP, b: MP):
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    al = [jnp.broadcast_to(a.limbs[i], shape) for i in range(a.K)]
    bl = [jnp.broadcast_to(b.limbs[i], shape) for i in range(b.K)]
    return al, bl


# ---------------------------------------------------------------------------
# Multiplication


def mul(a: MP, b: MP) -> MP:
    """Truncated expansion product (CAMPARY-style diagonal scheme).

    Exact TwoProds for limb pairs with i+j <= K-1, their error terms for
    i+j <= K-2, and a plain-float "tail" for i+j == K.  Relative error is
    O(2^-(p*K)) for renormalized inputs.
    """
    assert a.K == b.K
    K = a.K
    al, bl = _broadcast_limbs(a, b)
    # Pre-split every limb once (each limb participates in up to K products).
    asp = [split(x) for x in al]
    bsp = [split(x) for x in bl]

    diag_terms = [[] for _ in range(K + 1)]
    for n in range(K):
        for i in range(n + 1):
            j = n - i
            p, e = two_prod_presplit(al[i], *asp[i], bl[j], *bsp[j])
            diag_terms[n].append(p)
            if n + 1 <= K - 1:
                diag_terms[n + 1].append(e)
    # tail: i + j == K, plain products (below the kept precision)
    tail = None
    for i in range(1, K):
        t = al[i] * bl[K - i]
        tail = t if tail is None else tail + t
    if tail is not None:
        diag_terms[K].append(tail)

    xs = []
    for n in range(K + 1):
        xs.extend(diag_terms[n])
    return renorm(xs, K)


def mul_pow2(a: MP, p) -> MP:
    """Exact scaling by a power of two (per-element or scalar).

    The factor is cast to the limb dtype first: a strongly-typed float64
    scalar would otherwise upcast float32 limbs under jax_enable_x64."""
    return MP(a.limbs * jnp.asarray(p, dtype=a.dtype))


# ---------------------------------------------------------------------------
# Division / sqrt (Newton iterations in expansion arithmetic)


def _newton_steps(K):
    # limbs of accuracy double per Newton step starting from 1 limb
    n = 0
    acc = 1.0
    while acc < K:
        acc *= 2
        n += 1
    return n + 1  # one extra for safety at the last ulp


def reciprocal(b: MP) -> MP:
    one = from_double(np.float64(1.0), b.K, b.dtype)
    # seed in base precision
    seed = 1.0 / to_float_array(b)
    r0 = MP(jnp.concatenate([seed[None], jnp.zeros_like(b.limbs[1:])], axis=0))

    def body(_, r):
        # r <- r + r*(1 - b*r)
        e = sub(one, mul(b, r))
        return add(r, mul(r, e))

    return jax.lax.fori_loop(0, _newton_steps(b.K), body, r0)


def div(a: MP, b: MP) -> MP:
    r = reciprocal(b)
    q = mul(a, r)
    # one refinement: q += (a - b*q) * r
    rem = sub(a, mul(b, q))
    return add(q, mul(rem, r))


def rsqrt(a: MP) -> MP:
    """1/sqrt(a) via Newton; a must be > 0 (zero/negative produce garbage —
    callers guard).  One Newton chain serves both sqrt and the inverse,
    which halves the factorization loop bodies (see linalg.cholesky)."""
    half = from_double(np.float64(0.5), a.K, a.dtype)
    three_half = from_double(np.float64(1.5), a.K, a.dtype)
    seed = jax.lax.rsqrt(to_float_array(a))
    r = MP(jnp.concatenate([seed[None], jnp.zeros_like(a.limbs[1:])], axis=0))

    def body(_, r):
        # r <- r * (1.5 - 0.5 * a * r^2)
        arr = mul(a, mul(r, r))
        return mul(r, sub(three_half, mul(half, arr)))

    return jax.lax.fori_loop(0, _newton_steps(a.K), body, r)


def sqrt(a: MP) -> MP:
    """sqrt via Newton on the inverse square root; a must be >= 0.

    Zero inputs return zero (guarded), negative inputs produce NaN.
    """
    half = from_double(np.float64(0.5), a.K, a.dtype)
    x0 = to_float_array(a)
    is_zero = x0 <= 0
    a_safe = MP(jnp.where(is_zero, _one_like_limbs(a), a.limbs))
    r = rsqrt(a_safe)
    s = mul(a_safe, r)
    # refinement: s += (a - s^2) * r / 2
    rem = sub(a_safe, mul(s, s))
    s = add(s, mul(rem, mul(r, half)))
    sign_ok = jnp.where(x0 < 0, jnp.full_like(x0, np.nan), 1.0)
    out = MP(s.limbs * sign_ok)
    return MP(jnp.where(is_zero, jnp.zeros_like(out.limbs), out.limbs))


def _one_like_limbs(a: MP):
    one = jnp.zeros_like(a.limbs)
    return one.at[0].set(1.0)


# ---------------------------------------------------------------------------
# Comparisons, selection, reductions


def sign_array(a: MP):
    """Elementwise sign in base dtype: sign of the first nonzero limb."""
    s = jnp.sign(a.limbs[a.K - 1])
    for i in range(a.K - 2, -1, -1):
        s = jnp.where(a.limbs[i] != 0, jnp.sign(a.limbs[i]), s)
    return s


def lt(a: MP, b: MP):
    return sign_array(sub(a, b)) < 0


def le(a: MP, b: MP):
    return sign_array(sub(a, b)) <= 0


def where(cond, a: MP, b: MP) -> MP:
    al, bl = _broadcast_limbs(a, b)
    c = jnp.broadcast_to(cond, al[0].shape)
    return MP(jnp.stack([jnp.where(c, x, y) for x, y in zip(al, bl)], axis=0))


def abs_(a: MP) -> MP:
    s = sign_array(a)
    return MP(a.limbs * jnp.where(s < 0, -1.0, 1.0).astype(a.dtype))


def maximum(a: MP, b: MP) -> MP:
    return where(lt(a, b), b, a)


def minimum(a: MP, b: MP) -> MP:
    return where(lt(a, b), a, b)


def sum_(a: MP, axis=None) -> MP:
    """Tree-reduction sum along `axis` (None = all axes) with full precision."""
    if axis is None:
        flat = a.reshape((int(np.prod(a.shape)),) if a.shape else (1,))
        return _sum_axis0(flat)
    axis = axis % a.ndim
    # move axis to front of value dims
    perm = [axis] + [i for i in range(a.ndim) if i != axis]
    moved = a.transpose(perm)
    return _sum_axis0(moved)


def _sum_axis0(a: MP) -> MP:
    n = a.shape[0]
    while n > 1:
        half = n // 2
        lo = MP(a.limbs[:, :half])
        hi = MP(a.limbs[:, half : 2 * half])
        s = add(lo, hi)
        if n % 2:
            s = MP(jnp.concatenate([s.limbs, a.limbs[:, n - 1 : n]], axis=1))
        a = s
        n = a.shape[0]
    return a[0]


def max_abs(a: MP):
    """max |a| over all elements, returned in base dtype (used for error
    norms, mirroring Block_Diagonal_Matrix::max_abs in the reference)."""
    m = jnp.abs(to_float_array(a))
    return jnp.max(m) if a.ndim else m


def dot(a: MP, b: MP) -> MP:
    """Full-precision dot product of 1-D MP vectors."""
    return sum_(mul(a, b), axis=0)
