"""Multi-limb floating-point expansions on JAX arrays.

An `MP` value represents a high-precision real number as an *unevaluated sum*
of K machine floats ("limbs"), kept approximately non-overlapping by
renormalization sweeps (Priest/Shewchuk/Bailey-style distillation).  This is
the TPU-native replacement for the reference solver's GMP `El::BigFloat`
(see /root/reference/src/sdp_solve/SDP_Solver — all arithmetic there is GMP
at --precision bits; here precision = limbs x mantissa bits of the base
dtype).

Two representations share the MP container:

  * CLASSIC (exp is None): value = sum(limbs).  limbs are raw base-dtype
    floats.  float64 limbs on CPU (K=2 double-double ... K=9 ~= 477 bits;
    the f64 exponent field covers any SDP magnitude).  float32 limbs work
    on TPU only near unit scale: limb k sits ~2^-24k below the top, so the
    f32 exponent floor (~2^-126, and TPU VPU *adds* flush subnormal
    results to zero — verified empirically) caps total precision at ~5
    limbs AND breaks down for small values.  This caused the round-1
    ~1e-12 duality-gap ceiling on TPU.

  * SCALED (exp is an int32 array of the value's shape): value =
    2^exp * sum(limbs), with the mantissa ladder NORMALIZED so limbs[0]
    has binary exponent CENTER(K) = max(0, 24K - 100).  The ladder then
    spans [CENTER - 24(K+1), CENTER] which fits inside f32 normals
    [-126, 127] for K <= 9 (216 bits), while `exp` gives unlimited range.
    This is the TPU replacement for GMP's (mantissa limbs, exponent)
    pair and removes both the overflow (Omega^2 ~ 1e40) and underflow
    (duality gap < 1e-12) walls.  float32-only, K <= 9.

Layout: limbs on the LEADING axis, value shape trailing: limbs[K, *shape];
exp (scaled mode) has exactly the value shape.  This keeps the trailing
(sublane, lane) axes of every tensor aligned with TPU tiling, and makes
limb-wise elementwise ops unit-stride.

Graph-size discipline: expansion arithmetic unrolled over limbs produces
XLA graphs that grow ~K^2 per multiply and ~K*m per renormalization — at
K >= 6 single-core compiles took hours in round 1.  Two mechanisms keep the
traced graph (nearly) K-independent:
  * vectorized multiply: ONE broadcast TwoProd over the [K, K] outer
    product plus a static gather by diagonals, instead of K^2 scalar-graph
    TwoProds;
  * scan renorm: each distillation sweep is a lax.scan carry chain instead
    of an unrolled TwoSum ladder (enabled at K >= 6 where compile time
    dominates; small K keeps the fully-fused unrolled form).

All functions are traceable (jit/vmap/shard_map-compatible) and contain no
data-dependent Python control flow.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .eft import two_sum, quick_two_sum, split, two_prod_presplit, MANT_BITS


# exponent assigned to exact zeros in scaled mode: low enough that a zero
# never dominates an alignment max, high enough that int32 sums of two
# exponents (mul) cannot wrap.
EXP_ZERO = np.int32(-(1 << 24))


def _is_wide(x) -> bool:
    """True for ops.mpwide.MPW compound values (>216-bit scaled).  Checked
    by name to avoid a circular import; every public entry point of this
    module routes wide operands to ops.mpwide."""
    return type(x).__name__ == "MPW"


def _wide():
    from . import mpwide

    return mpwide

# renorm switches to lax.scan sweeps at this K (compile-time vs fused-kernel
# runtime trade; see module docstring).  Overridable for experiments.
# NOTE: which side wins is PLATFORM-dependent — XLA:CPU chokes on big
# unrolled graphs (K=6 DNF), while XLA:TPU compiles unrolled chains fine
# and pays a hard per-trip toll on while loops (profiled round 4: each
# scan-renorm'd scalar MP op costs ~10-20 us of loop overhead x 7 sweeps,
# making one scalar mp.div ~3 ms on-chip).  Defaults: scan on CPU from
# K=6 (classic) / K=4 (scaled); never on TPU (unrolled up to the m cap in
# _renorm_stacked).  Env overrides force one choice on BOTH platforms.
_SCAN_MIN_K = os.environ.get("SDPB_TPU_SCAN_RENORM_MIN_K")
_SCAN_MIN_K_SCALED = os.environ.get("SDPB_TPU_SCAN_RENORM_MIN_K_SCALED")
_SCAN_UNROLL = int(os.environ.get("SDPB_TPU_SCAN_RENORM_UNROLL", "4"))


def _scan_min_k(scaled: bool) -> int:
    env = _SCAN_MIN_K_SCALED if scaled else _SCAN_MIN_K
    if env is not None:
        return int(env)
    if jax.default_backend() == "cpu":
        return 4 if scaled else 6
    return 10**9
# multiply uses the vectorized outer-product form at this K and above.
_VEC_MUL_MIN_K = int(os.environ.get("SDPB_TPU_VEC_MUL_MIN_K", "3"))

# uniform magnitude (binary exponent) that scaled-mode multiply rescales
# every mantissa limb to before forming products: products sit at ~2^(2*15),
# their Dekker error terms at ~2^6, comfortably inside f32 normals.
_MUL_UNIFORM_EXP = 15


def center_for(K: int) -> int:
    """Binary exponent of limbs[0] for normalized scaled-mode mantissas.

    max(0, 24K - 100) keeps the whole ladder (plus one guard limb of TwoSum
    error terms at CENTER - 24(K+1)) at or above 2^-126: TPU f32 adds flush
    subnormal RESULTS to zero (verified empirically; multiplies do not), so
    every EFT intermediate must stay normal.  The ceiling CENTER <= 120
    bounds K <= 9 (216 bits) for scaled f32."""
    return max(0, 24 * K - 100)


# ---------------------------------------------------------------------------
# Container


@jax.tree_util.register_pytree_node_class
class MP:
    """A high-precision array: unevaluated sum of `K` base-dtype limbs,
    optionally scaled by a per-element power-of-two exponent.

    limbs: jnp array of shape [K, *shape]
    exp:   None (classic) or int32 array of shape [*shape] (scaled);
           value = 2^exp * (limbs[0] + ... + limbs[K-1]).
    """

    __slots__ = ("limbs", "exp")

    def __init__(self, limbs, exp=None):
        self.limbs = limbs
        self.exp = exp

    # -- pytree protocol
    def tree_flatten(self):
        return (self.limbs, self.exp), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1])

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

    @property
    def scaled(self) -> bool:
        return self.exp is not None

    def __repr__(self):
        return (f"MP(K={self.limbs.shape[0]}, shape={self.shape}, "
                f"dtype={self.dtype}, scaled={self.scaled})")

    # -- indexing over the VALUE's axes (limbs axis hidden)
    def __getitem__(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        e = None if self.exp is None else self.exp[idx]
        return MP(self.limbs[(slice(None),) + idx], e)

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        e = None if self.exp is None else self.exp.reshape(shape)
        return MP(self.limbs.reshape((self.K,) + tuple(shape)), e)

    def transpose(self, *axes):
        if len(axes) == 1 and isinstance(axes[0], (tuple, list)):
            axes = tuple(axes[0])
        e = None if self.exp is None else self.exp.transpose(axes)
        laxes = tuple(a + 1 for a in axes)
        return MP(self.limbs.transpose((0,) + laxes), e)

    @property
    def mT(self):
        """Transpose of the last two value axes."""
        perm = list(range(self.limbs.ndim))
        perm[-1], perm[-2] = perm[-2], perm[-1]
        e = None
        if self.exp is not None:
            ep = list(range(self.exp.ndim))
            ep[-1], ep[-2] = ep[-2], ep[-1]
            e = self.exp.transpose(ep)
        return MP(self.limbs.transpose(perm), e)

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
        return MP(-self.limbs, self.exp)

    def __lt__(self, o):
        return lt(self, _coerce(o, self))

    def __le__(self, o):
        return le(self, _coerce(o, self))

    def __gt__(self, o):
        return lt(_coerce(o, self), self)

    def __ge__(self, o):
        return le(_coerce(o, self), self)


def _coerce(x, like) -> MP:
    if isinstance(x, MP) or _is_wide(x):
        return x
    return from_double(x, like.K, like.dtype, scaled=like.scaled)


def _check_modes(a: MP, b: MP):
    if a.scaled != b.scaled:
        raise TypeError("cannot mix scaled and classic MP operands")


# ---------------------------------------------------------------------------
# Power-of-two machinery (scaled mode)


def _pow2f(e):
    """Exact float32 2^e for int32 e in [-126, 127], built by bit assembly
    (immune to any libm exp2 inexactness; TPU exp2 was observed inexact for
    subnormal results)."""
    bits = ((e + 127) << 23).astype(jnp.int32)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _scale_pow2_arr(limbs, d):
    """limbs * 2^d, d an int32 array broadcastable to the value shape
    (limbs [K, *shape]).  Three clipped steps cover |d| <= 381, beyond every
    shift this package generates (alignment is floored by renorm truncation,
    normalization shifts are bounded by |exp drift| + CENTER <= ~370);
    residual negative d flushes to zero, which is then the correctly rounded
    result."""
    d = jnp.asarray(d, jnp.int32)
    out = limbs
    for _ in range(3):
        step = jnp.clip(d, -126, 127)
        # barrier: keep XLA from combining the staged factors (their
        # product can overflow f32 even though each staged result is exact).
        # The exit barrier also stops reassociation ACROSS op boundaries —
        # this call's last factor fusing with the NEXT op's first factor.
        out = jax.lax.optimization_barrier(out * _pow2f(step)[None])
        d = d - step
    return jax.lax.optimization_barrier(
        jnp.where((d < 0)[None], jnp.zeros_like(out), out))


def _scale_pow2_rows(rows, d):
    """rows * 2^d with d PER ROW (both [m, *shape]); exact staged pow2
    multiplies with barriers (see _scale_pow2_arr, which instead applies a
    per-VALUE d to every limb row)."""
    d = jnp.asarray(d, jnp.int32)
    out = rows
    for _ in range(3):
        step = jnp.clip(d, -126, 127)
        out = jax.lax.optimization_barrier(out * _pow2f(step))
        d = d - step
    return jax.lax.optimization_barrier(
        jnp.where(d < 0, jnp.zeros_like(out), out))


def _exp_bits_f32(x):
    """Biased exponent field of float32 x (0 for zero/subnormal)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    return (bits >> 23) & 0xFF


def _normalize_scaled(limbs, exp, K):
    """Re-center a renormalized mantissa so limbs[0] has binary exponent
    CENTER(K); exact zeros (top limb 0 or subnormal — only reachable by a
    >240-bit cancellation, i.e. numerically zero) get EXP_ZERO."""
    C = center_for(K)
    eb = _exp_bits_f32(limbs[0])
    is_zero = eb == 0
    shift = jnp.where(is_zero, 0, eb - 127 - C)
    limbs = _scale_pow2_arr(limbs, -shift)
    limbs = jnp.where(is_zero[None], jnp.zeros_like(limbs), limbs)
    exp = jnp.where(is_zero, EXP_ZERO, exp + shift)
    return limbs, exp.astype(jnp.int32)


def _assert_scaled_ok(K, dtype):
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        raise TypeError("scaled MP requires float32 limbs")
    if K > 9:
        raise ValueError(
            f"scaled f32 MP supports K <= 9 (~216 bits); got K={K}. "
            "Use float64 limbs (classic mode, CPU) for higher precision.")


# ---------------------------------------------------------------------------
# Construction / conversion


def zeros(shape, K, dtype=jnp.float32, scaled: bool = False) -> MP:
    if scaled and K > 9:
        return _wide().zeros(shape, K, dtype)
    limbs = jnp.zeros((K,) + tuple(shape), dtype=dtype)
    if not scaled:
        return MP(limbs)
    _assert_scaled_ok(K, dtype)
    return MP(limbs, jnp.full(tuple(shape), EXP_ZERO, dtype=jnp.int32))


def from_limbs(limb_list: Sequence) -> MP:
    return MP(jnp.stack(limb_list, axis=0))


def from_parts(limbs, exp) -> MP:
    """Wrap device/host (limbs, exp) arrays as a scaled MP."""
    return MP(jnp.asarray(limbs), jnp.asarray(exp, dtype=jnp.int32))


def _from_float_exp(f, e, K) -> MP:
    """Scaled MP from a base-dtype float array and an int exponent array:
    value = f * 2^e (f32, ~24 bits; used for Newton seeds)."""
    limbs = jnp.concatenate(
        [f[None], jnp.zeros((K - 1,) + f.shape, dtype=f.dtype)], axis=0)
    limbs, exp = _normalize_scaled(limbs, jnp.asarray(e, jnp.int32), K)
    return MP(limbs, exp)


def from_double(x, K, dtype=jnp.float32, scaled: bool = False) -> MP:
    """Exact conversion from float64 (host scalar/ndarray or traced array).

    A float64 value is exactly representable in <= 3 float32 limbs (or 1
    float64 limb), so for host (numpy) input this is lossless in both modes.
    """
    if isinstance(x, MP) or _is_wide(x):
        raise TypeError("already MP")
    if scaled and K > 9:
        return _wide().from_double(x, K, dtype)
    dt = jnp.dtype(dtype)
    if scaled:
        _assert_scaled_ok(K, dtype)
        if isinstance(x, jax.Array):
            # traced path (seeds etc.): f32-accurate only
            return _from_float_exp(x.astype(dt), jnp.zeros(x.shape, jnp.int32), K)
        limbs, exp = f64_to_scaled_parts(np.asarray(x, dtype=np.float64), K)
        return MP(jnp.asarray(limbs, dtype=dt), jnp.asarray(exp))
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


def f64_to_scaled_parts(xs: np.ndarray, K: int):
    """Host numpy float64 array -> (f32 limbs [K, *shape], int32 exp [*shape]),
    exact (float64 carries <= 53 bits, so 3 limbs suffice; the rest are 0)."""
    xs = np.asarray(xs, dtype=np.float64)
    C = center_for(K)
    m, e = np.frexp(xs)                      # x = m * 2^e, m in [0.5, 1)
    is_zero = xs == 0.0
    shift = np.where(is_zero, 0, C + 1 - e).astype(np.int32)
    sv = np.ldexp(xs, shift)                 # exact: |sv| ~ 2^C well inside f64
    limbs = np.zeros((K,) + xs.shape, dtype=np.float32)
    rem = sv
    for k in range(min(K, 3)):
        hi = rem.astype(np.float32)
        limbs[k] = hi
        rem = rem - hi.astype(np.float64)
    exp = np.where(is_zero, EXP_ZERO, -shift).astype(np.int32)
    return limbs, exp


def f64_limbs_to_scaled_parts(limbs64: np.ndarray, K: int):
    """Host conversion of CLASSIC float64 limb stacks [K64, *shape] (up to
    53*K64 bits) into scaled-f32 parts (f32 limbs [K, *shape], int32 exp).

    Used when staging high-precision host problem data to the TPU: the host
    pipeline reads with float64 limbs (unbounded range, full precision),
    this peels the f32 mantissa ladder at the value's own exponent.
    Vectorized numpy; every operation is exact (power-of-two scalings and
    float64 TwoSums)."""
    limbs64 = np.asarray(limbs64, dtype=np.float64)
    K64 = limbs64.shape[0]
    shape = limbs64.shape[1:]
    C = center_for(K)
    top = limbs64[0]
    is_zero = top == 0.0
    m, e = np.frexp(top)
    shift = np.where(is_zero, 0, C + 1 - e).astype(np.int32)
    # residual list: exactly scaled f64 limbs (value * 2^shift)
    res = [np.ldexp(limbs64[k], shift) for k in range(K64)]

    def _distill(rs):
        # bottom-up float64 TwoSum sweep: rs[0] becomes fl64(sum), exact
        for i in range(len(rs) - 2, -1, -1):
            s = rs[i] + rs[i + 1]
            v = s - rs[i]
            err = (rs[i] - (s - v)) + (rs[i + 1] - v)
            rs[i], rs[i + 1] = s, err
        return rs

    out = np.zeros((K,) + shape, dtype=np.float32)
    for k in range(K):
        res = _distill(res)
        hi = res[0].astype(np.float32)
        out[k] = hi
        res[0] = res[0] - hi.astype(np.float64)   # exact
    exp = np.where(is_zero, EXP_ZERO, -shift).astype(np.int32)
    if shape:
        out[:, is_zero] = 0.0
    elif is_zero:
        out[:] = 0.0
    return out, exp


def scaled_parts_to_f64_limbs(limbs: np.ndarray, exp: np.ndarray,
                              K64: int) -> np.ndarray:
    """Host conversion of scaled parts back to CLASSIC float64 limb stacks
    [K64, *shape] (the portable on-disk format: checkpoints and text
    solutions always store classic f64 limbs so they are readable by any
    device representation or precision).  Exact while 2^exp * limb stays
    inside float64's range — true for all solver STATE (x, X, y, Y), whose
    magnitudes are physical (<= Omega^2); only transient device
    intermediates exceed it."""
    limbs = np.asarray(limbs, dtype=np.float64)
    exp = np.asarray(exp)
    K = limbs.shape[0]
    # lower clip only (protects the EXP_ZERO sentinel: 2^-1500 * limb
    # underflows to exact 0).  The upper side must NOT be clipped — a
    # magnitude beyond f64's range is unserializable and must fail loudly
    # below, not silently shrink.
    e = np.maximum(exp, -1500).astype(np.int64)
    with np.errstate(over="ignore"):
        res = [np.ldexp(limbs[k], e) for k in range(K)]
    if not np.all(np.isfinite(res[0])):
        raise ValueError(
            "scaled value exceeds float64 range (|x| > ~1e308); cannot "
            "serialize to classic f64 limbs")

    def _distill(rs):
        for i in range(len(rs) - 2, -1, -1):
            s = rs[i] + rs[i + 1]
            v = s - rs[i]
            err = (rs[i] - (s - v)) + (rs[i + 1] - v)
            rs[i], rs[i + 1] = s, err
        return rs

    out = np.zeros((K64,) + limbs.shape[1:], dtype=np.float64)
    for k in range(K64):
        res = _distill(res)
        out[k] = res[0]
        res[0] = res[0] - out[k]
    return out


def host_f64_limbs(a: MP, K64: int = 0) -> np.ndarray:
    """Any host-materialized MP -> classic float64 limb stack (see
    scaled_parts_to_f64_limbs).  K64 defaults to enough limbs to keep the
    full mantissa."""
    if _is_wide(a):
        return _wide().host_f64_limbs(a, K64)
    p = 24 if jnp.dtype(a.dtype) == jnp.dtype(jnp.float32) else 53
    if not K64:
        K64 = -(-(p * a.K) // 53) + 1
    if a.scaled:
        return scaled_parts_to_f64_limbs(np.asarray(a.limbs),
                                         np.asarray(a.exp), K64)
    limbs = np.asarray(a.limbs, dtype=np.float64)
    if limbs.shape[0] == K64 and p == 53:
        return limbs
    return scaled_parts_to_f64_limbs(limbs, np.zeros(a.shape, np.int32), K64)


def f64_limbs_to_classic(limbs64: np.ndarray, K: int, np_dtype) -> np.ndarray:
    """Host float64 limb stack -> classic limbs of the requested dtype/K
    (precision-portable checkpoint loading)."""
    limbs64 = np.asarray(limbs64, dtype=np.float64)
    res = [limbs64[k] for k in range(limbs64.shape[0])]

    def _distill(rs):
        for i in range(len(rs) - 2, -1, -1):
            s = rs[i] + rs[i + 1]
            v = s - rs[i]
            err = (rs[i] - (s - v)) + (rs[i + 1] - v)
            rs[i], rs[i + 1] = s, err
        return rs

    out = np.zeros((K,) + limbs64.shape[1:], dtype=np_dtype)
    for k in range(K):
        res = _distill(res)
        hi = res[0].astype(np_dtype)
        out[k] = hi
        res[0] = res[0] - hi.astype(np.float64)
    return out


def to_scaled(a: MP) -> MP:
    """Classic -> scaled on device (exact: power-of-two rescaling preserves
    every representable limb, and f32 multiplies keep subnormal inputs)."""
    if a.scaled:
        return a
    _assert_scaled_ok(a.K, a.dtype)
    limbs, exp = _normalize_scaled(a.limbs, jnp.zeros(a.shape, jnp.int32), a.K)
    return MP(limbs, exp)


def to_double(a: MP):
    """Best float64 approximation (top limbs summed in float64).

    Only meaningful on backends with real float64 (host/CPU); used for
    logging and termination checks, never inside the precision-critical path.
    """
    if _is_wide(a):
        return _wide().to_double(a)
    acc = a.limbs[0].astype(jnp.float64)
    for i in range(1, a.K):
        acc = acc + a.limbs[i].astype(jnp.float64)
    if a.scaled:
        # exact bit-assembled 2^e (XLA's f64 exp2 is off by an ulp); values
        # beyond f64's exponent range saturate via two factors
        e = jnp.clip(a.exp.astype(jnp.int64), -2044, 2046)
        e1 = jnp.clip(e, -1022, 1023)
        e2 = e - e1
        for ek in (e1, e2):
            p = jax.lax.bitcast_convert_type((ek + 1023) << 52, jnp.float64)
            acc = acc * p
    return acc


def to_float_array(a: MP):
    """Approximation in the base dtype (top limb + next limb).  Scaled mode
    folds the exponent in with saturation: overflow -> +-finfo.max,
    underflow -> 0 (adequate for the logging/threshold/seed uses)."""
    if _is_wide(a):
        return _wide().to_float_array(a)
    m = a.limbs[0] if a.K == 1 else a.limbs[0] + a.limbs[1]
    if not a.scaled:
        return m
    C = center_for(a.K)
    m1 = m * np.float32(2.0 ** -min(C, 126))   # ~[1, 2)
    e = a.exp + C
    over = e > 127
    # two-factor exponent fold so values below 2^-126 underflow gradually
    # to subnormals/0 instead of flooring at f32's min normal (TPU f32
    # multiplies keep subnormal results; only adds flush them)
    e1 = jnp.clip(e, -126, 127)
    e2 = jnp.clip(e - e1, -126, 0)
    f = m1 * _pow2f(e1) * _pow2f(e2)
    big = jnp.asarray(np.finfo(np.float32).max, a.dtype)
    return jnp.where(over, jnp.sign(m) * big, f)


def round_to(a: MP, K: int) -> MP:
    """Truncate to the leading K limbs (valid rounding for renormalized
    expansions: limbs are non-overlapping, so dropping the tail rounds to
    ~K*p bits).  K larger than a.K zero-extends.  Scaled mode re-centers the
    mantissa on the new K's ladder."""
    if _is_wide(a):
        return _wide().round_to(a, K)
    if not _is_wide(a) and a.scaled and K > 9:
        return _wide().widen(a, K)
    if K == a.K:
        return a
    if K < a.K:
        limbs = a.limbs[:K]
    else:
        pad = jnp.zeros((K - a.K,) + a.shape, dtype=a.dtype)
        limbs = jnp.concatenate([a.limbs, pad], axis=0)
    if not a.scaled:
        return MP(limbs)
    limbs, exp = _normalize_scaled(limbs, a.exp, K)
    return MP(limbs, exp)


# ---------------------------------------------------------------------------
# Structural helpers (exp-aware; use these instead of raw MP(limbs) surgery)


def neg(a: MP) -> MP:
    if _is_wide(a):
        return _wide().neg(a)
    return MP(-a.limbs, a.exp)


def mask_value(a: MP, m) -> MP:
    """Zero out elements where mask m (broadcastable to a.shape) is 0.
    Scaled mode floors the masked exponents so dead elements never dominate
    an alignment max."""
    if _is_wide(a):
        return _wide().mask_value(a, m)
    mb = jnp.broadcast_to(m, a.shape).astype(a.dtype)
    limbs = a.limbs * mb[None]
    if a.exp is None:
        return MP(limbs)
    exp = jnp.where(mb > 0, jnp.broadcast_to(a.exp, a.shape), EXP_ZERO)
    return MP(limbs, exp)


def take(a: MP, idx, axis: int) -> MP:
    if _is_wide(a):
        return _wide().take(a, idx, axis)
    axis = axis % a.ndim
    limbs = jnp.take(a.limbs, idx, axis=axis + 1)
    e = None if a.exp is None else jnp.take(a.exp, idx, axis=axis)
    return MP(limbs, e)


def stack(ms: List[MP], axis: int) -> MP:
    if _is_wide(ms[0]):
        return _wide().stack(ms, axis)
    nd = ms[0].ndim + 1
    axis = axis % nd
    limbs = jnp.stack([m.limbs for m in ms], axis=axis + 1)
    if ms[0].exp is None:
        return MP(limbs)
    shape = ms[0].shape
    e = jnp.stack([jnp.broadcast_to(m.exp, shape) for m in ms], axis=axis)
    return MP(limbs, e)


def concatenate(ms: List[MP], axis: int) -> MP:
    if _is_wide(ms[0]):
        return _wide().concatenate(ms, axis)
    axis = axis % ms[0].ndim
    limbs = jnp.concatenate([m.limbs for m in ms], axis=axis + 1)
    if ms[0].exp is None:
        return MP(limbs)
    e = jnp.concatenate([m.exp for m in ms], axis=axis)
    return MP(limbs, e)


def broadcast_to(a: MP, shape) -> MP:
    if _is_wide(a):
        return _wide().broadcast_to(a, shape)
    shape = tuple(shape)
    limbs = _bcast(a.limbs, a.K, shape)
    e = None if a.exp is None else jnp.broadcast_to(a.exp, shape)
    return MP(limbs, e)


def diagonal(a: MP) -> MP:
    """Diagonal over the last two value axes."""
    if _is_wide(a):
        return _wide().diagonal(a)
    l = jnp.diagonal(a.limbs, axis1=-2, axis2=-1)
    e = None if a.exp is None else jnp.diagonal(a.exp, axis1=-2, axis2=-1)
    return MP(l, e)


def set_block(a: MP, idx: tuple, b: MP) -> MP:
    """a with the value-slice a[idx] replaced by b (shapes must match)."""
    if _is_wide(a):
        return _wide().set_block(a, idx, b)
    limbs = a.limbs.at[(slice(None),) + idx].set(b.limbs)
    if a.exp is None:
        return MP(limbs)
    tgt = a.exp[idx].shape
    e = a.exp.at[idx].set(jnp.broadcast_to(b.exp, tgt))
    return MP(limbs, e)


def scalar_eye(s: MP, n: int) -> MP:
    """s * I as an [..., n, n] MP from a scalar/batched-scalar s."""
    if _is_wide(s):
        return _wide().scalar_eye(s, n)
    eye = jnp.eye(n, dtype=s.dtype)
    limbs = s.limbs[..., None, None] * eye
    if s.exp is None:
        return MP(limbs)
    e = jnp.where(eye > 0, s.exp[..., None, None], EXP_ZERO)
    return MP(limbs, e)


def expand_dims(a: MP, axis: int) -> MP:
    """Insert a singleton value axis at `axis` (negative = from the end)."""
    if _is_wide(a):
        return _wide().expand_dims(a, axis)
    if axis < 0:
        axis = a.ndim + 1 + axis
    limbs = jnp.expand_dims(a.limbs, axis + 1)
    e = None if a.exp is None else jnp.expand_dims(a.exp, axis)
    return MP(limbs, e)


def align_mantissa(a: MP, e) -> MP:
    """Rewrite a scaled MP onto the common exponent `e` WITHOUT renorm
    (limbs lose non-overlap; feed the result to renorm).  Used by the
    cross-device psum: limbs can only be summed at a shared exponent."""
    d = a.exp - e
    return MP(_scale_pow2_arr(a.limbs, d), jnp.broadcast_to(e, a.shape))


def dynamic_slice_in_dim(a: MP, start, size: int, axis: int) -> MP:
    if _is_wide(a):
        return _wide().dynamic_slice_in_dim(a, start, size, axis)
    axis = axis % a.ndim
    limbs = jax.lax.dynamic_slice_in_dim(a.limbs, start, size, axis=axis + 1)
    e = None
    if a.exp is not None:
        e = jax.lax.dynamic_slice_in_dim(a.exp, start, size, axis=axis)
    return MP(limbs, e)


def pad_dim(a: MP, axis: int, count: int) -> MP:
    """Zero-pad `count` elements at the end of value axis `axis`."""
    if _is_wide(a):
        return _wide().pad_dim(a, axis, count)
    axis = axis % a.ndim
    cfg = [(0, 0)] * (a.ndim + 1)
    cfg[axis + 1] = (0, count)
    limbs = jnp.pad(a.limbs, cfg)
    if a.exp is None:
        return MP(limbs)
    ecfg = [(0, 0)] * a.ndim
    ecfg[axis] = (0, count)
    e = jnp.pad(a.exp, ecfg, constant_values=int(EXP_ZERO))
    return MP(limbs, e)


# ---------------------------------------------------------------------------
# Renormalization ("distillation by repeated extraction")
#
# Given a stack of limb arrays whose SUM is the represented value (roughly
# magnitude-ordered), produce K limbs that are approximately
# non-overlapping.  Each bottom-up adjacent TwoSum sweep over positions
# [k..m) is error-free (the multiset sum is invariant) and leaves
# xs[k] = fl(sum of xs[k..m)) with the exact residual distributed over
# xs[k+1..m).  Extracting K times therefore yields limbs where limb k is
# within a few ulps of the exact k-th residual — i.e. each limb contributes
# ~p fresh bits.  (Priest-style renormalization via distillation; precision
# is verified against mpmath in tests/test_mpfloat.py.)


def _sweep_unrolled(xs, K):
    m = len(xs)
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
    return xs


def _sweep_scan(S, K):
    """Same extraction sweeps as _sweep_unrolled, expressed as lax.scan
    carry chains so the traced graph is O(K) instead of O(K * m)."""
    m = S.shape[0]

    def step(carry, x):
        s, e = two_sum(x, carry)
        return s, e

    for k in range(K + 1):
        if k == m - 1:
            break
        if k == K:
            top = jnp.sum(S[K:], axis=0)
            S = jnp.concatenate([S[:K], top[None]], axis=0)
            break
        seg = S[k:]
        rev = jnp.flip(seg[:-1], axis=0)           # positions m-2 .. k
        c, errs = jax.lax.scan(step, seg[-1], rev, unroll=_SCAN_UNROLL)
        errs = jnp.flip(errs, axis=0)              # slots k+1 .. m-1
        S = jnp.concatenate([S[:k], c[None], errs], axis=0)
    return [S[i] for i in range(min(m, K + 1))]


def _renorm_stacked(S, K, exp=None) -> MP:
    """Renormalize a stacked [m, *shape] limb array into a K-limb MP.
    With exp (scaled mode): the stack is a mantissa at common exponent
    `exp`; the result is re-centered on the CENTER(K) ladder."""
    m = S.shape[0]
    if m < K + 2:
        S = jnp.concatenate(
            [S, jnp.zeros((K + 2 - m,) + S.shape[1:], S.dtype)], axis=0)
        m = S.shape[0]
    # The barrier must wrap the individual rows, not the stacked buffer:
    # XLA:CPU simplifies slice(stack(...)) through a whole-array barrier and
    # then contracts producer multiplies into the TwoSum adds as fma,
    # silently destroying the error-free property (observed: K=2 Cholesky
    # lost its second limb with a stacked-value barrier).
    rows = jax.lax.optimization_barrier(tuple(S[i] for i in range(m)))
    S = jnp.stack(rows, axis=0)
    # scaled-mode renorms carry ~3x the ops (alignment + normalization), so
    # the compile-size wall arrives earlier: scan from K=4 there (CPU).
    # On TPU the unrolled form wins at every K (see _scan_min_k) up to the
    # m cap, past which graph size forces the scan even there.
    m_cap = 96 if jax.default_backend() != "cpu" else 6 * (K + 2)
    if K >= _scan_min_k(exp is not None) or m > m_cap:
        xs = _sweep_scan(S, K)
    else:
        xs = _sweep_unrolled([S[i] for i in range(m)], K)
    # Each extracted limb can overlap its predecessor by ~log2(m) bits; a
    # top-down compaction pass repacks them so truncation to K limbs keeps
    # the full p*K-bit payload.
    for i in range(K):
        xs[i], xs[i + 1] = quick_two_sum(xs[i], xs[i + 1])
    for i in range(K - 1, 0, -1):
        xs[i - 1], xs[i] = quick_two_sum(xs[i - 1], xs[i])
    limbs = jnp.stack(xs[:K], axis=0)
    if exp is None:
        return MP(limbs)
    limbs, exp = _normalize_scaled(limbs, exp, K)
    return MP(limbs, exp)


def renorm(xs, K, exp=None) -> MP:
    """Distill a list of limb arrays into a K-limb MP (value-exact until
    truncation; truncation drops only the smallest residue).

    The optimization_barrier at entry is load-bearing: limb lists arriving
    here may be raw products (or other mul outputs), and a contracting
    compiler would fuse them into the TwoSum adds as fma(a, b, x), breaking
    the error-free property (observed with XLA:CPU fusion emitters).
    """
    shape = jnp.broadcast_shapes(*[x.shape for x in xs])
    xs = [jnp.broadcast_to(x, shape) for x in xs]
    return _renorm_stacked(jnp.stack(xs, axis=0), K, exp=exp)


# ---------------------------------------------------------------------------
# Addition / subtraction


def _bcast(limbs, K, shape):
    """Broadcast [K, *value] limbs to [K, *shape] (left-pad the value dims)."""
    vdim = limbs.ndim - 1
    lead = len(shape) - vdim
    return jnp.broadcast_to(
        limbs.reshape((K,) + (1,) * lead + limbs.shape[1:]), (K,) + shape)


def _broadcast_limbs(a: MP, b: MP):
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    al = _bcast(a.limbs, a.K, shape)
    bl = _bcast(b.limbs, b.K, shape)
    return [al[i] for i in range(a.K)], [bl[i] for i in range(b.K)]


def add(a: MP, b: MP) -> MP:
    if _is_wide(a) or _is_wide(b):
        return _wide().add(a, b)
    assert a.K == b.K, (a.K, b.K)
    _check_modes(a, b)
    K = a.K
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    al = _bcast(a.limbs, K, shape)
    bl = _bcast(b.limbs, K, shape)
    exp = None
    if a.scaled:
        ae = jnp.broadcast_to(a.exp, shape)
        be = jnp.broadcast_to(b.exp, shape)
        exp = jnp.maximum(ae, be)
        al = _scale_pow2_arr(al, ae - exp)
        bl = _scale_pow2_arr(bl, be - exp)
    # Interleave limbs so the merged stack is roughly magnitude-sorted.
    S = jnp.stack([al, bl], axis=1).reshape((2 * K,) + shape)
    return _renorm_stacked(S, K, exp=exp)


def sub(a: MP, b: MP) -> MP:
    return add(a, neg(b))


# ---------------------------------------------------------------------------
# Multiplication


def _mul_term_plan(K):
    """Static gather plan for the vectorized product: row indices into the
    stacked [2*K*K] (products, errors) array, ordered by effective
    magnitude diagonal (the CAMPARY-style truncated scheme: exact TwoProds
    for i+j <= K-1, their error terms sitting one diagonal down for
    i+j <= K-2, plain products as the i+j == K tail).

    Returns (idx, scale_diag): scale_diag is the PRODUCT's diagonal i+j —
    the raw-to-true scaling of an error term is that of its product (the
    error is merely ~24 bits smaller), even though it is *ordered* one
    diagonal later."""
    idx, sdiag = [], []
    for n in range(K + 1):
        if n < K:
            for i in range(0, n + 1):
                j = n - i
                idx.append(i * K + j)          # product of diagonal n
                sdiag.append(n)
        if 1 <= n <= K - 1:
            for i in range(0, n):
                j = n - 1 - i
                idx.append(K * K + i * K + j)  # error of diagonal n-1
                sdiag.append(n - 1)
        if n == K:
            for i in range(1, K):
                j = K - i
                idx.append(i * K + j)          # tail: plain products
                sdiag.append(n)
    return np.asarray(idx, np.int32), np.asarray(sdiag, np.int32)


def _mul_vectorized(a: MP, b: MP) -> MP:
    K = a.K
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    al = _bcast(a.limbs, K, shape)
    bl = _bcast(b.limbs, K, shape)
    exp = None
    C = 0
    if a.scaled:
        C = center_for(K)
        # rescale every limb to the uniform magnitude 2^_MUL_UNIFORM_EXP so
        # products (2^30) and their Dekker error terms (2^6) sit mid-range
        pre = np.asarray([2.0 ** (24 * i - C + _MUL_UNIFORM_EXP)
                          for i in range(K)], np.float32)
        pv = jnp.asarray(pre).reshape((K,) + (1,) * len(shape))
        al = al * pv
        bl = bl * pv
        exp = jnp.broadcast_to(a.exp, shape) + jnp.broadcast_to(b.exp, shape) + C
    ah, alo = split(al)
    bh, blo = split(bl)
    A = al[:, None]
    B = bl[None, :]
    P = A * B
    E = ((ah[:, None] * bh[None, :] - P) + ah[:, None] * blo[None, :]
         + alo[:, None] * bh[None, :]) + alo[:, None] * blo[None, :]
    Pr = P.reshape((K * K,) + shape)
    Er = E.reshape((K * K,) + shape)
    idx, diag = _mul_term_plan(K)
    n_elems = int(np.prod(shape, dtype=np.int64)) if shape else 1
    if n_elems <= 65536 and jax.default_backend() != "cpu":
        # static row gather: XLA:TPU lowers the dynamic gather below as a
        # len(idx)-trip while loop of dynamic-update-slices whose fixed
        # per-trip cost dwarfs small payloads (profiled: ~1 ms for a SCALAR
        # product; the Newton chains in reciprocal/rsqrt then cost ~3 ms
        # per division).  Static slices compile to fused copies instead.
        # Graph cost is +len(idx) ops per call site, so huge shapes keep
        # the O(1)-graph dynamic gather (its loop toll amortizes there).
        G = jnp.stack([Pr[i] if i < K * K else Er[i - K * K]
                       for i in idx], axis=0)
    else:
        PE = jnp.concatenate([Pr, Er], axis=0)
        G = PE[jnp.asarray(idx)]
    if a.scaled:
        # place each term on the result ladder: true term = raw * 2^(C - 2U - 24n)
        d = (C - 2 * _MUL_UNIFORM_EXP - 24 * diag).astype(np.int64)
        d1 = np.clip(d, -126, 127)
        d2 = d - d1
        f1 = np.exp2(d1.astype(np.float64)).astype(np.float32)
        f2 = np.exp2(np.clip(d2, -126, 127).astype(np.float64)).astype(np.float32)
        fshape = (len(idx),) + (1,) * len(shape)
        G = G * jnp.asarray(f1).reshape(fshape) * jnp.asarray(f2).reshape(fshape)
    return _renorm_stacked(G, K, exp=exp)


def mul(a: MP, b: MP) -> MP:
    """Truncated expansion product (CAMPARY-style diagonal scheme).

    Exact TwoProds for limb pairs with i+j <= K-1, their error terms for
    i+j <= K-2, and a plain-float "tail" for i+j == K.  Relative error is
    O(2^-(p*K)) for renormalized inputs.

    Vectorized at K >= 3 (one broadcast TwoProd + static gather: the traced
    graph is O(1) in K); scaled mode additionally rides the per-element
    exponent through a uniform-magnitude rescale (see module docstring).
    """
    if _is_wide(a) or _is_wide(b):
        return _wide().mul(a, b)
    assert a.K == b.K
    _check_modes(a, b)
    K = a.K
    if a.scaled or K >= _VEC_MUL_MIN_K:
        return _mul_vectorized(a, b)
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


def _sweeps_exact_scan(S, K):
    """K bottom-up extraction sweeps over the stacked [m, *shape] limbs,
    returning ALL m rows (no tail chain-sum): rows [0..K-1] hold the
    extracted limbs, rows [K..m-1] the EXACT residual of the multiset sum.

    Exactness precondition (the LATTICE INVARIANT): every input row is an
    integer multiple of 2^-126 with magnitude < 2^127.  Sums/differences
    of such values are again multiples of 2^-126, so no TwoSum
    intermediate can be subnormal — which matters because TPU f32 ADDS
    flush subnormal results and XLA:CPU f32 MULTIPLIES flush them (FTZ);
    both were measured.  add_full/mul_full route their stacks to satisfy
    this.  The error-free building block of the wide (>216-bit) words."""
    m = S.shape[0]

    def step(carry, x):
        s, e = two_sum(x, carry)
        return s, e

    for k in range(min(K, m - 1)):
        seg = S[k:]
        rev = jnp.flip(seg[:-1], axis=0)
        c, errs = jax.lax.scan(step, seg[-1], rev, unroll=_SCAN_UNROLL)
        errs = jnp.flip(errs, axis=0)
        S = jnp.concatenate([S[:k], c[None], errs], axis=0)
    return S


def _mul_term_plan_full(K):
    """Gather order for the FULL (untruncated) limb product: every TwoProd
    and its error term, ordered by product diagonal (approximate magnitude
    order for the extraction sweeps).  Index i*K+j addresses products,
    K*K + i*K+j their errors; idx %% K*K recovers the pair for the
    per-pair dynamic placement exponent."""
    idx = []
    for n in range(2 * K - 1):
        for i in range(max(0, n - K + 1), min(K, n + 1)):
            j = n - i
            idx.append(i * K + j)
            idx.append(K * K + i * K + j)
    return np.asarray(idx, np.int32)


def mul_full(a: MP, b: MP):
    """Scaled-mode product as TWO scaled words (hi, lo) with
    hi + lo == a * b EXACTLY (to ~48K bits): no diagonal of the limb
    product is dropped, the hi word is extracted error-free
    (_sweeps_exact_scan) and its exact residual is re-laddered onto the lo
    word's exponent.

    Every limb is lifted to ~2^_MUL_UNIFORM_EXP by its OWN exact power of
    two (content gaps put real limbs far below their nominal rung; a
    static pre-scale would push their products into f32 subnormals, which
    XLA:CPU zeroes via DAZ/FTZ and TPU adds flush).  Placement exponents
    are therefore per-pair int32 arrays, and rows route onto the HI or LO
    ladder content-based, exactly as in add_full — preserving the lattice
    invariant (_sweeps_exact_scan docstring) on both stacks.

    This is the double-word building block of the WIDE (>216-bit)
    representation (ops.mpwide) — the TPU analog of GMP's full-length limb
    products (El::BigFloat keeps all limbs; precision is set globally at
    /root/reference/src/sdpb/main.cxx:33)."""
    assert a.scaled and b.scaled and a.K == b.K
    K = a.K
    U = _MUL_UNIFORM_EXP
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    al = _bcast(a.limbs, K, shape)
    bl = _bcast(b.limbs, K, shape)
    C = center_for(K)
    ea = _exp_bits_f32(al)
    eb = _exp_bits_f32(bl)
    lift_a = jnp.where(ea == 0, 0, U + 127 - ea)     # zeros stay put
    lift_b = jnp.where(eb == 0, 0, U + 127 - eb)

    def _lift(x, r):
        r1 = jnp.clip(r, -126, 127)
        r2 = jnp.clip(r - r1, -126, 127)
        return jax.lax.optimization_barrier(x * _pow2f(r1)) * _pow2f(r2)

    As = _lift(al, lift_a)
    Bs = _lift(bl, lift_b)
    ah, alo = split(As)
    bh, blo = split(Bs)
    P = As[:, None] * Bs[None, :]
    E = ((ah[:, None] * bh[None, :] - P) + ah[:, None] * blo[None, :]
         + alo[:, None] * bh[None, :]) + alo[:, None] * blo[None, :]
    PE = jnp.concatenate([P.reshape((K * K,) + shape),
                          E.reshape((K * K,) + shape)], axis=0)
    # per-pair placement exponent on the HI ladder (stored frame)
    D = (-(lift_a[:, None] + lift_b[None, :]) - C).reshape((K * K,) + shape)
    exp_hi = (jnp.broadcast_to(a.exp, shape)
              + jnp.broadcast_to(b.exp, shape) + C)
    exp_lo = exp_hi - 24 * K

    idx = _mul_term_plan_full(K)
    G = PE[jnp.asarray(idx)]
    Drow = D[jnp.asarray(idx % (K * K))]
    ebG = _exp_bits_f32(G)
    keep_hi = (ebG + Drow) >= 24        # full mantissa stays normal on HI
    S_hi = _scale_pow2_rows(jnp.where(keep_hi, G, 0.0), Drow)
    S_lo = _scale_pow2_rows(jnp.where(keep_hi, 0.0, G), Drow + 24 * K)

    rows = jax.lax.optimization_barrier(tuple(S_hi[i] for i in range(S_hi.shape[0])))
    S_hi = jnp.stack(rows, axis=0)
    S_hi = _sweeps_exact_scan(S_hi, K)
    his = [S_hi[i] for i in range(K)]
    # compaction confined to the extracted limbs (exact rearrangement; the
    # few-bit overlap of the last limb with the residual is absorbed by the
    # lo word's renorm)
    for i in range(K - 1):
        his[i], his[i + 1] = two_sum(his[i], his[i + 1])
    for i in range(K - 1, 0, -1):
        his[i - 1], his[i] = two_sum(his[i - 1], his[i])
    hi_limbs, hi_e = _normalize_scaled(jnp.stack(his, axis=0), exp_hi, K)
    hi = MP(hi_limbs, hi_e)

    # exact residual, re-laddered 24K binary digits up onto the lo exponent
    res = S_hi[K:]
    sc = 24 * K
    while sc > 0:
        stp = min(sc, 108)
        # barrier: XLA would fold consecutive constant pow2 factors into
        # one f32 constant that overflows (2^216 = inf -> 0*inf = NaN)
        res = jax.lax.optimization_barrier(res * np.float32(2.0 ** stp))
        sc -= stp
    lo = _renorm_stacked(jnp.concatenate([res, S_lo], axis=0), K, exp=exp_lo)
    return hi, lo


def add_full(a: MP, b: MP):
    """Scaled-mode TwoSum as TWO scaled words: hi + lo == a + b exactly.

    The word-level error-free transform of the wide representation
    (ops.mpwide).  Limb rows of both operands are routed onto one of two
    ladders by their per-element offset below the common top: rows within
    ~C+100 bits stay on the HI ladder (fully representable f32 normals),
    deeper rows go DIRECTLY to the LO ladder (24K bits down) — so no
    alignment flush can lose in-window bits, unlike the single-ladder
    base add whose window is ~242 bits.  The HI stack is distilled with
    magnitude-safe TwoSums (no intermediate can flush) and its exact
    residual joins the LO stack.

    Exactness contract: exact for leading cancellation up to ~C+126 bits
    (~242); deeper cancellation loses only bits >242 below the inputs'
    top — the same bound GMP hits at 242-bit precision, documented in
    ops.mpwide (the IPM's conditioning keeps cancellations well inside
    this at the 1e-30 duality-gap contract).
    """
    assert a.scaled and b.scaled and a.K == b.K, (a.K, b.K)
    K = a.K
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    al = _bcast(a.limbs, K, shape)
    bl = _bcast(b.limbs, K, shape)
    ae = jnp.broadcast_to(a.exp, shape)
    be = jnp.broadcast_to(b.exp, shape)
    e_hi = jnp.maximum(ae, be)
    e_lo = e_hi - 24 * K

    def route(limbs, we):
        # CONTENT-based split (per row per element): a row stays on the HI
        # ladder only if its whole 24-bit mantissa survives the 2^d rescale
        # as f32 normals (lowest bit eb-127-23+d >= -126 <=> eb+d >= 24);
        # deeper rows go to the LO ladder, 24K bits down.  Index-based
        # routing is NOT enough: limbs sit below their nominal ladder rung
        # after cancellation, and both backends flush subnormals somewhere
        # (TPU: add results; XLA:CPU: multiply results, FTZ) — measured as
        # a hard -242-bit accuracy floor on the wide add.
        d = we - e_hi                          # <= 0
        eb = _exp_bits_f32(limbs)
        keep_hi = (eb + d[None]) >= 24
        hi = _scale_pow2_arr(jnp.where(keep_hi, limbs, 0.0), d)
        lo = _scale_pow2_arr(jnp.where(keep_hi, 0.0, limbs), d + 24 * K)
        return hi, lo

    a_hi, a_lo = route(al, ae)
    b_hi, b_lo = route(bl, be)
    S_hi = jnp.stack([a_hi, b_hi], axis=1).reshape((2 * K,) + shape)
    rows = jax.lax.optimization_barrier(tuple(S_hi[i] for i in range(2 * K)))
    S_hi = jnp.stack(rows, axis=0)
    S_hi = _sweeps_exact_scan(S_hi, K)
    his = [S_hi[i] for i in range(K)]
    for i in range(K - 1):
        his[i], his[i + 1] = two_sum(his[i], his[i + 1])
    for i in range(K - 1, 0, -1):
        his[i - 1], his[i] = two_sum(his[i - 1], his[i])
    hi_limbs, hi_e = _normalize_scaled(jnp.stack(his, axis=0), e_hi, K)
    hi = MP(hi_limbs, hi_e)

    res = S_hi[K:]
    sc = 24 * K
    while sc > 0:
        stp = min(sc, 108)
        # barrier: see mul_full — consecutive constant pow2 factors fold
        res = jax.lax.optimization_barrier(res * np.float32(2.0 ** stp))
        sc -= stp
    S_lo = jnp.concatenate(
        [res, jnp.stack([a_lo, b_lo], axis=1).reshape((2 * K,) + shape)],
        axis=0)
    lo = _renorm_stacked(S_lo, K, exp=e_lo)
    return hi, lo


def mul_pow2(a: MP, p) -> MP:
    """Exact scaling by a power of two (per-element or scalar).

    The factor is cast to the limb dtype first: a strongly-typed float64
    scalar would otherwise upcast float32 limbs under jax_enable_x64.
    Scaled mode with a host power-of-two scalar adjusts the exponent only
    (keeping the mantissa normalized)."""
    if _is_wide(a):
        return _wide().mul_pow2(a, p)
    if a.scaled and not isinstance(p, jax.Array):
        pf = float(p)
        e = int(np.log2(abs(pf)))
        if 2.0 ** e == abs(pf):
            exp = jnp.where(a.exp == EXP_ZERO, a.exp, a.exp + e)
            limbs = a.limbs if pf > 0 else -a.limbs
            return MP(limbs, exp)
    limbs = a.limbs * jnp.asarray(p, dtype=a.dtype)
    if not a.scaled:
        return MP(limbs)
    limbs, exp = _normalize_scaled(limbs, a.exp, a.K)
    return MP(limbs, exp)


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


def _seed_mantissa(b: MP):
    """Top ~48 bits of the mantissa in base dtype (plus exponent array)."""
    m = b.limbs[0] if b.K == 1 else b.limbs[0] + b.limbs[1]
    return m


def reciprocal(b: MP) -> MP:
    if _is_wide(b):
        return _wide().reciprocal(b)
    one = from_double(np.float64(1.0), b.K, b.dtype, scaled=b.scaled)
    if b.scaled:
        C = center_for(b.K)
        m = _seed_mantissa(b) * np.float32(2.0 ** -min(C, 126))  # ~[1, 2)
        seed = 1.0 / m
        r0 = _from_float_exp(seed, -(b.exp + C), b.K)
    else:
        seed = 1.0 / to_float_array(b)
        r0 = MP(jnp.concatenate([seed[None], jnp.zeros_like(b.limbs[1:])], axis=0))

    def body(_, r):
        # r <- r + r*(1 - b*r)
        e = sub(one, mul(b, r))
        return add(r, mul(r, e))

    # unrolled Newton on TPU (<= 6 steps at any supported K): a fori_loop
    # there costs a per-trip while toll and blocks fusion across steps,
    # tripling the latency of every on-device division.  XLA:CPU keeps the
    # loop — unrolling inflates its compile time instead.
    if jax.default_backend() == "cpu":
        return jax.lax.fori_loop(0, _newton_steps(b.K), body, r0)
    r = r0
    for i in range(_newton_steps(b.K)):
        r = body(i, r)
    return r


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
    if _is_wide(a):
        return _wide().rsqrt(a)
    half = from_double(np.float64(0.5), a.K, a.dtype, scaled=a.scaled)
    three_half = from_double(np.float64(1.5), a.K, a.dtype, scaled=a.scaled)
    if a.scaled:
        C = center_for(a.K)
        E = a.exp + C
        q = E >> 1                     # floor(E/2) (arithmetic shift)
        rem = E - 2 * q                # 0 or 1
        m = _seed_mantissa(a) * np.float32(2.0 ** -min(C, 126))  # ~[1, 2)
        x2 = m * _pow2f(rem)           # in [1, 4)
        r = _from_float_exp(jax.lax.rsqrt(x2), -q, a.K)
    else:
        seed = jax.lax.rsqrt(to_float_array(a))
        r = MP(jnp.concatenate([seed[None], jnp.zeros_like(a.limbs[1:])], axis=0))

    def body(_, r):
        # r <- r * (1.5 - 0.5 * a * r^2)
        arr = mul(a, mul(r, r))
        return mul(r, sub(three_half, mul(half, arr)))

    # unrolled on TPU / fori_loop on CPU (see reciprocal)
    if jax.default_backend() == "cpu":
        return jax.lax.fori_loop(0, _newton_steps(a.K), body, r)
    for i in range(_newton_steps(a.K)):
        r = body(i, r)
    return r


def sqrt(a: MP) -> MP:
    """sqrt via Newton on the inverse square root; a must be >= 0.

    Zero inputs return zero (guarded), negative inputs produce NaN.
    """
    if _is_wide(a):
        return _wide().sqrt(a)
    half = from_double(np.float64(0.5), a.K, a.dtype, scaled=a.scaled)
    top = a.limbs[0]
    is_zero = top <= 0
    one_l = _one_like_limbs(a)
    a_safe = MP(jnp.where(is_zero, one_l, a.limbs),
                None if not a.scaled else jnp.where(is_zero, 0, a.exp))
    if a.scaled:
        a_safe = MP(*_normalize_scaled(a_safe.limbs, a_safe.exp, a.K))
    r = rsqrt(a_safe)
    s = mul(a_safe, r)
    # refinement: s += (a - s^2) * r / 2
    rem = sub(a_safe, mul(s, s))
    s = add(s, mul(rem, mul(r, half)))
    sign_ok = jnp.where(top < 0, jnp.full_like(top, np.nan), 1.0)
    limbs = jnp.where(is_zero[None], jnp.zeros_like(s.limbs), s.limbs * sign_ok)
    if not a.scaled:
        return MP(limbs)
    exp = jnp.where(is_zero, EXP_ZERO, s.exp)
    return MP(limbs, exp)


def _one_like_limbs(a: MP):
    one = jnp.zeros_like(a.limbs)
    v = 2.0 ** center_for(a.K) if a.scaled else 1.0
    return one.at[0].set(jnp.asarray(v, dtype=a.dtype))


# ---------------------------------------------------------------------------
# Comparisons, selection, reductions


def sign_array(a: MP):
    """Elementwise sign in base dtype: sign of the first nonzero limb.
    (Scaled mode: the exponent never changes the sign.)"""
    if _is_wide(a):
        return _wide().sign_array(a)
    s = jnp.sign(a.limbs[a.K - 1])
    for i in range(a.K - 2, -1, -1):
        s = jnp.where(a.limbs[i] != 0, jnp.sign(a.limbs[i]), s)
    return s


def lt(a: MP, b: MP):
    return sign_array(sub(a, b)) < 0


def le(a: MP, b: MP):
    return sign_array(sub(a, b)) <= 0


def where(cond, a: MP, b: MP) -> MP:
    if _is_wide(a) or _is_wide(b):
        return _wide().where(cond, a, b)
    _check_modes(a, b)
    shape = jnp.broadcast_shapes(a.shape, b.shape, jnp.shape(cond))
    c = jnp.broadcast_to(cond, shape)
    al = _bcast(a.limbs, a.K, shape)
    bl = _bcast(b.limbs, b.K, shape)
    limbs = jnp.where(c[None], al, bl)
    if a.exp is None:
        return MP(limbs)
    e = jnp.where(c, jnp.broadcast_to(a.exp, shape), jnp.broadcast_to(b.exp, shape))
    return MP(limbs, e)


def abs_(a: MP) -> MP:
    if _is_wide(a):
        return _wide().abs_(a)
    s = sign_array(a)
    return MP(a.limbs * jnp.where(s < 0, -1.0, 1.0).astype(a.dtype), a.exp)


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
        lo = a[:half]
        hi = a[half : 2 * half]
        s = add(lo, hi)
        if n % 2:
            s = concatenate([s, a[n - 1 : n]], axis=0)
        a = s
        n = a.shape[0]
    return a[0]


def max_abs(a: MP):
    """max |a| over all elements, returned in base dtype (used for error
    norms, mirroring Block_Diagonal_Matrix::max_abs in the reference).
    Scaled mode saturates at finfo.max / flushes below the f32 floor —
    adequate for thresholds representable in the base dtype."""
    if _is_wide(a):
        return _wide().max_abs(a)
    m = jnp.abs(to_float_array(a))
    return jnp.max(m) if a.ndim else m


def dot(a: MP, b: MP) -> MP:
    """Full-precision dot product of 1-D MP vectors."""
    return sum_(mul(a, b), axis=0)
