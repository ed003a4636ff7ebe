"""Error-free transformations (EFTs) — the bedrock of extended precision.

These are the classic Knuth/Dekker/Møller algorithms: each returns a pair
(result, error) such that result + error EXACTLY equals the true value,
provided the base arithmetic is correctly-rounded IEEE.

On TPU, float32 is native/IEEE on the VPU (verified), while float64 is a
~47-bit software emulation that is NOT correctly rounded — so the TPU path
uses float32 limbs.  On CPU, float64 is IEEE and preferred.

This replaces the role of GMP's exact limb arithmetic in the reference
solver (see /root/reference/src/sdpb/main.cxx:33 where El::gmp::SetPrecision
fixes the working precision).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Dekker-split power: 2**ceil(p/2) for p-bit mantissa.  We use the
# contraction-immune formulation below: t = fl(2^s*a + a).  The classic
# t = fl((2^s+1)*a) is numerically identical, but compilers that apply
# floating-point contraction (XLA:CPU's fusion emitters do) rewrite the
# following (t - a) into fma(2^s+1, a, -a), which evaluates EXACTLY to
# 2^s*a and silently destroys the split.  With t produced by an ADD there
# is no mul+add pattern left to contract: fma(2^s, a, a) equals fl(w + a)
# bit-for-bit because w = 2^s*a is exact.
_SPLIT_POW = {
    jnp.dtype(jnp.float32): np.float32(4096.0),        # 2**12
    jnp.dtype(jnp.float64): np.float64(134217728.0),   # 2**27
}

# Mantissa bits of the base dtype.
MANT_BITS = {
    jnp.dtype(jnp.float32): 24,
    jnp.dtype(jnp.float64): 53,
}


def two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (6 flops, branch-free)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def quick_two_sum(a, b):
    """Fast TwoSum (3 flops): requires |a| >= |b| or a == 0."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """Dekker split of a p-bit float into two ~p/2-bit halves (exact).

    Contraction-immune formulation (see _SPLIT_POW comment): w = 2^s*a is
    exact, t = fl(w + a) = fl((2^s+1)*a), and all later ops consume adds,
    so FP contraction cannot change any rounding.
    """
    w = _SPLIT_POW[jnp.dtype(a.dtype)] * a
    t = w + a
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


# NOTE on floating-point contraction: the product limb p below is consumed
# by TwoSum chains; a compiler that contracts mul+add into fma(a, b, x)
# desynchronizes p from its separately-computed error term and silently
# destroys the expansion.  The TPU backend does NOT contract (verified
# empirically: jitted MP mul reaches 2^-111 on a v5e).  XLA:CPU's fusion
# emitters DO contract — even across lax.optimization_barrier and through
# bitcast round-trips — so every CPU entry point of this package must set
# XLA_FLAGS=--xla_cpu_use_fusion_emitters=false (see
# sdpb_tpu.utils.platform.configure_cpu; verify_eft is the enforcing
# runtime self-check).


def two_prod(a, b):
    """Dekker TwoProd: p + e == a * b exactly (no FMA required)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def two_prod_presplit(a, ah, al, b, bh, bl):
    """TwoProd where both operands are already split (saves repeated splits
    in expansion multiplication, where every limb pairs with every limb)."""
    p = a * b
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e
