"""Pallas TPU kernels for the multi-limb (MP) hot primitives.

The XLA path in ops.linalg materializes [B, M, Kd, N]-shaped limb-product
intermediates in HBM for every MP matmul — with K^2 limb products and
multiple renormalization sweeps that is the dominant memory traffic of the
whole iteration.  The Pallas kernel keeps the K-limb accumulator resident
in VMEM and streams the contraction dimension, so HBM sees only the
operands and the result.  It also collapses each matmul call site to a
single custom call, decoupling XLA graph size (compile time) from K.

Error-free transforms are verified exact under Mosaic on TPU (see
tests/test_pallas_kernels.py; the EFT exactness check mirrors
utils.platform.verify_eft).  Kernels use only VPU elementwise ops — the
MXU's fused accumulation is NOT correctly rounded per element and would
destroy the expansions.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .eft import two_sum, quick_two_sum, two_prod_presplit, split
from .mpfloat import MP


def _renorm_list(xs, K):
    """mpfloat.renorm on a plain list of equal-shape arrays (no stacking,
    usable inside a Pallas kernel).  No optimization_barrier here: Mosaic
    does not lower it — and does not apply FP contraction (verified by the
    EFT exactness test), so none is needed."""
    xs = list(xs)
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


def _mp_add_lists(a, b, K):
    xs = []
    for i in range(K):
        xs.append(a[i])
        xs.append(b[i])
    return _renorm_list(xs, K)


def _mp_mul_lists(al, bl, K):
    """CAMPARY-style truncated product of two limb lists (mpfloat.mul)."""
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
    return _renorm_list(xs, K)


def _matmul_kernel(at_ref, b_ref, o_ref, *, K: int, Kd: int, chunk: int):
    """One batch element: o[K,M,N] = a[K,M,Kd] @ b[K,Kd,N] in MP arithmetic,
    with `a` passed TRANSPOSED as at[K,Kd,M] so the contraction dim is the
    sublane axis (Mosaic allows dynamic sublane slices; dynamic LANE slices
    must be 128-aligned).

    The contraction streams in aligned `chunk`-row blocks inside a
    fori_loop (body compiled once regardless of Kd): the block is loaded
    to registers, rows indexed statically, limb products summed pairwise
    (tree) in MP, and folded into the VMEM accumulator.  The caller pads
    Kd to a chunk multiple with zeros (exact no-ops in the sum).
    """
    import jax.experimental.pallas as pl

    M = at_ref.shape[3]
    N = b_ref.shape[3]
    assert Kd % chunk == 0, (Kd, chunk)

    def body(c, acc):
        start = pl.multiple_of(c * chunk, chunk)
        A_blk = [at_ref[k, 0, pl.ds(start, chunk), :] for k in range(K)]  # [chunk, M]
        B_blk = [b_ref[k, 0, pl.ds(start, chunk), :] for k in range(K)]   # [chunk, N]

        def product_at(t):
            al = [jnp.broadcast_to(A_blk[k][t, :].reshape(M, 1), (M, N))
                  for k in range(K)]
            bl = [jnp.broadcast_to(B_blk[k][t, :].reshape(1, N), (M, N))
                  for k in range(K)]
            return _mp_mul_lists(al, bl, K)

        terms = [product_at(t) for t in range(chunk)]
        while len(terms) > 1:
            nxt = []
            for i in range(0, len(terms) - 1, 2):
                nxt.append(_mp_add_lists(terms[i], terms[i + 1], K))
            if len(terms) % 2:
                nxt.append(terms[-1])
            terms = nxt
        return tuple(_mp_add_lists(list(acc), terms[0], K))

    acc0 = tuple(jnp.zeros((M, N), at_ref.dtype) for _ in range(K))
    acc = jax.lax.fori_loop(0, Kd // chunk, body, acc0)
    for k in range(K):
        o_ref[k, 0] = acc[k]


@functools.partial(jax.jit, static_argnames=("chunk",))
def _mp_matmul_pallas(a_limbs, b_limbs, chunk: int = 8):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, B, M, Kd = a_limbs.shape
    N = b_limbs.shape[3]
    # pad the contraction dim to a chunk multiple (zero products are exact
    # no-ops in the accumulation)
    pad = (-Kd) % chunk
    if pad:
        a_limbs = jnp.pad(a_limbs, ((0, 0), (0, 0), (0, 0), (0, pad)))
        b_limbs = jnp.pad(b_limbs, ((0, 0), (0, 0), (0, pad), (0, 0)))
        Kd += pad
    at_limbs = jnp.swapaxes(a_limbs, 2, 3)   # [K, B, Kd, M]
    kernel = functools.partial(_matmul_kernel, K=K, Kd=Kd, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((K, 1, Kd, M), lambda b: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, Kd, N), lambda b: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, 1, M, N), lambda b: (0, b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, B, M, N), a_limbs.dtype),
    )(at_limbs, b_limbs)


# VMEM budget per program (bytes); operands + accumulator + headroom
_VMEM_LIMIT = 12 * 1024 * 1024


def pallas_matmul_viable(a: MP, b: MP) -> bool:
    """Use the kernel on TPU for 4-D [K,B,M,Kd]x[K,B,Kd,N] float32 operands
    that fit VMEM and are big enough to amortize the kernel dispatch
    (measured: ~5x faster at 96^3 x batch 11, but slower than fused XLA on
    toy-sized blocks)."""
    if jax.default_backend() == "cpu":
        return False
    if a.scaled or b.scaled:
        # per-element exponents need alignment inside the contraction; the
        # kernel operates on raw f32 ladders only (scaled matmul rides the
        # XLA fallback in ops.linalg.matmul)
        return False
    if a.dtype != jnp.float32 or a.limbs.ndim != 4 or b.limbs.ndim != 4:
        return False
    K, B, M, Kd = a.limbs.shape
    N = b.shape[-1]
    words = K * (M * Kd + Kd * N + 3 * M * N)
    if words * 4 >= _VMEM_LIMIT:
        return False
    return K * K * B * M * Kd * N >= 2_000_000


def mp_matmul(a: MP, b: MP) -> MP:
    """Batched MP matmul via the Pallas kernel (callers guard with
    pallas_matmul_viable)."""
    return MP(_mp_matmul_pallas(a.limbs, b.limbs))
