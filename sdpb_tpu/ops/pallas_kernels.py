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

from . import mplist as ml
from .mpfloat import EXP_ZERO, MP


def _matmul_kernel(*refs, K: int, Kd: int, chunk: int, scaled: bool,
                   unroll: bool = False):
    """One batch element: o[K,M,N] = a[K,M,Kd] @ b[K,Kd,N] in MP arithmetic,
    with `a` passed TRANSPOSED as at[K,Kd,M] so the contraction dim is the
    sublane axis (Mosaic allows dynamic sublane slices; dynamic LANE slices
    must be 128-aligned).

    The contraction streams in aligned `chunk`-row blocks inside a
    fori_loop (body compiled once regardless of Kd): the block is loaded
    to registers, rows indexed statically, limb products summed pairwise
    (tree) in MP, and folded into the VMEM accumulator.  The caller pads
    Kd to a chunk multiple with MP zeros (exact no-ops in the sum).

    Scaled mode carries the per-element int32 exponent tiles alongside;
    the accumulator is a full scaled Val and the tree adds perform the
    exponent alignment (the on-chip analog of step.py's _psum_mp)."""
    import jax.experimental.pallas as pl

    n_in = 2 if scaled else 1
    at_refs = refs[:n_in]
    b_refs = refs[n_in:2 * n_in]
    o_refs = refs[2 * n_in:]
    M = at_refs[0].shape[3]
    N = b_refs[0].shape[3]
    assert Kd % chunk == 0, (Kd, chunk)

    def body(c, acc):
        start = pl.multiple_of(c * chunk, chunk)
        A_blk = [at_refs[0][k, 0, pl.ds(start, chunk), :] for k in range(K)]
        B_blk = [b_refs[0][k, 0, pl.ds(start, chunk), :] for k in range(K)]
        Ae = at_refs[1][0, pl.ds(start, chunk), :] if scaled else None
        Be = b_refs[1][0, pl.ds(start, chunk), :] if scaled else None

        def product_at(t):
            al = [jnp.broadcast_to(A_blk[k][t, :].reshape(M, 1), (M, N))
                  for k in range(K)]
            bl = [jnp.broadcast_to(B_blk[k][t, :].reshape(1, N), (M, N))
                  for k in range(K)]
            ae = (jnp.broadcast_to(Ae[t, :].reshape(M, 1), (M, N))
                  if scaled else None)
            be = (jnp.broadcast_to(Be[t, :].reshape(1, N), (M, N))
                  if scaled else None)
            return ml.mul((al, ae), (bl, be), K)

        terms = [product_at(t) for t in range(chunk)]
        while len(terms) > 1:
            nxt = []
            for i in range(0, len(terms) - 1, 2):
                nxt.append(ml.add(terms[i], terms[i + 1], K))
            if len(terms) % 2:
                nxt.append(terms[-1])
            terms = nxt
        return ml.add(acc, terms[0], K)

    acc0 = ([jnp.zeros((M, N), at_refs[0].dtype) for _ in range(K)],
            jnp.full((M, N), EXP_ZERO, jnp.int32) if scaled else None)
    if unroll:
        # interpret mode (XLA:CPU): the while-body + dynamic-slice fusion
        # contracts FP ops straight through optimization_barrier, destroying
        # the error-free transforms (f32 only; fusion-emitter flag does not
        # reach while bodies).  A statically unrolled loop compiles exactly;
        # Mosaic on TPU needs no workaround (no contraction, verified by the
        # on-chip EFT test in tests/test_pallas_kernels.py).
        acc = acc0
        for c in range(Kd // chunk):
            acc = body(c, acc)
    else:
        acc = jax.lax.fori_loop(0, Kd // chunk, body, acc0)
    _store_val(o_refs, acc, K, scaled)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def _mp_matmul_pallas(a: MP, b: MP, chunk: int = 8, interpret: bool = False) -> MP:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a_limbs, b_limbs = a.limbs, b.limbs
    scaled = a.scaled
    K, B, M, Kd = a_limbs.shape
    N = b_limbs.shape[3]
    # pad the contraction dim to a chunk multiple (MP zeros are exact
    # no-ops in the accumulation; scaled zeros need the EXP_ZERO sentinel)
    pad = (-Kd) % chunk
    a_exp, b_exp = a.exp, b.exp
    if pad:
        a_limbs = jnp.pad(a_limbs, ((0, 0), (0, 0), (0, 0), (0, pad)))
        b_limbs = jnp.pad(b_limbs, ((0, 0), (0, 0), (0, pad), (0, 0)))
        if scaled:
            a_exp = jnp.pad(a_exp, ((0, 0), (0, 0), (0, pad)),
                            constant_values=int(EXP_ZERO))
            b_exp = jnp.pad(b_exp, ((0, 0), (0, pad), (0, 0)),
                            constant_values=int(EXP_ZERO))
        Kd += pad
    at_limbs = jnp.swapaxes(a_limbs, 2, 3)   # [K, B, Kd, M]
    kernel = functools.partial(_matmul_kernel, K=K, Kd=Kd, chunk=chunk,
                               scaled=scaled, unroll=interpret)
    in_specs = [pl.BlockSpec((K, 1, Kd, M), lambda b: (0, b, 0, 0),
                             memory_space=pltpu.VMEM)]
    if scaled:
        in_specs.append(pl.BlockSpec((1, Kd, M), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((K, 1, Kd, N), lambda b: (0, b, 0, 0),
                                 memory_space=pltpu.VMEM))
    if scaled:
        in_specs.append(pl.BlockSpec((1, Kd, N), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
    out_specs, out_shapes = _val_out(pl, pltpu, K, B, M, N,
                                     a_limbs.dtype, scaled)
    args = [at_limbs]
    if scaled:
        args.append(jnp.swapaxes(a_exp, 1, 2))
    args.append(b_limbs)
    if scaled:
        args.append(b_exp)
    res = pl.pallas_call(
        kernel, grid=(B,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret,
    )(*args)
    return MP(res[0], res[1] if scaled else None)


# ---------------------------------------------------------------------------
# WIDE (two-word MPW) matmul kernel
#
# Wide operands previously fell back to the XLA composite path, whose
# traced mul_full/add_full graphs at every call site made the 432-bit
# program un-compilable inside any bench budget (round-4 VERDICT item 1).
# This kernel carries the whole wide contraction on-chip with the
# fori-loop sweep forms of ops.mpwide_kernel: one Mosaic custom call per
# matmul site, traced graph O(K) in size.


def _matmul_wide_kernel(*refs, K: int, n_steps: int, chunk: int,
                        unroll: bool = False):
    """One (batch, contraction-chunk) grid step: accumulate `chunk` terms
    of o = a @ b in WIDE (two-word) arithmetic into the output refs.

    The contraction is a GRID dimension (innermost, sequential), NOT an
    in-kernel fori_loop over values: loop-carrying tile-shaped
    accumulators through Mosaic's fori lowering corrupted low words at
    [8, 8] tiles (measured round 5), while the canonical revisit-the-
    output-block reduction is exact AND gets pipelined operand loads for
    free.  The arithmetic runs in the COMPACT scratch-ref forms
    (ops.mpwide_kernel KCtx ops): the list forms traced ~60k eqns per
    fused multiply-accumulate, and with one embedded kernel per matmul
    call site the 432-bit nmax6 program reached 85 MB of MLIR — the
    remote compile helper was SIGKILLed.  Ref order: SMEM plan tables
    (ints, fmul), a word0 (limbs, exp), a word1, b word0, b word1, the
    same four output pairs, then the f32/int32 scratch buffers."""
    import jax.experimental.pallas as pl

    from ..ops import mpwide_kernel as wk

    plan_ref, fmul_ref = refs[0], refs[1]
    a_refs = refs[2:6]
    b_refs = refs[6:10]
    o_refs = refs[10:14]
    S, D = refs[14], refs[15]
    M = a_refs[0].shape[4]
    N = b_refs[0].shape[4]
    ctx = wk.KCtx(S, D, plan_ref, fmul_ref, K)

    step = pl.program_id(1)

    def read_acc():
        ws = []
        for w in range(2):
            limbs = jnp.stack([o_refs[2 * w][k, 0] for k in range(K)], 0)
            ws.append((limbs, o_refs[2 * w + 1][0]))
        return tuple(ws)

    def write_acc(acc):
        for w in range(2):
            limbs, e = acc[w]
            for k in range(K):
                o_refs[2 * w][k, 0] = limbs[k]
            o_refs[2 * w + 1][0] = e

    @pl.when(step == 0)
    def _init():
        write_acc(wk.wzeros((M, N), K))

    acc = read_acc()
    # operand refs are [K, 1, 1, chunk, M|N] (the contraction axis is
    # pre-split into full trailing (chunk, M) blocks — Mosaic requires the
    # last two block dims be full or (8, 128)-divisible)
    A = [(jnp.stack([a_refs[2 * w][k, 0, 0] for k in range(K)], 0),
          a_refs[2 * w + 1][0, 0]) for w in range(2)]
    B = [(jnp.stack([b_refs[2 * w][k, 0, 0] for k in range(K)], 0),
          b_refs[2 * w + 1][0, 0]) for w in range(2)]
    for t in range(chunk):
        wa = tuple((l[:, t, :].reshape(K, M, 1), e[t, :].reshape(M, 1))
                   for l, e in A)
        wb = tuple((l[:, t, :].reshape(K, 1, N), e[t, :].reshape(1, N))
                   for l, e in B)
        # cheap-carry accumulate; the two-word invariant is restored once
        # on the last step (wnormalize)
        acc = wk.wfma_acc_c(ctx, acc, wa, wb)
    write_acc(acc)

    @pl.when(step == n_steps - 1)
    def _final():
        write_acc(wk.wnormalize_c(ctx, read_acc()))


def _wide_val_specs(pl, pltpu, K, n, m, contract: bool):
    """Specs for one wide operand under the (batch, k-chunk) grid:
    `contract=True` addresses [K, B, n_steps, chunk, m] arrays sliced by
    the contraction grid index (full trailing (chunk, m) blocks);
    False revisits the same [.., n, m] output block every k step."""
    specs = []
    if contract:
        for _ in range(2):
            specs.append(pl.BlockSpec(
                (K, 1, 1, n, m), lambda b, kk: (0, b, kk, 0, 0),
                memory_space=pltpu.VMEM))
            specs.append(pl.BlockSpec(
                (1, 1, n, m), lambda b, kk: (b, kk, 0, 0),
                memory_space=pltpu.VMEM))
        return specs
    for _ in range(2):
        specs.append(pl.BlockSpec((K, 1, n, m), lambda b, kk: (0, b, 0, 0),
                                  memory_space=pltpu.VMEM))
        specs.append(pl.BlockSpec((1, n, m), lambda b, kk: (b, 0, 0),
                                  memory_space=pltpu.VMEM))
    return specs


def _wide_args_t(a, swap: bool, n_steps: int, chunk: int):
    """MPW -> flat arg list (w0 limbs, w0 exp, w1 limbs, w1 exp), with the
    last two axes optionally transposed (the `a` operand) and the
    contraction axis split into (n_steps, chunk) so each grid step's
    block is a full trailing (chunk, m) slab."""
    out = []
    for w in a.words:
        limbs, exp = w.limbs, w.exp
        if swap:
            limbs = jnp.swapaxes(limbs, 2, 3)
            exp = jnp.swapaxes(exp, 1, 2)
        K, B = limbs.shape[:2]
        m = limbs.shape[3]
        out.append(limbs.reshape(K, B, n_steps, chunk, m))
        out.append(exp.reshape(B, n_steps, chunk, m))
    return out


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def _mp_matmul_pallas_wide(a, b, chunk: int = 1, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..ops import mpwide_kernel as wk
    from ..ops.mpwide import MPW

    K = a.Kg
    _, B, M, Kd = a.words[0].limbs.shape
    N = b.words[0].limbs.shape[3]
    pad = (-Kd) % chunk
    if pad:
        a = MPW(tuple(
            MP(jnp.pad(w.limbs, ((0, 0), (0, 0), (0, 0), (0, pad))),
               jnp.pad(w.exp, ((0, 0), (0, 0), (0, pad)),
                       constant_values=int(EXP_ZERO))) for w in a.words))
        b = MPW(tuple(
            MP(jnp.pad(w.limbs, ((0, 0), (0, 0), (0, pad), (0, 0))),
               jnp.pad(w.exp, ((0, 0), (0, pad), (0, 0)),
                       constant_values=int(EXP_ZERO))) for w in b.words))
        Kd += pad
    n_steps = Kd // chunk
    kernel = functools.partial(_matmul_wide_kernel, K=K, n_steps=n_steps,
                               chunk=chunk, unroll=interpret)
    ints, fmul = wk.plan_tables(K)
    smem_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
    in_specs = (smem_specs
                + _wide_val_specs(pl, pltpu, K, chunk, M, contract=True)
                + _wide_val_specs(pl, pltpu, K, chunk, N, contract=True))
    out_specs = _wide_val_specs(pl, pltpu, K, M, N, contract=False)
    out_shapes = []
    for _ in range(2):
        out_shapes.append(jax.ShapeDtypeStruct((K, B, M, N), jnp.float32))
        out_shapes.append(jax.ShapeDtypeStruct((B, M, N), jnp.int32))
    res = pl.pallas_call(
        kernel, grid=(B, n_steps), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret,
        scratch_shapes=[pltpu.VMEM((wk.rows_for(K), M, N), jnp.float32),
                        pltpu.VMEM((K * K, M, N), jnp.int32)],
    )(jnp.asarray(ints), jnp.asarray(fmul),
      *_wide_args_t(a, swap=True, n_steps=n_steps, chunk=chunk),
      *_wide_args_t(b, swap=False, n_steps=n_steps, chunk=chunk))
    return MPW((MP(res[0], res[1]), MP(res[2], res[3])))


def _canon_wide_pair(a, b):
    """_canon_batched_pair word-wise for MPW operands."""
    from ..ops.mpwide import MPW

    ca, cb, unf = [], [], []
    for wa, wb in zip(a.words, b.words):
        a4, b4, u = _canon_batched_pair(wa, wb)
        ca.append(a4)
        cb.append(b4)
        unf.append(u)
    return (MPW(tuple(ca)), MPW(tuple(cb)),
            lambda r: MPW(tuple(u(w) for u, w in zip(unf, r.words))))


def pallas_wide_matmul_viable(a, b) -> bool:
    """Wide (MPW) pair viability: two 216-bit words per operand, f32, TPU,
    VMEM covering operands + accumulator + the compact scratch buffers
    (rows_for(K) f32 rows + K^2 int32 rows of PADDED (8, 128) tiles)."""
    if not (hasattr(a, "words") and hasattr(b, "words")):
        return False
    if a.G != 2 or b.G != 2:
        return False
    if jax.default_backend() == "cpu":
        return False
    if a.dtype != jnp.float32:
        return False
    from ..ops import mpwide_kernel as wk

    K = a.Kg
    M, Kd = a.shape[-2], a.shape[-1]
    N = b.shape[-1]
    pm = -(-M // 8) * 8
    pn = -(-N // 128) * 128
    tile = pm * pn
    scratch = (wk.rows_for(K) + K * K) * tile
    io = 2 * (K + 1) * (2 * M + 2 * N + 3 * tile)
    if (scratch + io) * 4 >= _VMEM_LIMIT:
        return False
    return True


# VMEM budget per program (bytes); operands + accumulator + headroom
_VMEM_LIMIT = 12 * 1024 * 1024


def _canon_batched_pair(a: MP, b: MP):
    """Broadcast the leading batch axes of a [..., M, Kd] x [..., Kd, N]
    pair and flatten them to ONE batch axis: returns (a4, b4, unflatten)
    with 4-D limb arrays [K, B, M, Kd] / [K, B, Kd, N].

    This is what lets >4-D call sites (e.g. the per-pair weighted sums of
    constraint_matrix_weighted_sum, [B, npairs, h, Kd] x [B, 1, Kd, N])
    reach the Pallas kernel: the XLA fallback's gather-by-diagonals lowers
    to a term-count-trip while loop with a degenerate T(1,128) layout on
    6-D intermediates — measured 316 ms per call site on nmax6, 72% of the
    whole IPM iteration."""
    batch = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    M, Kd = a.shape[-2], a.shape[-1]
    N = b.shape[-1]
    B = int(np.prod(batch, dtype=np.int64)) if batch else 1

    def canon(x: MP, r, c) -> MP:
        K = x.limbs.shape[0]
        # right-align the batch axes with explicit singleton fill (a 2-D
        # operand meeting a batched one broadcasts on a fresh axis)
        fill = (1,) * (len(batch) - (x.ndim - 2))
        limbs = x.limbs.reshape((K,) + fill + x.limbs.shape[1:])
        limbs = jnp.broadcast_to(limbs, (K,) + batch + (r, c))
        limbs = limbs.reshape((K, B, r, c))
        exp = None
        if x.exp is not None:
            exp = x.exp.reshape(fill + x.exp.shape)
            exp = jnp.broadcast_to(exp, batch + (r, c)).reshape((B, r, c))
        return MP(limbs, exp)

    def unflatten(r: MP) -> MP:
        rl = r.limbs.reshape((r.limbs.shape[0],) + batch + (M, N))
        re = None if r.exp is None else r.exp.reshape(batch + (M, N))
        return MP(rl, re)

    return canon(a, M, Kd), canon(b, Kd, N), unflatten


def pallas_matmul_viable(a: MP, b: MP) -> bool:
    """Use the kernel on TPU for batched float32 operands (classic or
    scaled) whose per-program working set fits VMEM.  Callers canonicalize
    >4-D batches with _canon_batched_pair first.

    The floor is tiny (scalar-ish products only): the XLA fallback's
    vectorized MP product materializes K^2 limb-product terms and a
    gather-by-diagonals that TPU lowers to a sequential while loop —
    profiled 3-30x slower than the kernel at every block size of the nmax6
    fixture, including [11,16,16]x[11,16,16] (previously below the 2e6
    threshold) and the 5-D weighted-sum matmuls (previously excluded by an
    ndim==4 guard)."""
    if not (isinstance(a, MP) and isinstance(b, MP)):
        # wide (MPW) pairs have their own kernel (round-5: previously the
        # XLA composite path, which could not cold-compile at nmax6 scale)
        return pallas_wide_matmul_viable(a, b)
    if jax.default_backend() == "cpu":
        return False
    if a.dtype != jnp.float32:
        return False
    K = a.limbs.shape[0]
    M, Kd = a.shape[-2], a.shape[-1]
    N = b.shape[-1]
    per_exp = 1 if a.scaled else 0
    words = (K + per_exp) * (M * Kd + Kd * N + 3 * M * N)
    if words * 4 >= _VMEM_LIMIT:
        return False
    return K * K * M * Kd * N >= 4096


def mp_matmul(a: MP, b: MP, interpret: bool = False) -> MP:
    """Batched MP matmul via the Pallas kernel (callers guard with
    pallas_matmul_viable).  Accepts any matching/broadcastable leading
    batch axes; canonicalized to one batch axis internally.  Wide (MPW)
    pairs route to the two-word kernel."""
    if hasattr(a, "words"):
        a4, b4, unflatten = _canon_wide_pair(a, b)
        return unflatten(_mp_matmul_pallas_wide(a4, b4, interpret=interpret))
    a4, b4, unflatten = _canon_batched_pair(a, b)
    return unflatten(_mp_matmul_pallas(a4, b4, interpret=interpret))


# ---------------------------------------------------------------------------
# Factorization kernels (Cholesky, triangular solve)
#
# The XLA factorizations in ops.linalg are lax.fori_loop programs whose per-
# column bodies read and write whole [B, n, n] limb arrays in HBM — n kernel
# launches per factorization and the dominant share of both the iteration
# runtime and the XLA compile time (each body embeds the full K^2-term MP
# product graph).  These kernels run the WHOLE factorization on-chip: one
# Mosaic custom call per bucket, operands loaded to VMEM once, the loop
# carried in registers/VMEM.  They replace the reference's per-block
# El::Cholesky/El::Trsm (initialize_Q_group.cxx:31-67).
#
# TPU layout facts that shape the implementation:
#   * dynamic LANE indexing is restricted (128-aligned), dynamic sublane
#     indexing is fine — so a pivot COLUMN [n, 1] is extracted with an
#     exact lane-masked sum (exactly one nonzero element per row survives
#     the mask, so a plain f32 sum is exact), and a pivot ROW [1, n] with
#     the sublane-masked sum.
#   * the trailing update needs the pivot both as a column and as a row;
#     keeping the working matrix SYMMETRIC (the trailing Schur complement
#     of an SPD matrix is symmetric) provides both without any in-kernel
#     transpose.
#   * triangular solves always extract COLUMNS of the triangle (right-
#     looking substitution); the transpose solve is fed L^T by the caller
#     (an XLA transpose outside the kernel).
# All MP arithmetic is ops.mplist — list-form limbs + optional exponent
# tile, bit-identical to ops.mpfloat (tests/test_mplist.py), so kernel and
# XLA paths agree limb-for-limb.


def _iota2(n, m):
    sub = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    return sub, lane


def _pick_lane(v, j, n):
    """Column j of Val v ([n, n] tiles) as [n, 1] tiles — exact masked sum."""
    xs, e = v
    _, lane = _iota2(n, n)
    m = lane == j
    cols = [jnp.sum(jnp.where(m, x, 0), axis=1, keepdims=True) for x in xs]
    if e is None:
        return cols, None
    ec = jnp.sum(jnp.where(m, e, 0), axis=1, keepdims=True).astype(jnp.int32)
    return cols, ec


def _pick_sub(v, i, n):
    """Row i of Val v ([n, m] tiles) as [1, m] tiles — exact masked sum."""
    xs, e = v
    m_ = v[0][0].shape[1]
    sub, _ = _iota2(n, m_)
    m = sub == i
    rows = [jnp.sum(jnp.where(m, x, 0), axis=0, keepdims=True) for x in xs]
    if e is None:
        return rows, None
    er = jnp.sum(jnp.where(m, e, 0), axis=0, keepdims=True).astype(jnp.int32)
    return rows, er


def _transpose_col(v, n):
    """[n, 1] Val -> [1, n] Val, exactly: broadcast along lanes, keep the
    diagonal, sum out the sublanes (one nonzero per output element, so the
    plain sum is exact for limbs and int32 exponents alike).  This is the
    Mosaic-friendly vector transpose — no relayout op needed."""
    xs, e = v
    sub, lane = _iota2(n, n)
    m = sub == lane
    xs_t = [jnp.sum(jnp.where(m, jnp.broadcast_to(x, (n, n)), 0),
                    axis=0, keepdims=True) for x in xs]
    if e is None:
        return xs_t, None
    et = jnp.sum(jnp.where(m, jnp.broadcast_to(e, (n, n)), 0),
                 axis=0, keepdims=True).astype(jnp.int32)
    return xs_t, et


def _load_val(refs, K, scaled):
    limbs = [refs[0][k, 0] for k in range(K)]
    e = refs[1][0] if scaled else None
    return limbs, e


def _store_val(refs, v, K, scaled):
    xs, e = v
    for k in range(K):
        refs[0][k, 0] = xs[k]
    if scaled:
        refs[1][0] = e


def _cholesky_kernel(*refs, K: int, scaled: bool):
    """One bucket element: lower Cholesky of SPD A [n, n] (MP limbs).

    Right-looking, reading ONLY the lower triangle (like the XLA path and
    El::Cholesky(LOWER) — solver matrices are symmetric only to the last
    ulp, so the upper triangle must not participate): per pivot j the
    column [n, 1] of M is extracted by an exact masked sum, one rsqrt
    Newton chain gives both sqrt(d) and 1/sqrt(d), the scaled column is
    transposed exactly in-kernel, and the rank-1 trailing update is the
    broadcast product column x row of the SAME values."""
    n_in = 2 if scaled else 1
    a_refs, l_refs = refs[:n_in], refs[n_in:]
    n = a_refs[0].shape[-1]
    sub, lane = _iota2(n, n)

    M0 = _load_val(a_refs, K, scaled)
    L0 = ml.zeros_like_val(M0)

    def body(j, carry):
        M, L = carry
        colM = _pick_lane(M, j, n)               # [n, 1], rows >= j valid
        d2 = _pick_sub(colM, j, n)               # [1, 1]
        r = ml.rsqrt(d2, K)                      # 1/sqrt(d)
        d = ml.mul(d2, r, K)                     # sqrt(d)
        colj = ml.mul(colM, r, K)                # column scaled by 1/d
        below = ml.mask(colj, (sub[:, :1] > j))  # strictly below diag
        colL = ml.where(sub[:, :1] == j, d, below)
        L = ml.where(lane == j, colL, L)         # write column j
        rowv = _transpose_col(below, n)          # [1, n], bitwise same vals
        upd = ml.mul(below, rowv, K)             # [n, 1] x [1, n]
        M = ml.sub(M, upd, K)
        return M, L

    _, L = jax.lax.fori_loop(0, n, body, (M0, L0))
    _store_val(l_refs, L, K, scaled)


def _trsm_kernel(*refs, K: int, scaled: bool, lower: bool):
    """One bucket element: X = T^{-1} B by substitution, T triangular
    [n, n], B [n, m].  `lower=True`: T is lower (forward order);
    `lower=False`: T is UPPER (the caller passes L^T; backward order).
    Right-looking: each solved row xi is immediately eliminated from the
    residual via the pivot column of T."""
    n_in = 2 if scaled else 1
    t_refs, b_refs, x_refs = refs[:n_in], refs[n_in:2 * n_in], refs[2 * n_in:]
    n = t_refs[0].shape[-1]
    m = b_refs[0].shape[-1]
    sub_nm, _ = _iota2(n, m)
    sub_n1 = _iota2(n, 1)[0]

    T = _load_val(t_refs, K, scaled)
    B0 = _load_val(b_refs, K, scaled)

    # diagonal reciprocals, once, vectorized: diag as [n, 1] via the exact
    # lane-pick of the diagonal element per row
    dxs = [jnp.sum(jnp.where(_iota2(n, n)[0] == _iota2(n, n)[1], x, 0),
                   axis=1, keepdims=True) for x in T[0]]
    de = None
    if scaled:
        de = jnp.sum(jnp.where(_iota2(n, n)[0] == _iota2(n, n)[1], T[1], 0),
                     axis=1, keepdims=True).astype(jnp.int32)
    dinv = ml.reciprocal((dxs, de), K)           # [n, 1]

    X0 = ml.zeros_like_val(B0, shape=(n, m))

    def body(t, carry):
        Bres, X = carry
        i = t if lower else n - 1 - t
        rowB = _pick_sub(Bres, i, n)             # [1, m]
        di = _pick_sub(dinv, i, n)               # [1, 1]
        xi = ml.mul(rowB, di, K)                 # [1, m]
        X = ml.where(sub_nm == i, xi, X)
        colT = _pick_lane(T, i, n)               # [n, 1]
        colT = ml.mask(colT, (sub_n1 > i) if lower else (sub_n1 < i))
        Bres = ml.sub(Bres, ml.mul(colT, xi, K), K)
        return Bres, X

    _, X = jax.lax.fori_loop(0, n, body, (B0, X0))
    _store_val(x_refs, X, K, scaled)


def _val_specs(pl, pltpu, K, B, n, m, scaled):
    """BlockSpecs for one MP operand: limbs [K, B, n, m] (+ exp [B, n, m])."""
    specs = [pl.BlockSpec((K, 1, n, m), lambda b: (0, b, 0, 0),
                          memory_space=pltpu.VMEM)]
    if scaled:
        specs.append(pl.BlockSpec((1, n, m), lambda b: (b, 0, 0),
                                  memory_space=pltpu.VMEM))
    return specs


def _val_args(a: MP):
    return (a.limbs, a.exp) if a.scaled else (a.limbs,)


def _val_out(pl, pltpu, K, B, n, m, dtype, scaled):
    shapes = [jax.ShapeDtypeStruct((K, B, n, m), dtype)]
    if scaled:
        shapes.append(jax.ShapeDtypeStruct((B, n, m), jnp.int32))
    return _val_specs(pl, pltpu, K, B, n, m, scaled), shapes


def _as_batched(a: MP):
    """Canonicalize [..., n, m] MP to 4-D limbs [K, B, n, m]; returns
    (mp4, unflatten) where unflatten restores the original batch shape."""
    shape = a.shape
    batch = shape[:-2]
    n, m = shape[-2], shape[-1]
    B = int(np.prod(batch, dtype=np.int64)) if batch else 1
    limbs = a.limbs.reshape((a.limbs.shape[0], B, n, m))
    exp = None if a.exp is None else a.exp.reshape((B, n, m))

    def unflatten(r: MP) -> MP:
        rl = r.limbs.reshape((r.limbs.shape[0],) + batch + (n, r.shape[-1]))
        re = (None if r.exp is None
              else r.exp.reshape(batch + (n, r.shape[-1])))
        return MP(rl, re)

    return MP(limbs, exp), unflatten


def _factor_vmem_words(K, n, m, n_mats):
    return K * n_mats * n * m


def pallas_cholesky_viable(A: MP) -> bool:
    if not isinstance(A, MP):
        return False  # wide (MPW) operands take the XLA composite path
    if jax.default_backend() == "cpu":
        return False
    if A.dtype != jnp.float32:
        return False
    n = A.shape[-1]
    if _factor_vmem_words(A.K, n, n, 4) * 4 >= _VMEM_LIMIT:
        return False
    return n >= 8


def pallas_trsm_viable(T: MP, B: MP) -> bool:
    if not (isinstance(T, MP) and isinstance(B, MP)):
        return False  # wide (MPW) operands take the XLA composite path
    if jax.default_backend() == "cpu":
        return False
    if T.dtype != jnp.float32:
        return False
    n, m = B.shape[-2], B.shape[-1]
    if (_factor_vmem_words(T.K, n, n, 2)
            + _factor_vmem_words(T.K, n, m, 3)) * 4 >= _VMEM_LIMIT:
        return False
    return n >= 8


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_call(a: MP, interpret: bool = False) -> MP:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = a.K
    B, n = a.shape[0], a.shape[-1]
    kernel = functools.partial(_cholesky_kernel, K=K, scaled=a.scaled)
    in_specs = _val_specs(pl, pltpu, K, B, n, n, a.scaled)
    out_specs, out_shapes = _val_out(pl, pltpu, K, B, n, n, a.dtype, a.scaled)
    res = pl.pallas_call(
        kernel, grid=(B,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret,
    )(*_val_args(a))
    return MP(res[0], res[1] if a.scaled else None)


@functools.partial(jax.jit, static_argnames=("lower", "interpret"))
def _trsm_call(t: MP, b: MP, lower: bool, interpret: bool = False) -> MP:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = t.K
    B, n, m = b.shape[0], b.shape[-2], b.shape[-1]
    kernel = functools.partial(_trsm_kernel, K=K, scaled=t.scaled,
                               lower=lower)
    in_specs = (_val_specs(pl, pltpu, K, B, n, n, t.scaled)
                + _val_specs(pl, pltpu, K, B, n, m, b.scaled))
    out_specs, out_shapes = _val_out(pl, pltpu, K, B, n, m, b.dtype, b.scaled)
    res = pl.pallas_call(
        kernel, grid=(B,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret,
    )(*_val_args(t), *_val_args(b))
    return MP(res[0], res[1] if b.scaled else None)


def mp_cholesky(a: MP, interpret: bool = False) -> MP:
    """Batched MP Cholesky via the Pallas kernel (callers guard with
    pallas_cholesky_viable)."""
    a4, unflatten = _as_batched(a)
    return unflatten(_chol_call(a4, interpret=interpret))


def mp_solve_triangular(t: MP, b: MP, lower: bool = True,
                        interpret: bool = False) -> MP:
    """X = T^{-1} B via the Pallas substitution kernel.  `lower=False`
    expects T upper-triangular (pass L.mT for the transpose solve)."""
    t4, _ = _as_batched(t)
    b4, unflatten = _as_batched(b)
    return unflatten(_trsm_call(t4, b4, lower, interpret=interpret))
