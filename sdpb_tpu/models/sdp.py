"""Device-side SDP problem representation: shape-bucketed, batched blocks.

The reference distributes J heterogeneous blocks over MPI rank groups as
El::DistMatrices (/root/reference/src/sdp_solve/SDP.hxx:73-109).  The
TPU-native layout instead groups blocks into BATCHED MP arrays [B, ...], so
one fused XLA computation processes a whole bucket; the batch axis is what
gets sharded over the device mesh (see sdpb_tpu.parallel).

Two levels of padding make heterogeneous blocks uniform:

  * BLOCK padding: each bucket's batch is padded to a multiple of the mesh
    size with dummy blocks (all masks zero, S and X/Y patched to I).
  * SHAPE padding (quantized bucketing, the default): blocks whose
    (dim, num_points) are *close* share a bucket; each is zero-padded to
    the bucket's (num_points, h_even, h_odd) and carries element masks:
      - row_mask [B, P]      1 for real constraint rows (pair, point)
      - psd_mask_even/odd [B, dim*h]  1 for real PSD dimensions
    Zero bases/B/c rows make padded constraints and PSD dims inert;
    the solver patches Schur rows and X/Y diagonals to identity and masks
    every residual/trace so padding contributes exactly nothing (see
    sdpb_tpu.solver.step).  This keeps the number of distinct XLA programs
    (and hence compile time) independent of the problem's shape diversity —
    the analog of the reference running the same C++ code per block, which
    XLA's static-shape model would otherwise forbid.

Constraint-row layout inside a block: p = (pair, point) flattened with
points contiguous per pair (pair ordering (s,r), r <= s, as SDP.hxx:52-58),
with points padded to the bucket's num_points.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.sdp_zip import SDPData
from ..ops import mpfloat as mp
from ..ops.mpfloat import MP


@dataclass(frozen=True)
class BucketShape:
    dim: int          # m_j
    num_points: int   # padded sample-point count
    h_even: int       # padded rows of even bilinear basis
    h_odd: int        # padded rows of odd bilinear basis (may be 0)

    @property
    def schur_size(self) -> int:
        return self.num_points * self.dim * (self.dim + 1) // 2

    @property
    def n_pairs(self) -> int:
        return self.dim * (self.dim + 1) // 2


@dataclass(frozen=True)
class RealSize:
    """Per-block real (unpadded) dims; block_index < 0 marks batch padding."""
    block_index: int
    num_points: int
    h_even: int
    h_odd: int


@jax.tree_util.register_pytree_node_class
@dataclass
class Bucket:
    """A batch of same-(padded-)shape blocks resident on device."""

    bases_even: MP   # [B, h_e, np]
    bases_odd: MP    # [B, h_o, np]
    emb_even: MP     # [B, m*h_e, m*np]  block-diagonal embedding (bases_blocks)
    emb_odd: MP      # [B, m*h_o, m*np]
    Bmat: MP         # [B, P_j, N]
    c: MP            # [B, P_j]
    mask: jnp.ndarray           # [B] 1.0 real block / 0.0 batch padding
    row_mask: jnp.ndarray       # [B, P] 1.0 real constraint row
    psd_mask_even: jnp.ndarray  # [B, m*h_e] 1.0 real PSD dim
    psd_mask_odd: jnp.ndarray   # [B, m*h_o]
    real_sizes: tuple           # tuple[RealSize] (static)
    shape: BucketShape          # static

    def tree_flatten(self):
        children = (self.bases_even, self.bases_odd, self.emb_even,
                    self.emb_odd, self.Bmat, self.c, self.mask,
                    self.row_mask, self.psd_mask_even, self.psd_mask_odd)
        aux = (self.real_sizes, self.shape)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, real_sizes=aux[0], shape=aux[1])

    @property
    def batch(self) -> int:
        return self.mask.shape[0]

    @property
    def block_indices(self) -> tuple:
        return tuple(rs.block_index for rs in self.real_sizes)


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceSDP:
    """Full problem on device: objectives + bucketed blocks."""

    objective_const: MP  # scalar
    b: MP                # [N] dual objective vector
    buckets: List[Bucket]

    def tree_flatten(self):
        return (self.objective_const, self.b, self.buckets), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def dual_dim(self) -> int:
        return self.b.shape[0]

    @property
    def total_psd_rows(self) -> int:
        """Sum of REAL PSD block sizes (denominator of mu; mirrors
        psd_matrix_block_sizes totals in run.cxx)."""
        total = 0
        for bk in self.buckets:
            for rs in bk.real_sizes:
                if rs.block_index >= 0:
                    total += bk.shape.dim * (rs.h_even + rs.h_odd)
        return total


def _embed_blockdiag(basis_limbs: np.ndarray, dim: int) -> np.ndarray:
    """Replicate basis [K, h, np] into block-diagonal [K, dim*h, dim*np]
    (the reference's set_bases_blocks,
    /root/reference/src/sdp_solve/SDP/SDP/set_bases_blocks.cxx)."""
    K, h, n = basis_limbs.shape
    out = np.zeros((K, dim * h, dim * n), dtype=basis_limbs.dtype)
    for d in range(dim):
        out[:, d * h : (d + 1) * h, d * n : (d + 1) * n] = basis_limbs
    return out


def _quantize(np_: int, quant: int) -> int:
    return -(-np_ // quant) * quant


def bucket_key(dim: int, num_points: int, policy: str, quant: int) -> tuple:
    if policy == "exact":
        return (dim, num_points, "exact")
    return (dim, _quantize(num_points, quant))


def build_device_sdp(sdp: SDPData, pad_to: int = 1, shape_policy: str = "quantized",
                     quant: int = 8, scaled_limbs: int = 0,
                     block_costs: Optional[dict] = None) -> DeviceSDP:
    """Bucket host blocks by (quantized) shape, zero-pad each block to the
    bucket shape, pad batches to a multiple of `pad_to` (the mesh size), and
    stage everything to device MP arrays.

    scaled_limbs > 0 stages to the SCALED representation (f32 mantissa
    limbs + per-element int32 exponent; ops.mpfloat): the host SDPData must
    then hold float64 limbs (read_sdp(..., K64, np.float64) with
    K64 >= ceil(24*scaled_limbs/53)+1), which are converted exactly.  This
    is the TPU staging path — raw f32 limbs lose tails outside ~1e+-30.

    shape_policy:
      * "quantized" (default): blocks with equal dim and num_points in the
        same `quant`-sized band share a bucket (padded to the in-bucket max
        num_points / h).  Compile time scales with the number of bands, not
        with the number of distinct shapes.
      * "exact": one bucket per exact shape (no element padding).

    When pad_to > 1 (a device mesh), each bucket's blocks are LPT-ordered
    by the reference's RAM-cost heuristic so shard_map's contiguous batch
    split balances total cost per device (the block_timings load-balancer
    analog; parallel/planner.py).
    """
    K = sdp.b.shape[0]
    if scaled_limbs:
        # host limbs stay numpy float64; the device arrays become f32+exp
        # (do NOT touch jnp here: without x64 it would silently downcast)
        npdt = np.dtype(np.asarray(sdp.b).dtype)
        dtype = jnp.float32
        assert npdt == np.float64, "scaled staging requires float64 host limbs"
        need = -(-(24 * scaled_limbs) // 53) + 1
        assert K >= need, (f"host K={K} f64 limbs carry {53*K} bits < "
                           f"{24*scaled_limbs}+ needed for scaled K={scaled_limbs}")
    else:
        dtype = jnp.asarray(sdp.b).dtype
        npdt = np.float32 if dtype == jnp.float32 else np.float64

    def _stage(arr: np.ndarray) -> MP:
        """Host [K, *shape] limb array -> device MP (either representation)."""
        if not scaled_limbs:
            return MP(jnp.asarray(arr, dtype=dtype))
        if scaled_limbs > 9:
            # WIDE (>216-bit) staging: G words, each its own exponent plane
            from ..ops.mpwide import f64_limbs_to_wide_parts, wide_parts_to_mp

            return wide_parts_to_mp(f64_limbs_to_wide_parts(arr, scaled_limbs))
        limbs, exp = mp.f64_limbs_to_scaled_parts(arr, scaled_limbs)
        return MP(jnp.asarray(limbs), jnp.asarray(exp))

    groups: Dict[tuple, List] = {}
    for blk in sdp.blocks:
        key = bucket_key(blk.dim, blk.num_points, shape_policy, quant)
        groups.setdefault(key, []).append(blk)

    buckets = []
    for key, blks in sorted(groups.items(), key=lambda kv: str(kv[0])):
        dim = blks[0].dim
        np_pad = max(b.num_points for b in blks)
        he_pad = max(b.bases_even.shape[1] for b in blks)
        ho_pad = max(b.bases_odd.shape[1] for b in blks)
        shape = BucketShape(dim=dim, num_points=np_pad, h_even=he_pad, h_odd=ho_pad)

        B = len(blks)
        Bpad = -(-B // pad_to) * pad_to
        if pad_to > 1:
            # LPT slot placement: device d owns slots [d*cap, (d+1)*cap) with
            # its padding inside its own range, so the contiguous shard_map
            # split sees the planned per-device chunks.  Costs come from the
            # timing run's block_timings when available (parallel.timing,
            # the measured block_timings analog of read_block_costs.cxx:15-28),
            # else the reference's RAM heuristic.
            from ..parallel.planner import (block_cost_heuristic,
                                            plan_block_slots)

            if block_costs:
                costs = [float(block_costs.get(str(b.index), 0.0)) for b in blks]
                if not any(costs):
                    block_costs = None
            if not block_costs:
                costs = [block_cost_heuristic(
                    b.dim, b.num_points, b.bases_even.shape[1],
                    b.bases_odd.shape[1], sdp.dual_dim) for b in blks]
            slots = plan_block_slots(costs, pad_to)
        else:
            slots = list(range(B)) + [None] * (Bpad - B)
        assert len(slots) == Bpad, (len(slots), Bpad)
        blks = [None if s is None else blks[s] for s in slots]
        N = sdp.dual_dim
        n_pairs = shape.n_pairs
        P = shape.schur_size

        bases_even = np.zeros((K, Bpad, he_pad, np_pad), dtype=npdt)
        bases_odd = np.zeros((K, Bpad, ho_pad, np_pad), dtype=npdt)
        c = np.zeros((K, Bpad, P), dtype=npdt)
        Bmat = np.zeros((K, Bpad, P, N), dtype=npdt)
        mask = np.zeros(Bpad, dtype=npdt)
        row_mask = np.zeros((Bpad, P), dtype=npdt)
        pm_even = np.zeros((Bpad, dim * he_pad), dtype=npdt)
        pm_odd = np.zeros((Bpad, dim * ho_pad), dtype=npdt)
        real_sizes = []

        for i, blk in enumerate(blks):
            if blk is None:
                real_sizes.append(RealSize(-1, np_pad, he_pad, ho_pad))
                continue
            npr = blk.num_points
            he = blk.bases_even.shape[1]
            ho = blk.bases_odd.shape[1]
            real_sizes.append(RealSize(blk.index, npr, he, ho))
            bases_even[:, i, :he, :npr] = blk.bases_even
            bases_odd[:, i, :ho, :npr] = blk.bases_odd
            # constraint rows: [n_pairs, np_real] -> [n_pairs, np_pad]
            c_r = blk.c.reshape(K, n_pairs, npr)
            c[:, i].reshape(K, n_pairs, np_pad)[:, :, :npr] = c_r
            B_r = blk.B.reshape(K, n_pairs, npr, N)
            Bmat[:, i].reshape(K, n_pairs, np_pad, N)[:, :, :npr] = B_r
            mask[i] = 1.0
            row_mask[i].reshape(n_pairs, np_pad)[:, :npr] = 1.0
            pm_even[i].reshape(dim, he_pad)[:, :he] = 1.0
            pm_odd[i].reshape(dim, ho_pad)[:, :ho] = 1.0

        emb_even = np.stack(
            [_embed_blockdiag(bases_even[:, i], dim) for i in range(Bpad)], axis=1)
        emb_odd = np.stack(
            [_embed_blockdiag(bases_odd[:, i], dim) for i in range(Bpad)], axis=1)

        mdt = np.float32 if scaled_limbs else npdt
        buckets.append(Bucket(
            bases_even=_stage(bases_even),
            bases_odd=_stage(bases_odd),
            emb_even=_stage(emb_even),
            emb_odd=_stage(emb_odd),
            Bmat=_stage(Bmat),
            c=_stage(c),
            mask=jnp.asarray(mask.astype(mdt)),
            row_mask=jnp.asarray(row_mask.astype(mdt)),
            psd_mask_even=jnp.asarray(pm_even.astype(mdt)),
            psd_mask_odd=jnp.asarray(pm_odd.astype(mdt)),
            real_sizes=tuple(real_sizes),
            shape=shape,
        ))

    return DeviceSDP(
        objective_const=_stage(np.asarray(sdp.objective_const)),
        b=_stage(np.asarray(sdp.b)),
        buckets=buckets,
    )
