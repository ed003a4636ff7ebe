"""Device-side SDP problem representation: shape-bucketed, batched blocks.

The reference distributes J heterogeneous blocks over MPI rank groups as
El::DistMatrices (/root/reference/src/sdp_solve/SDP.hxx:73-109).  The
TPU-native layout instead groups blocks by identical (dim, num_points)
shape into BATCHED MP arrays [B, ...], so one fused XLA computation
processes a whole bucket; heterogeneity across buckets becomes a short
unrolled Python loop inside jit, and the batch axis is what gets sharded
over the device mesh (see sdpb_tpu.parallel).

Bucket padding: the batch is padded to a multiple of the mesh size with
identity-safe dummy blocks (mask=0) — zero bases/B/c, X=Y=I — whose Schur
blocks are patched to I so Cholesky stays defined and whose contributions
vanish from every reduction.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.sdp_zip import SDPData
from ..ops import mpfloat as mp
from ..ops.mpfloat import MP


@dataclass(frozen=True)
class BucketShape:
    dim: int          # m_j
    num_points: int   # n_j  (= d_j + 1 sample points)
    h_even: int       # rows of even bilinear basis (delta_even + 1)
    h_odd: int        # rows of odd bilinear basis (may be 0)

    @property
    def schur_size(self) -> int:
        return self.num_points * self.dim * (self.dim + 1) // 2

    @property
    def psd_even(self) -> int:
        return self.dim * self.h_even

    @property
    def psd_odd(self) -> int:
        return self.dim * self.h_odd

    @property
    def n_pairs(self) -> int:
        return self.dim * (self.dim + 1) // 2


@jax.tree_util.register_pytree_node_class
@dataclass
class Bucket:
    """A batch of same-shape blocks resident on device."""

    bases_even: MP   # [B, h_e, np]
    bases_odd: MP    # [B, h_o, np]
    emb_even: MP     # [B, m*h_e, m*np]  block-diagonal embedding (bases_blocks)
    emb_odd: MP      # [B, m*h_o, m*np]
    Bmat: MP         # [B, P_j, N]
    c: MP            # [B, P_j]
    mask: jnp.ndarray    # [B] 1.0 real block / 0.0 padding
    block_indices: tuple  # global block ids (static)
    shape: BucketShape    # static

    def tree_flatten(self):
        children = (self.bases_even, self.bases_odd, self.emb_even,
                    self.emb_odd, self.Bmat, self.c, self.mask)
        aux = (self.block_indices, self.shape)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, block_indices=aux[0], shape=aux[1])

    @property
    def batch(self) -> int:
        return self.mask.shape[0]


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
        """Sum of real PSD block sizes (denominator of mu; mirrors
        psd_matrix_block_sizes totals in run.cxx)."""
        total = 0
        for bk in self.buckets:
            nreal = len([i for i in bk.block_indices if i >= 0])
            total += nreal * (bk.shape.psd_even + bk.shape.psd_odd)
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


def build_device_sdp(sdp: SDPData, pad_to: int = 1) -> DeviceSDP:
    """Bucket host blocks by shape, pad each bucket's batch to a multiple of
    `pad_to` (the mesh size), and stage everything to device MP arrays."""
    K = sdp.b.shape[0]
    dtype = jnp.asarray(sdp.b).dtype

    groups: Dict[BucketShape, List] = {}
    for blk in sdp.blocks:
        shape = BucketShape(
            dim=blk.dim, num_points=blk.num_points,
            h_even=blk.bases_even.shape[1], h_odd=blk.bases_odd.shape[1],
        )
        groups.setdefault(shape, []).append(blk)

    buckets = []
    for shape, blks in sorted(groups.items(), key=lambda kv: (kv[0].schur_size, kv[0].dim)):
        B = len(blks)
        Bpad = -(-B // pad_to) * pad_to
        N = sdp.dual_dim

        def stack(attr, target_shape):
            arrs = [getattr(b, attr) for b in blks]
            out = np.zeros((Bpad, K) + target_shape, dtype=arrs[0].dtype)
            for i, a in enumerate(arrs):
                out[i] = a
            # -> limbs-first [K, Bpad, ...]
            return np.moveaxis(out, 1, 0)

        bases_even = stack("bases_even", (shape.h_even, shape.num_points))
        bases_odd = stack("bases_odd", (shape.h_odd, shape.num_points))
        c = stack("c", (shape.schur_size,))
        Bmat = stack("B", (shape.schur_size, N))
        emb_even = np.stack(
            [_embed_blockdiag(bases_even[:, i], shape.dim) for i in range(Bpad)], axis=1)
        emb_odd = np.stack(
            [_embed_blockdiag(bases_odd[:, i], shape.dim) for i in range(Bpad)], axis=1)
        mask = np.zeros(Bpad, dtype=np.float64 if dtype == jnp.float64 else np.float32)
        mask[:B] = 1.0
        indices = tuple(b.index for b in blks) + (-1,) * (Bpad - B)

        buckets.append(Bucket(
            bases_even=MP(jnp.asarray(bases_even, dtype=dtype)),
            bases_odd=MP(jnp.asarray(bases_odd, dtype=dtype)),
            emb_even=MP(jnp.asarray(emb_even, dtype=dtype)),
            emb_odd=MP(jnp.asarray(emb_odd, dtype=dtype)),
            Bmat=MP(jnp.asarray(Bmat, dtype=dtype)),
            c=MP(jnp.asarray(c, dtype=dtype)),
            mask=jnp.asarray(mask),
            block_indices=indices,
            shape=shape,
        ))

    return DeviceSDP(
        objective_const=MP(jnp.asarray(sdp.objective_const, dtype=dtype)),
        b=MP(jnp.asarray(sdp.b, dtype=dtype)),
        buckets=buckets,
    )
