"""Solver state: the primal/dual iterates (x, X, y, Y) as bucketed batches.

Mirrors SDP_Solver's members (x, X, y, Y;
/root/reference/src/sdp_solve/SDP_Solver.hxx:23-113) with Elemental
DistMatrices replaced by batched MP arrays.  Padded batch entries carry
X = Y = I so factorizations stay defined; their updates are masked to zero
every iteration.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..models.sdp import DeviceSDP, Bucket
from ..ops import mpfloat as mp
from ..ops.mpfloat import MP


@jax.tree_util.register_pytree_node_class
@dataclass
class BucketState:
    x: MP        # [B, P_j]
    X_even: MP   # [B, pe, pe]
    X_odd: MP    # [B, po, po]
    Y_even: MP
    Y_odd: MP

    def tree_flatten(self):
        return (self.x, self.X_even, self.X_odd, self.Y_even, self.Y_odd), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def parities(self):
        """(X, Y) pairs per parity with nonzero size."""
        out = []
        if self.X_even.shape[-1] > 0:
            out.append(("even", self.X_even, self.Y_even))
        if self.X_odd.shape[-1] > 0:
            out.append(("odd", self.X_odd, self.Y_odd))
        return out


@jax.tree_util.register_pytree_node_class
@dataclass
class SolverState:
    y: MP                       # [N]
    buckets: List[BucketState]

    def tree_flatten(self):
        return (self.y, self.buckets), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _identity_mp(B, n, K, dtype, scale_limbs=None):
    eye = jnp.eye(n, dtype=dtype)
    limbs = jnp.zeros((K, B, n, n), dtype=dtype)
    if n == 0:
        return MP(limbs)
    if scale_limbs is None:
        limbs = limbs.at[0].set(eye)
    else:
        # scale is an exact K-limb constant: Omega * I has limbs Omega_k * eye
        for k in range(K):
            limbs = limbs.at[k].set(eye * scale_limbs[k])
    return MP(limbs)


def initial_state(sdp: DeviceSDP, omega_primal_limbs, omega_dual_limbs) -> SolverState:
    """x = y = 0, X = Omega_p I, Y = Omega_d I
    (SDP_Solver ctor, /root/reference/src/sdp_solve/SDP_Solver/SDP_Solver.cxx:24-38).

    Padded batch entries get X = Y = I (unscaled) so their Cholesky stays
    perfectly conditioned regardless of Omega."""
    K = sdp.b.K
    dtype = sdp.b.dtype
    buckets = []
    for bk in sdp.buckets:
        B = bk.batch
        sh = bk.shape
        mask = bk.mask  # [B]

        def psd_init(n, omega):
            scaled = _identity_mp(B, n, K, dtype, omega)
            plain = _identity_mp(B, n, K, dtype, None)
            m = mask[:, None, None]
            return MP(scaled.limbs * m + plain.limbs * (1 - m))

        buckets.append(BucketState(
            x=mp.zeros((B, sh.schur_size), K, dtype),
            X_even=psd_init(sh.psd_even, omega_primal_limbs),
            X_odd=psd_init(sh.psd_odd, omega_primal_limbs),
            Y_even=psd_init(sh.psd_even, omega_dual_limbs),
            Y_odd=psd_init(sh.psd_odd, omega_dual_limbs),
        ))
    return SolverState(y=mp.zeros((sdp.dual_dim,), K, dtype), buckets=buckets)
