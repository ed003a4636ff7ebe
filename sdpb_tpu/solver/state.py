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


def initial_state(sdp: DeviceSDP, omega_primal, omega_dual) -> SolverState:
    """x = y = 0, X = Omega_p I, Y = Omega_d I on REAL PSD dims
    (SDP_Solver ctor, /root/reference/src/sdp_solve/SDP_Solver/SDP_Solver.cxx:24-38).

    omega_* are host MP parts: a [K] limb array (classic) or a
    (limbs [K], exp) pair (scaled mode, where the per-element exponent
    removes the f32 range wall that capped Omega on TPU in round 1).

    Padded PSD dims (shape padding and whole padded batch entries) get
    X = Y = I so their Cholesky stays perfectly conditioned regardless of
    Omega, and their updates are masked to zero every iteration."""
    K = sdp.b.K
    dtype = sdp.b.dtype
    scaled = sdp.b.scaled
    buckets = []
    for bk in sdp.buckets:
        B = bk.batch
        sh = bk.shape

        def psd_init(psd_mask, omega):
            n = psd_mask.shape[1]
            wide = scaled and isinstance(omega, list)
            if scaled and not wide:
                omega_limbs, omega_exp = omega
            elif not scaled:
                omega_limbs = omega
            if n == 0:
                return mp.zeros((B, n, n), K, dtype, scaled=scaled)
            eye = jnp.eye(n, dtype=dtype)
            m = psd_mask.astype(dtype)  # [B, n]; diag mask
            diag_real = eye * m[:, None, :]
            diag_pad = eye * (1 - m)[:, None, :]
            if wide:
                # WIDE: word 0 carries Omega's top word plus the padded
                # identity (1.0 on word 0's ladder); lower words carry
                # Omega's remaining mantissa on the real diagonal only
                from ..ops.mpwide import MPW

                words = []
                for g, (wl, we) in enumerate(omega):
                    Kg = wl.shape[0]
                    C = mp.center_for(Kg)
                    wlimbs = jnp.zeros((Kg, B, n, n), dtype=dtype)
                    top = diag_real * dtype.type(wl[0])
                    if g == 0:
                        top = top + diag_pad * dtype.type(2.0 ** C)
                    wlimbs = wlimbs.at[0].set(top)
                    for k in range(1, Kg):
                        wlimbs = wlimbs.at[k].set(diag_real * dtype.type(wl[k]))
                    wexp = jnp.where(diag_real > 0, jnp.int32(we),
                                     jnp.where(diag_pad > 0,
                                               jnp.int32(-C) if g == 0
                                               else mp.EXP_ZERO,
                                               mp.EXP_ZERO))
                    words.append(MP(wlimbs, wexp))
                return MPW(tuple(words))
            limbs = jnp.zeros((K, B, n, n), dtype=dtype)
            if scaled:
                # padded diag = 1.0 on the CENTER(K) ladder: top limb 2^C,
                # exp -C; real diag = Omega's mantissa at Omega's exponent
                C = mp.center_for(K)
                limbs = limbs.at[0].set(diag_real * omega_limbs[0]
                                        + diag_pad * dtype.type(2.0 ** C))
                for k in range(1, K):
                    limbs = limbs.at[k].set(diag_real * omega_limbs[k])
                exp = jnp.where(diag_real > 0, jnp.int32(omega_exp),
                                jnp.where(diag_pad > 0, jnp.int32(-C),
                                          mp.EXP_ZERO))
                return MP(limbs, exp)
            limbs = limbs.at[0].set(diag_real * omega_limbs[0] + diag_pad)
            for k in range(1, K):
                limbs = limbs.at[k].set(diag_real * omega_limbs[k])
            return MP(limbs)

        buckets.append(BucketState(
            x=mp.zeros((B, sh.schur_size), K, dtype, scaled=scaled),
            X_even=psd_init(bk.psd_mask_even, omega_primal),
            X_odd=psd_init(bk.psd_mask_odd, omega_primal),
            Y_even=psd_init(bk.psd_mask_even, omega_dual),
            Y_odd=psd_init(bk.psd_mask_odd, omega_dual),
        ))
    return SolverState(y=mp.zeros((sdp.dual_dim,), K, dtype, scaled=scaled),
                       buckets=buckets)
