"""Multi-device execution: block-batch sharding over a jax.sharding.Mesh.

This is the TPU-native replacement for the reference's MPI plane
(/root/reference/src/sdp_solve/Block_Info/allocate_blocks/allocate_blocks.cxx
distributes blocks over MPI rank groups; synchronize_Q.cxx:23-186 hand-rolls
a ring reduce-scatter of the global N x N matrix Q).  Here the J blocks
live on the batch axis of each shape bucket; that axis is sharded over the
`blocks` mesh axis with shard_map, and the cross-device plane collapses to
XLA collectives emitted inside the jitted iteration:

  * Q contributions       -> psum  (the synchronize_Q analog, over ICI)
  * B^T x / dy assembly   -> psum
  * error norms           -> pmax
  * step-length lambda    -> pmin
  * scalars (mu, objectives, Frobenius products) -> psum

Every device executes the identical program on its shard of every bucket —
pure SPMD, no rank groups, no heterogeneous communicators.  Load balance is
the planner's job (sdpb_tpu.parallel.planner): it permutes blocks so each
device's shard has comparable total cost before the batch axis is split.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.sdp import Bucket, DeviceSDP
from ..ops.mpfloat import MP
from ..solver.state import BucketState, SolverState
from ..solver.step import StepConfig, make_iteration

BLOCK_AXIS = "blocks"


def make_mesh(devices=None, axis: str = BLOCK_AXIS) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis,))


def _mp_spec(like: MP, batch_sharded: bool, axis: str):
    """Spec 'MP' for an MP operand: limbs carry a leading K axis, so the
    batch sits at limbs axis 1 but exp axis 0 (scaled mode)."""
    lspec = P(None, axis) if batch_sharded else P()
    espec = (P(axis) if batch_sharded else P()) if like.scaled else None
    return MP(lspec, espec)


def sdp_pspecs(sdp: DeviceSDP, axis: str = BLOCK_AXIS) -> DeviceSDP:
    """PartitionSpec tree for a DeviceSDP: bucket batch axes sharded,
    objectives replicated."""
    buckets = [
        Bucket(
            bases_even=_mp_spec(bk.bases_even, True, axis),
            bases_odd=_mp_spec(bk.bases_odd, True, axis),
            emb_even=_mp_spec(bk.emb_even, True, axis),
            emb_odd=_mp_spec(bk.emb_odd, True, axis),
            Bmat=_mp_spec(bk.Bmat, True, axis),
            c=_mp_spec(bk.c, True, axis), mask=P(axis),
            row_mask=P(axis), psd_mask_even=P(axis), psd_mask_odd=P(axis),
            real_sizes=bk.real_sizes, shape=bk.shape,
        )
        for bk in sdp.buckets
    ]
    return DeviceSDP(objective_const=_mp_spec(sdp.objective_const, False, axis),
                     b=_mp_spec(sdp.b, False, axis), buckets=buckets)


def state_pspecs(state: SolverState, axis: str = BLOCK_AXIS) -> SolverState:
    """PartitionSpec tree for SolverState: y replicated, bucket batches
    sharded."""
    buckets = [
        BucketState(x=_mp_spec(bs.x, True, axis),
                    X_even=_mp_spec(bs.X_even, True, axis),
                    X_odd=_mp_spec(bs.X_odd, True, axis),
                    Y_even=_mp_spec(bs.Y_even, True, axis),
                    Y_odd=_mp_spec(bs.Y_odd, True, axis))
        for bs in state.buckets
    ]
    return SolverState(y=_mp_spec(state.y, False, axis), buckets=buckets)


def shard_sdp(sdp: DeviceSDP, mesh: Mesh, axis: str = BLOCK_AXIS) -> DeviceSDP:
    """Lay out the problem data across the mesh per sdp_pspecs."""
    return _device_put_tree(sdp, sdp_pspecs(sdp, axis), mesh)


def shard_state(state: SolverState, mesh: Mesh, axis: str = BLOCK_AXIS) -> SolverState:
    return _device_put_tree(state, state_pspecs(state, axis), mesh)


def _device_put_tree(tree, spec_tree, mesh):
    """device_put with a PartitionSpec tree-prefix (each P covers the MP
    subtree beneath it)."""
    specs, treedef = jax.tree.flatten(spec_tree, is_leaf=lambda x: isinstance(x, P))
    subtrees = treedef.flatten_up_to(tree)
    out = []
    for sub, s in zip(subtrees, specs):
        sharding = NamedSharding(mesh, s)
        out.append(jax.tree.map(lambda x: jax.device_put(x, sharding), sub))
    return jax.tree.unflatten(treedef, out)


def make_sharded_iteration(sdp: DeviceSDP, state: SolverState, cfg: StepConfig,
                           mesh: Mesh, axis: Optional[str] = None):
    """shard_map the IPM iteration over the mesh: (sdp, state) ->
    (replicated stats, sharded new state).

    Requires cfg.axis == the mesh axis name and every bucket batch to be a
    multiple of the mesh size (build_device_sdp(pad_to=mesh.size)).
    """
    axis = axis or mesh.axis_names[0]
    assert cfg.axis == axis, (cfg.axis, axis)
    for bk in sdp.buckets:
        assert bk.batch % mesh.size == 0, (
            f"bucket batch {bk.batch} not divisible by mesh size {mesh.size}; "
            f"build the DeviceSDP with pad_to={mesh.size}")

    in_specs = (sdp_pspecs(sdp, axis), state_pspecs(state, axis))
    out_specs = (P(), state_pspecs(state, axis))
    fn = jax.shard_map(make_iteration(cfg), mesh=mesh,
                       in_specs=in_specs, out_specs=out_specs,
                       check_vma=False)
    return jax.jit(fn)
