"""Multi-host execution: jax.distributed runtime + cross-process staging.

The reference is an MPI cluster code first: blocks are allocated to rank
groups spanning nodes (/root/reference/src/sdp_solve/Block_Info/
allocate_blocks/allocate_blocks.cxx:37-117) and the global Q reduction is a
hand-rolled cross-node ring reduce-scatter (synchronize_Q.cxx:23-186).  The
TPU-native replacement keeps ONE SPMD program: every process joins a
jax.distributed runtime, the mesh spans all processes' devices (ICI within
a slice, DCN across hosts), and the very same jitted iteration — with its
psum/pmax collectives — runs unchanged; XLA routes the collectives over
the right fabric.  No rank groups, no hand-written transport.

Block->host placement: the batch axis of every bucket is split into
contiguous equal shards, one per device, with devices ordered
process-major (jax mesh convention).  parallel.planner's LPT slot
assignment therefore balances per-DEVICE cost, which subsumes per-host
balance; the reference's two-level Worst-Fit-First mapping
(compute_block_grid_mapping) remains available for the intra-block
distribution planner.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join (or skip, when single-process) the distributed runtime.

    Arguments default from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), matching
    how the reference is driven by mpirun's environment.  Must run before
    the first backend use."""
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1 or coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def process_index() -> int:
    import jax

    return jax.process_index()


def is_coordinator() -> bool:
    return process_index() == 0
