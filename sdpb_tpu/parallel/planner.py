"""Block -> device planning: cost models and load balancing.

Two layers, mirroring the reference's two-phase strategy:

1. `compute_block_grid_mapping`: the reference's Worst-Fit-First bin
   packing of blocks onto nodes/process groups (algorithm documented in
   /root/reference/src/sdp_solve/Block_Info/allocate_blocks/
   compute_block_grid_mapping.cxx:1-46; re-implemented here in Python for
   the `block_grid_mapping` debug CLI and for multi-host planning).
   Integer arithmetic throughout, "to make sure that the results are the
   same on different processers" (:61-66).

2. `plan_block_order`: the TPU-native balancer.  Blocks live on the batch
   axis of shape buckets and shard_map splits that axis CONTIGUOUSLY and
   EQUALLY across devices, so balancing is a permutation problem: order
   each bucket's blocks so every device's contiguous slice has similar
   total cost (LPT greedy with fixed per-device capacity).

Costs come from `block_cost_heuristic` — the reference's RAM-proportional
estimate 2*B_band + 5*psd + 2*schur + 2*bilinear
(read_block_costs.cxx:69-87) — or from measured per-bucket timings (the
`block_timings` analog).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple


@dataclass
class BlockMap:
    """A group of processes owning one big block or several small ones
    (Block_Map.hxx:5-28).  num_procs>1 and len(block_indices)>1 are
    mutually exclusive."""

    num_procs: int = 0
    cost: int = 0
    block_indices: List[int] = field(default_factory=list)

    def avg_less_than(self, other: "BlockMap") -> bool:
        # sort by average cost without division (Block_Map.hxx:23-27)
        return self.cost * other.num_procs < other.cost * self.num_procs


def compute_block_grid_mapping(procs_per_node: int, num_nodes: int,
                               block_costs: Sequence[Tuple[int, int]]
                               ) -> List[List[BlockMap]]:
    """block_costs: (cost, index) sorted descending by cost.
    Returns per-node lists of BlockMaps."""
    total_cost = sum(c for c, _ in block_costs)
    num_procs = procs_per_node * num_nodes
    available = [procs_per_node] * num_nodes
    result: List[List[BlockMap]] = [[] for _ in range(num_nodes)]

    # big blocks: cost > average -> own group of floor(cost*P/total) procs,
    # placed on the node with the most free procs (Worst Fit First)
    split = 0
    while (split < len(block_costs)
           and num_procs * block_costs[split][0] > total_cost):
        split += 1

    remaining_cost, remaining_procs = total_cost, num_procs
    for cost, index in block_costs[:split]:
        node = max(range(num_nodes), key=lambda n: available[n])
        procs = min(available[node],
                    max(1, cost * num_procs // total_cost))
        result[node].append(BlockMap(procs, cost, [index]))
        available[node] -= procs
        remaining_cost -= cost
        remaining_procs -= procs

    # hand leftover procs to the costliest existing group per spare proc
    if remaining_procs != num_procs:
        required = (remaining_cost * num_procs + (total_cost - 1)) // total_cost
        extra = remaining_procs - required
        while extra > 0:
            best = None
            best_node = None
            for node in range(num_nodes):
                if available[node] > 0 and result[node]:
                    cand = max(result[node],
                               key=lambda m: (m.cost / m.num_procs, ))
                    # exact integer comparison like Block_Map::operator<
                    top = None
                    for m in result[node]:
                        if top is None or top.avg_less_than(m):
                            top = m
                    if best is None or best.avg_less_than(top):
                        best = top
                        best_node = node
            if best is None:
                break
            best.num_procs += 1
            available[best_node] -= 1
            extra -= 1

    # small blocks: round-robin to the least-loaded single-proc group
    pools: List[List[BlockMap]] = [
        [BlockMap(1, 0, []) for _ in range(available[n])]
        for n in range(num_nodes)]
    for cost, index in block_costs[split:]:
        best = None
        for node in range(num_nodes):
            for m in pools[node]:
                if best is None or m.cost < best.cost:
                    best = m
        if best is None:
            raise RuntimeError("INTERNAL ERROR: Unable to find any "
                               "free processors for remaining blocks")
        best.cost += cost
        best.block_indices.append(index)
    for node in range(num_nodes):
        result[node].extend(pools[node])
    return result


def block_cost_heuristic(dim: int, num_points: int, h_even: int, h_odd: int,
                         dual_dim: int) -> int:
    """RAM-proportional cost estimate (read_block_costs.cxx:69-87)."""
    schur_size = num_points * dim * (dim + 1) // 2
    psd = (dim * h_even) ** 2 + (dim * h_odd) ** 2
    bilinear = (dim * num_points) ** 2 * (2 if h_odd else 1)
    B_band = schur_size * dual_dim
    return 2 * B_band + 5 * psd + 2 * schur_size ** 2 + 2 * bilinear


def plan_block_slots(costs: Sequence[int], n_devices: int):
    """Slot assignment of length n_devices * ceil(B/n): each device's
    contiguous slot range holds its LPT-assigned block indices, with None
    padding filling the shortfall INSIDE the device's range (so shard_map's
    equal contiguous split sees exactly the planned chunks)."""
    B = len(costs)
    cap = -(-B // n_devices)
    loads = [0] * n_devices
    chunks: List[List[int]] = [[] for _ in range(n_devices)]
    for idx in sorted(range(B), key=lambda i: -costs[i]):
        open_devs = [d for d in range(n_devices) if len(chunks[d]) < cap]
        d = min(open_devs, key=lambda d_: loads[d_])
        chunks[d].append(idx)
        loads[d] += costs[idx]
    slots: List = []
    for d in range(n_devices):
        slots.extend(chunks[d])
        slots.extend([None] * (cap - len(chunks[d])))
    return slots


def plan_block_order(costs: Sequence[int], n_devices: int) -> List[int]:
    """Permutation of range(len(costs)) such that splitting the permuted
    list into n_devices equal contiguous chunks balances total cost.

    LPT greedy with fixed capacity ceil(B/n) per device; returns the
    concatenated per-device assignments (device-major order matching
    shard_map's contiguous batch split)."""
    B = len(costs)
    cap = -(-B // n_devices)
    loads = [0] * n_devices
    counts = [0] * n_devices
    chunks: List[List[int]] = [[] for _ in range(n_devices)]
    for idx in sorted(range(B), key=lambda i: -costs[i]):
        open_devs = [d for d in range(n_devices) if counts[d] < cap]
        d = min(open_devs, key=lambda d_: loads[d_])
        chunks[d].append(idx)
        loads[d] += costs[idx]
        counts[d] += 1
    order: List[int] = []
    for d in range(n_devices):
        order.extend(chunks[d])
    return order
