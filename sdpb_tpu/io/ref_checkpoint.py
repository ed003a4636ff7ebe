"""Reader for the reference's rank-local BINARY checkpoint format.

The reference's binary checkpoints (`ck/checkpoint_<gen>_<rank>`) are raw
streams of the rank's local blocks of x, X, y, Y, in that order — each
block as [int64 local_height, int64 local_width, h*w El::BigFloat
serialized images in column-major order]
(/root/reference/src/sdp_solve/SDP_Solver/save_checkpoint.cxx:11-35, read
back by load_checkpoint/load_binary_checkpoint.cxx:33-67).  The file
carries NO precision header ("TODO" in the reference); precision comes
from the run's --precision, echoed into the checkpoint metadata options.

This reader supports the single-rank layout (one `checkpoint_<gen>_0`
file): on one rank every El::DistMatrix is trivially the full matrix, so
local blocks are exactly the global blocks in block-index order, X/Y with
two parity blocks per SDP block.  Multi-rank dumps interleave
rank-group-local blocks under the reference's WFF allocation and are
refused with a pointer to the portable text-solution path — matching the
reference's own advice that binary checkpoints are layout-bound
(docs/Usage.md:148-157).
"""
from __future__ import annotations

import json
import re
from pathlib import Path

import mpmath
import numpy as np

from .sdpb_bin import _Reader, _read_bigfloat


def _mpf_to_f64_limbs(vals, shape, K64: int) -> np.ndarray:
    """Exact peel of mpmath values into a classic f64 limb stack
    [K64, *shape]."""
    flat = np.zeros((K64, len(vals)), dtype=np.float64)
    with mpmath.workprec(53 * K64 + 64):
        for i, v in enumerate(vals):
            rem = v
            for k in range(K64):
                hi = np.float64(float(rem))
                flat[k, i] = hi
                rem = rem - mpmath.mpf(float(hi))
    return flat.reshape((K64,) + tuple(shape))


def _read_block(r: _Reader, prec: int):
    h = r.i(8)
    w = r.i(8)
    if h < 0 or w < 0 or h * w > 1 << 28:
        raise ValueError(f"implausible checkpoint block dims {h}x{w}")
    vals = [_read_bigfloat(r, prec) for _ in range(h * w)]
    # column-major stream -> row-major matrix of mpf
    out = [[vals[row + col * h] for col in range(w)] for row in range(h)]
    return h, w, out


def checkpoint_precision(checkpoint_dir) -> int:
    """Precision recorded in the reference's checkpoint metadata
    (checkpoint.json / checkpoint_new.json options)."""
    for name in ("checkpoint.json", "checkpoint_new.json"):
        p = Path(checkpoint_dir) / name
        if not p.exists():
            continue
        try:
            meta = json.loads(p.read_text())
        except ValueError:
            continue
        opts = meta.get("options", {})
        if "precision" in opts:
            return int(opts["precision"])
    raise ValueError(
        f"{checkpoint_dir}: no precision in checkpoint metadata; pass "
        "--precision explicitly")


def load_reference_binary_checkpoint(checkpoint_dir, sdp, precision: int,
                                     verbosity: int = 1, print_fn=print):
    """Resume from a reference binary checkpoint directory -> SolverState.

    `sdp` supplies the block structure (the dims validation the reference
    performs at load_binary_checkpoint.cxx:33-45); `precision` is the
    writing run's --precision in bits."""
    ck = Path(checkpoint_dir)
    ranks = {}
    gen = None
    meta = ck / "checkpoint.json"
    if meta.exists():
        try:
            gen = json.loads(meta.read_text()).get("current")
        except ValueError:
            gen = None
    for f in ck.iterdir():
        m = re.fullmatch(r"checkpoint_(\d+)_(\d+)", f.name)
        if not m:
            continue
        g, rank = int(m.group(1)), int(m.group(2))
        if gen is not None and g != int(gen):
            continue
        ranks.setdefault(g, set()).add(rank)
    if not ranks:
        raise FileNotFoundError(
            f"{ck}: no reference binary checkpoint files "
            "(checkpoint_<gen>_<rank>)")
    g = int(gen) if gen is not None else max(ranks)
    if ranks[g] != {0}:
        raise ValueError(
            f"{ck}: multi-rank reference checkpoint (ranks {sorted(ranks[g])})"
            " — rank-local layouts are not portable; re-run the reference "
            "with --writeSolution=x,y,X,Y and resume from the text solution "
            "(the reference's own portable path, docs/Usage.md:148-157)")
    path = ck / f"checkpoint_{g}_0"
    if verbosity >= 1:
        print_fn(f"Loading reference binary checkpoint from : {path}")

    data = path.read_bytes()
    r = _Reader(data)
    K64 = -(-precision // 53) + 1

    # global block structure in block-index order
    blocks_meta = []      # (index, schur_size_real, n_even, n_odd)
    for bk in sdp.buckets:
        sh = bk.shape
        for rs in bk.real_sizes:
            if rs.block_index < 0:
                continue
            blocks_meta.append((rs.block_index,
                                sh.n_pairs * rs.num_points,
                                sh.dim * rs.h_even, sh.dim * rs.h_odd))
    blocks_meta.sort()

    out = {idx: {} for idx, *_ in blocks_meta}
    with mpmath.workprec(precision + 64):
        # x blocks
        for idx, P_real, _, _ in blocks_meta:
            h, w, vals = _read_block(r, precision)
            if (h, w) != (P_real, 1):
                raise ValueError(
                    f"block {idx} x: expected {P_real}x1, found {h}x{w}")
            out[idx]["x"] = _mpf_to_f64_limbs(
                [vals[i][0] for i in range(h)], (P_real,), K64)
        # X (two parity blocks per SDP block)
        for idx, _, ne, no in blocks_meta:
            for name, n in (("X_even", ne), ("X_odd", no)):
                h, w, vals = _read_block(r, precision)
                if (h, w) != (n, n):
                    raise ValueError(f"block {idx} {name}: expected "
                                     f"{n}x{n}, found {h}x{w}")
                out[idx][name] = _mpf_to_f64_limbs(
                    [vals[i][j] for i in range(n) for j in range(n)],
                    (n, n), K64)
        # y (single group: one [N, 1] block)
        h, w, vals = _read_block(r, precision)
        if (h, w) != (sdp.dual_dim, 1):
            raise ValueError(
                f"y: expected {sdp.dual_dim}x1, found {h}x{w}")
        y_limbs = _mpf_to_f64_limbs([vals[i][0] for i in range(h)],
                                    (sdp.dual_dim,), K64)
        # Y
        for idx, _, ne, no in blocks_meta:
            for name, n in (("Y_even", ne), ("Y_odd", no)):
                h, w, vals = _read_block(r, precision)
                if (h, w) != (n, n):
                    raise ValueError(f"block {idx} {name}: expected "
                                     f"{n}x{n}, found {h}x{w}")
                out[idx][name] = _mpf_to_f64_limbs(
                    [vals[i][j] for i in range(n) for j in range(n)],
                    (n, n), K64)
    if r.off != len(data):
        raise ValueError(
            f"{path}: {len(data) - r.off} trailing bytes — layout mismatch "
            "(multi-group run?)")

    from ..solver.checkpoint import _state_from_block_arrays

    return _state_from_block_arrays(sdp, y_limbs, out)
