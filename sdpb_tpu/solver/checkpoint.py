"""Checkpoint save/load for solver state.

The reference writes rank-local binary dumps that require identical
precision/ranks/distribution to restart (save_checkpoint.cxx:11-35,
docs/Usage.md:148-157) — a known wart.  Here checkpoints are
device-layout-INDEPENDENT: per-block host limb arrays keyed by global block
index in one .npz, so a run can resume on a different mesh shape or bucket
padding.  Kept from the reference: generation + backup rotation and atomic
metadata rename (save_checkpoint.cxx:55-65,103-119), and the ability to
start from a reference text solution (load_text_checkpoint.cxx:6-44) via
--writeSolution=x,y,X,Y outputs.
"""
from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional

import numpy as np

from ..models.sdp import DeviceSDP
from ..io.solution import host_blocks
from .state import SolverState


METADATA = "checkpoint.json"


def save_checkpoint(checkpoint_dir, sdp: DeviceSDP, state: SolverState,
                    options: Optional[dict] = None, verbosity: int = 1,
                    print_fn=print) -> int:
    """Write checkpoint_<gen>.npz + atomically-renamed metadata; rotates the
    previous generation into 'backup_generation'.  Returns the generation."""
    ck = Path(checkpoint_dir)
    ck.mkdir(parents=True, exist_ok=True)

    meta_path = ck / METADATA
    generation = 0
    backup = None
    if meta_path.exists():
        old = json.loads(meta_path.read_text())
        generation = int(old.get("current", -1)) + 1
        backup = old.get("current")

    if verbosity >= 1:
        print_fn(f"Saving checkpoint to    : {ck}")

    from ..ops import mpfloat as _mp

    arrays = {"y": _mp.host_f64_limbs(state.y)}
    for idx, data in host_blocks(sdp, state).items():
        for name, arr in data.items():
            arrays[f"{name}_{idx}"] = arr

    # transient-filesystem defense: up to 10 write attempts with backoff,
    # as the reference does (save_checkpoint.cxx:67-101)
    max_retries = 10
    for attempt in range(max_retries):
        try:
            np.savez(ck / f"checkpoint_{generation}.npz", **arrays)
            meta = {"current": generation, "version": 1,
                    "options": options or {}}
            if backup is not None:
                meta["backup"] = backup
            tmp = ck / (METADATA + ".tmp")
            tmp.write_text(json.dumps(meta, indent=1))
            os.replace(tmp, meta_path)
            break
        except OSError as e:
            if attempt == max_retries - 1:
                raise
            if verbosity >= 1:
                print_fn(f"Error writing checkpoint ({e}); retrying "
                         f"({attempt + 1}/{max_retries})")
            import time as _time

            _time.sleep(min(2.0 ** attempt * 0.1, 10.0))

    # prune generations older than the backup
    keep = {generation, backup}
    for f in ck.glob("checkpoint_*.npz"):
        try:
            gen = int(f.stem.split("_")[1])
        except (IndexError, ValueError):
            continue
        if gen not in keep:
            f.unlink()
    return generation


def _state_from_block_arrays(sdp: DeviceSDP, y_limbs, block_arrays) -> SolverState:
    """Assemble a SolverState from {block_index: {x, X_even, ...}} host
    float64-limb arrays, re-bucketing to the DeviceSDP's current layout
    (padding entries get X = Y = I as in initial_state).

    Checkpoints store classic f64 limbs at the precision of the run that
    wrote them; loading converts to the current device representation
    (classic or scaled) and precision — checkpoints are therefore portable
    across devices, mesh shapes AND --precision settings (unlike the
    reference's rank-local binary dumps)."""
    import jax.numpy as jnp

    from ..ops import mpfloat as _mp
    from ..ops.mpfloat import MP
    from .state import BucketState

    K = sdp.b.K
    dtype = sdp.b.dtype
    scaled = sdp.b.scaled
    npdt = np.float32 if dtype == jnp.float32 else np.float64
    y_limbs = np.asarray(y_limbs, dtype=np.float64)
    Kst = y_limbs.shape[0]   # stored limb count (f64)

    from ..io.solution import psd_real_indices

    def stage(out64: np.ndarray) -> MP:
        if scaled and K > 9:
            from ..ops.mpwide import f64_limbs_to_wide_parts, wide_parts_to_mp

            return wide_parts_to_mp(f64_limbs_to_wide_parts(out64, K))
        if scaled:
            limbs, exp = _mp.f64_limbs_to_scaled_parts(out64, K)
            return MP(jnp.asarray(limbs), jnp.asarray(exp))
        return MP(jnp.asarray(_mp.f64_limbs_to_classic(out64, K, npdt),
                              dtype=dtype))

    buckets = []
    for bk in sdp.buckets:
        sh = bk.shape
        B = bk.batch

        def gather_x():
            out = np.zeros((Kst, B, sh.schur_size), dtype=np.float64)
            o4 = out.reshape(Kst, B, sh.n_pairs, sh.num_points)
            for i, rs in enumerate(bk.real_sizes):
                if rs.block_index < 0:
                    continue
                arr = np.asarray(block_arrays[rs.block_index]["x"], np.float64)
                P_real = sh.n_pairs * rs.num_points
                if arr.shape != (Kst, P_real):
                    raise RuntimeError(
                        f"Incompatible checkpoint block {rs.block_index} x: "
                        f"expected {(Kst, P_real)}, found {arr.shape}")
                o4[:, i, :, :rs.num_points] = arr.reshape(Kst, sh.n_pairs, rs.num_points)
            return stage(out)

        def gather_psd(name):
            h_pad = sh.h_even if name.endswith("even") else sh.h_odd
            n = sh.dim * h_pad
            out = np.zeros((Kst, B, n, n), dtype=np.float64)
            for i, rs in enumerate(bk.real_sizes):
                h_real = (rs.h_even if name.endswith("even") else rs.h_odd)
                if rs.block_index < 0:
                    if n > 0:
                        out[0, i] = np.eye(n)
                    continue
                arr = np.asarray(block_arrays[rs.block_index][name], np.float64)
                nr = sh.dim * h_real
                if arr.shape != (Kst, nr, nr):
                    raise RuntimeError(
                        f"Incompatible checkpoint block {rs.block_index} {name}: "
                        f"expected {(Kst, nr, nr)}, found {arr.shape}")
                if nr == n:
                    out[:, i] = arr
                else:
                    ridx = psd_real_indices(sh.dim, h_pad, h_real)
                    out[:, i][np.ix_(range(Kst), ridx, ridx)] = arr
                    # padded dims carry identity
                    pad = np.setdiff1d(np.arange(n), ridx)
                    out[0, i, pad, pad] = 1.0
            return stage(out)

        buckets.append(BucketState(
            x=gather_x(),
            X_even=gather_psd("X_even"),
            X_odd=gather_psd("X_odd"),
            Y_even=gather_psd("Y_even"),
            Y_odd=gather_psd("Y_odd"),
        ))

    return SolverState(y=stage(y_limbs), buckets=buckets)


def load_checkpoint(checkpoint_dir, sdp: DeviceSDP, verbosity: int = 1,
                    print_fn=print) -> Optional[SolverState]:
    """Load the newest viable npz checkpoint; fall back to the backup
    generation; else try a reference-format text checkpoint; else None."""
    ck = Path(checkpoint_dir)
    meta_path = ck / METADATA
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
        for gen in (meta.get("current"), meta.get("backup")):
            if gen is None:
                continue
            path = ck / f"checkpoint_{gen}.npz"
            if not path.exists():
                continue
            if verbosity >= 1:
                print_fn(f"Loading binary checkpoint from : {path}")
            data = np.load(path)
            blocks: dict = {}
            for key in data.files:
                if key == "y":
                    continue
                name, idx = key.rsplit("_", 1)
                blocks.setdefault(int(idx), {})[name] = data[key]
            return _state_from_block_arrays(sdp, data["y"], blocks)
    # reference rank-local BINARY checkpoint (drop-in migration from an
    # in-flight reference run; single-rank layout only)
    import re as _re

    if ck.is_dir() and any(
            _re.fullmatch(r"checkpoint_\d+_\d+", f.name)
            for f in ck.iterdir() if f.is_file()):
        from ..io.ref_checkpoint import (checkpoint_precision,
                                         load_reference_binary_checkpoint)

        try:
            prec = checkpoint_precision(ck)
        except ValueError:
            import jax.numpy as jnp

            p = 24 if sdp.b.dtype == jnp.float32 else 53
            prec = p * sdp.b.K
        return load_reference_binary_checkpoint(ck, sdp, prec, verbosity,
                                                print_fn)
    if (ck / "x_0.txt").exists():
        return load_text_checkpoint(ck, sdp, verbosity, print_fn)
    return None


def load_text_checkpoint(directory, sdp: DeviceSDP, verbosity: int = 1,
                         print_fn=print) -> SolverState:
    """Start from a reference-format text solution (x_<i>.txt, y.txt,
    X_matrix_<2i+p>.txt, Y_matrix_<2i+p>.txt), the portable migration path
    (load_text_checkpoint.cxx:6-44)."""
    import jax.numpy as jnp

    from ..io.text_blocks import read_text_matrix

    directory = Path(directory)
    if verbosity >= 1:
        print_fn(f"Loading text checkpoint from : {directory}")
    # read as classic f64 limbs with the full mantissa of the current
    # precision; _state_from_block_arrays converts to the device format
    p = 24 if sdp.b.dtype == jnp.float32 else 53
    K = -(-(p * sdp.b.K) // 53) + 1
    npdt = np.float64

    blocks: dict = {}
    y = None
    for bk in sdp.buckets:
        sh = bk.shape
        for rs in bk.real_sizes:
            idx = rs.block_index
            if idx < 0:
                continue
            entry = {}
            P_real = sh.n_pairs * rs.num_points
            entry["x"] = read_text_matrix(
                directory / f"x_{idx}.txt", K, npdt,
                expect_shape=(P_real, 1))[:, :, 0]
            if y is None:
                y = read_text_matrix(directory / "y.txt", K, npdt,
                                     expect_shape=(sdp.dual_dim, 1))[:, :, 0]
            for parity, name, size in ((0, "even", sh.dim * rs.h_even),
                                       (1, "odd", sh.dim * rs.h_odd)):
                for mat in ("X", "Y"):
                    key = f"{mat}_{name}"
                    if size == 0:
                        entry[key] = np.zeros((K, 0, 0), dtype=npdt)
                    else:
                        entry[key] = read_text_matrix(
                            directory / f"{mat}_matrix_{2 * idx + parity}.txt",
                            K, npdt, expect_shape=(size, size))
            blocks[idx] = entry
    return _state_from_block_arrays(sdp, y, blocks)
