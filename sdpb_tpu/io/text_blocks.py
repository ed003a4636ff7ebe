"""Text matrix blocks: the reference's `write_distmatrix`/`read_text_block`
format (/root/reference/src/write_distmatrix.hxx,
/root/reference/src/sdp_solve/read_text_block.hxx):

    <height> <width>
    <element row0 col0>
    <element row0 col1>
    ...

one decimal number per line, row-major, full working precision.  Used for
x_<i>.txt / y.txt solution vectors, X_matrix_<i>.txt / Y_matrix_<i>.txt PSD
blocks, and text checkpoints — so solutions written by the reference solver
load here and vice versa.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ..utils.strings import limbs_to_str, strs_to_limbs


def write_text_matrix(path, limbs: np.ndarray, ndigits=None) -> None:
    """limbs: [K, h, w] host array -> text file."""
    K, h, w = limbs.shape
    lines = [f"{h} {w}"]
    for r in range(h):
        for c in range(w):
            lines.append(limbs_to_str(limbs[:, r, c], ndigits=ndigits))
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text("\n".join(lines) + "\n")


def read_text_matrix(path, K: int, np_dtype=np.float64,
                     expect_shape=None) -> np.ndarray:
    """Text file -> [K, h, w] limbs.  Validates dims like read_text_block."""
    tokens = Path(path).read_text().split()
    if len(tokens) < 2:
        raise RuntimeError(f"Corrupted header in file: {path}")
    h, w = int(tokens[0]), int(tokens[1])
    if expect_shape is not None and (h, w) != tuple(expect_shape):
        raise RuntimeError(
            f"Incompatible checkpoint file: '{path}'. Expected dimensions "
            f"{tuple(expect_shape)}, but found ({h},{w})")
    vals = tokens[2:]
    if len(vals) != h * w:
        raise RuntimeError(f"Corrupted data in file: {path}")
    limbs = strs_to_limbs(vals, K, np_dtype)
    return limbs.reshape(K, h, w)
