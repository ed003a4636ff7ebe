"""Reader/writer for the SDPB input format (sdp.zip or a plain directory).

Format (documented in /root/reference/docs/SDPB_input_format.md):
  control.json      {"num_blocks": J, "command": ...}
  objectives.json   {"constant": str, "b": [str]}
  block_info_<j>.json {"dim": m_j, "num_points": n_j}
  block_data_<j>.json {"bilinear_bases_even": [[str]],
                       "bilinear_bases_odd": [[str]],
                       "c": [str], "B": [[str]]}
  block_data_<j>.bin  boost-serialization binary layout written by the
                      reference's write_block_data.cxx (parsed natively).

All numbers are decimal strings at the producer's precision; they are
parsed exactly into K-limb arrays host-side.
"""
from __future__ import annotations

import json
import os
import tarfile
import zipfile
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..utils.strings import strs_to_limbs


@dataclass
class BlockData:
    """One PMP block's data, as host limb arrays (limbs-first layout)."""

    index: int
    dim: int
    num_points: int
    bases_even: np.ndarray  # [K, h_e, num_points]
    bases_odd: np.ndarray   # [K, h_o, num_points]  (h_o may be 0)
    c: np.ndarray           # [K, P_j]
    B: np.ndarray           # [K, P_j, N]

    @property
    def schur_size(self) -> int:
        return self.num_points * self.dim * (self.dim + 1) // 2


@dataclass
class SDPData:
    """A full SDP problem: objectives plus all blocks (host-side)."""

    objective_const: np.ndarray  # [K]
    b: np.ndarray                # [K, N]
    blocks: List[BlockData] = field(default_factory=list)

    @property
    def num_blocks(self) -> int:
        return len(self.blocks)

    @property
    def dual_dim(self) -> int:
        return self.b.shape[1]


class _ArchiveSource:
    """Uniform access to files inside a zip/tar/7z archive or a directory.

    The reference reads any libarchive-supported container
    (/root/reference/src/sdp_solve/Archive_Reader.hxx:14-36); here zip and
    tar (incl. .tar.gz/.tgz/.tar.bz2/.tar.xz) come from the stdlib and 7z
    from py7zr when installed (gated: absent py7zr raises a clear error)."""

    def __init__(self, path):
        self.path = Path(path)
        self._members = None
        if self.path.is_dir():
            self.kind = "dir"
        elif zipfile.is_zipfile(self.path):
            self.kind = "zip"
            self.zf = zipfile.ZipFile(self.path)
        elif tarfile.is_tarfile(self.path):
            self.kind = "tar"
            self.tf = tarfile.open(self.path)
            self._members = {m.name.lstrip("./"): m
                             for m in self.tf.getmembers() if m.isfile()}
        else:
            try:
                import py7zr
            except ImportError:
                raise RuntimeError(
                    f"{self.path}: not a directory, zip, or tar archive "
                    "(7z needs the optional py7zr package)")
            self.kind = "7z"
            with py7zr.SevenZipFile(self.path) as z:
                self._members = {n: None for n in z.getnames()}

    def read(self, name: str) -> bytes:
        if self.kind == "dir":
            return (self.path / name).read_bytes()
        if self.kind == "zip":
            return self.zf.read(name)
        if self.kind == "tar":
            return self.tf.extractfile(self._members[name]).read()
        import py7zr

        with py7zr.SevenZipFile(self.path) as z:
            return z.read([name])[name].read()

    def exists(self, name: str) -> bool:
        if self.kind == "dir":
            return (self.path / name).exists()
        if self.kind == "zip":
            try:
                self.zf.getinfo(name)
                return True
            except KeyError:
                return False
        return name in self._members


def read_sdp(path, K: int, np_dtype=np.float64) -> SDPData:
    """Load an SDPB-format problem into K-limb host arrays."""
    src = _ArchiveSource(path)
    control = json.loads(src.read("control.json"))
    num_blocks = int(control["num_blocks"])

    obj = json.loads(src.read("objectives.json"))
    objective_const = strs_to_limbs([obj["constant"]], K, np_dtype)[:, 0]
    b = strs_to_limbs(list(obj["b"]), K, np_dtype)
    N = b.shape[1]

    blocks = []
    for j in range(num_blocks):
        info = json.loads(src.read(f"block_info_{j}.json"))
        dim, num_points = int(info["dim"]), int(info["num_points"])
        if src.exists(f"block_data_{j}.json"):
            data = json.loads(src.read(f"block_data_{j}.json"))
            blocks.append(_block_from_json(j, dim, num_points, data, N, K, np_dtype))
        elif src.exists(f"block_data_{j}.bin"):
            from .sdpb_bin import parse_block_data_bin

            blocks.append(
                parse_block_data_bin(
                    src.read(f"block_data_{j}.bin"), j, dim, num_points, N, K, np_dtype
                )
            )
        else:
            raise FileNotFoundError(f"block_data_{j}.(json|bin) not found in {path}")
    return SDPData(objective_const=objective_const, b=b, blocks=blocks)


def _block_from_json(j, dim, num_points, data, N, K, np_dtype) -> BlockData:
    def mat(rows):
        if len(rows) == 0:
            return np.zeros((K, 0, num_points), dtype=np_dtype)
        ncol = len(rows[0])
        flat = [x for row in rows for x in row]
        limbs = strs_to_limbs(flat, K, np_dtype)
        return limbs.reshape(K, len(rows), ncol)

    bases_even = mat(data["bilinear_bases_even"])
    bases_odd = mat(data["bilinear_bases_odd"])
    c = strs_to_limbs(list(data["c"]), K, np_dtype)
    Brows = data["B"]
    Bflat = [x for row in Brows for x in row]
    B = strs_to_limbs(Bflat, K, np_dtype).reshape(K, len(Brows), N)
    P_j = num_points * dim * (dim + 1) // 2
    assert c.shape[1] == P_j and B.shape[1] == P_j, (c.shape, B.shape, P_j)
    return BlockData(
        index=j, dim=dim, num_points=num_points,
        bases_even=bases_even, bases_odd=bases_odd, c=c, B=B,
    )


# ---------------------------------------------------------------------------
# Writing (sdp2input / pvm2sdp output path).  Mirrors
# /root/reference/src/sdp_convert/write_sdpb_input_files.cxx: a zip with
# "store" (no compression), control/objectives first, then per-block files.


def write_sdp(path, sdp: SDPData, command: str = "", ndigits: Optional[int] = None,
              block_format: str = "json", precision: Optional[int] = None):
    """Write an sdp.zip (or directory).  block_format 'json' or 'bin'
    (the reference's two Block_File_Formats; pvm2sdp defaults to bin,
    /root/reference/src/pvm2sdp/main.cxx:23)."""
    from ..utils.strings import limbs_to_str

    def s(limbs):
        return limbs_to_str(limbs, ndigits=ndigits)

    path = Path(path)

    entries = []
    entries.append(("control.json", json.dumps(
        {"num_blocks": sdp.num_blocks, "command": command}, indent=2)))
    entries.append(("objectives.json", json.dumps({
        "constant": s(sdp.objective_const),
        "b": [s(sdp.b[:, i]) for i in range(sdp.b.shape[1])],
    }, indent=1)))
    for blk in sdp.blocks:
        entries.append((f"block_info_{blk.index}.json", json.dumps(
            {"dim": blk.dim, "num_points": blk.num_points})))
        if block_format == "bin":
            from .sdpb_bin import write_block_data_bin

            mant = 24 if blk.c.dtype == np.float32 else 53
            prec = precision or mant * blk.c.shape[0]
            entries.append((f"block_data_{blk.index}.bin",
                            write_block_data_bin(blk, prec)))
        else:
            data = {
                "bilinear_bases_even": [[s(blk.bases_even[:, r, c]) for c in range(blk.bases_even.shape[2])]
                                        for r in range(blk.bases_even.shape[1])],
                "bilinear_bases_odd": [[s(blk.bases_odd[:, r, c]) for c in range(blk.bases_odd.shape[2])]
                                       for r in range(blk.bases_odd.shape[1])],
                "c": [s(blk.c[:, i]) for i in range(blk.c.shape[1])],
                "B": [[s(blk.B[:, r, c]) for c in range(blk.B.shape[2])]
                      for r in range(blk.B.shape[1])],
            }
            entries.append((f"block_data_{blk.index}.json", json.dumps(data)))

    if str(path).endswith(".zip"):
        with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as zf:
            for name, content in entries:
                zf.writestr(name, content)
    else:
        os.makedirs(path, exist_ok=True)
        for name, content in entries:
            if isinstance(content, bytes):
                (path / name).write_bytes(content)
            else:
                (path / name).write_text(content)
