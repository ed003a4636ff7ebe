"""Mathematica PMP input (.m) — hand-written expression parser over
SDPProgram[...]/PositiveMatrixWithPrefactor[...] syntax
(/root/reference/src/sdp_read/read_input/read_mathematica/).

Implemented incrementally; read_pmp_mathematica covers the subset the
reference's parse_SDP handles.
"""
from __future__ import annotations


def read_pmp_mathematica(path):
    raise NotImplementedError(
        "Mathematica PMP input not implemented yet; convert to JSON "
        "(docs/sdp2input_schema.json) or use the XML PVM path.")
