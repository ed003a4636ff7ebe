"""Converter scale proof (scaled-down): a synthetic bootstrap-class PMP
through sdp2input, checking output integrity and --procs determinism
(the reference round-robins blocks across ranks for exactly this
workload, /root/reference/src/sdp2input/write_output/write_output.cxx:44-45).

The full-scale measurement (>=1e5 entries) is recorded in README.md
("Converter throughput"); this test runs the identical pipeline at 1/50
scale so it stays in the fast suite.
"""
import json
import zipfile

import numpy as np

from sdpb_tpu.cli.sdp2input import main as sdp2input_main
from sdpb_tpu.tools.gen_pmp import entry_count, generate_pmp


def _gen(tmp_path, name, **kw):
    args = dict(num_blocks=4, dim=2, dual_dim=5, degree=8, num_poles=4,
                seed=3)
    args.update(kw)
    data = generate_pmp(**args)
    path = tmp_path / name
    path.write_text(json.dumps(data))
    return path, args


def test_gen_pmp_entry_count(tmp_path):
    path, a = _gen(tmp_path, "pmp.json")
    data = json.loads(path.read_text())
    mats = data["PositiveMatrixWithPrefactorArray"]
    assert len(mats) == a["num_blocks"]
    n = sum(len(c) for m in mats for row in m["polynomials"]
            for pv in row for c in pv)
    assert n == entry_count(a["num_blocks"], a["dim"], a["dual_dim"],
                            a["degree"])


def test_sdp2input_on_generated_pmp(tmp_path):
    path, a = _gen(tmp_path, "pmp.json")
    out = tmp_path / "sdp.zip"
    rc = sdp2input_main(["-i", str(path), "-o", str(out),
                         "--precision", "212"])
    assert rc == 0

    from sdpb_tpu.io.sdp_zip import read_sdp
    host = read_sdp(str(out), 4, np.float64)
    assert len(host.blocks) == a["num_blocks"]
    for b in host.blocks:
        # degree-8 polynomials sample at degree+1 = 9 points
        assert b.num_points == a["degree"] + 1
        assert np.all(np.isfinite(b.B))
        assert np.all(np.isfinite(b.c))
    # dual dimension reduced by the normalization constraint (limb-major b)
    assert host.b.shape[-1] == a["dual_dim"]


def test_sdp2input_procs_deterministic(tmp_path):
    """--procs 2 must produce byte-identical block data to --procs 1."""
    path, _ = _gen(tmp_path, "pmp.json", num_blocks=3, degree=6)
    out1 = tmp_path / "sdp1.zip"
    out2 = tmp_path / "sdp2.zip"
    assert sdp2input_main(["-i", str(path), "-o", str(out1),
                           "--precision", "212", "--procs", "1"]) == 0
    assert sdp2input_main(["-i", str(path), "-o", str(out2),
                           "--precision", "212", "--procs", "2"]) == 0
    with zipfile.ZipFile(out1) as z1, zipfile.ZipFile(out2) as z2:
        names1 = sorted(z1.namelist())
        assert names1 == sorted(z2.namelist())
        for name in names1:
            assert z1.read(name) == z2.read(name), name
