"""Pallas TPU kernels: EFT exactness under Mosaic and MP matmul parity.

The test suite pins JAX to CPU (conftest), so these run in a subprocess on
the default backend and skip when no TPU is reachable."""
import os
import subprocess
import sys

import pytest

SCRIPT = r"""
import jax, jax.numpy as jnp, numpy as np, mpmath
if jax.default_backend() == "cpu":
    print("NO_TPU"); raise SystemExit(0)
from sdpb_tpu.ops import mpfloat as mp
from sdpb_tpu.ops.mpfloat import MP
from sdpb_tpu.ops import pallas_kernels as pk

K, B, M, Kd, N = 4, 3, 40, 24, 16
rng = np.random.default_rng(7)
a_np = np.zeros((K, B, M, Kd), np.float32); a_np[0] = rng.standard_normal((B, M, Kd))
b_np = np.zeros((K, B, Kd, N), np.float32); b_np[0] = rng.standard_normal((B, Kd, N))
a_np[1] = rng.standard_normal((B, M, Kd)) * 1e-9
b_np[1] = rng.standard_normal((B, Kd, N)) * 1e-9
a = MP(jnp.asarray(a_np)); b = MP(jnp.asarray(b_np))
out = pk.mp_matmul(a, b)
mpmath.mp.prec = 300
ol = np.asarray(out.limbs, np.float64)
maxrel = mpmath.mpf(0)
for bi in range(B):
    for i in range(0, M, 11):
        for j in range(0, N, 5):
            exact = mpmath.fsum(
                (mpmath.mpf(float(a_np[0,bi,i,t])) + mpmath.mpf(float(a_np[1,bi,i,t]))) *
                (mpmath.mpf(float(b_np[0,bi,t,j])) + mpmath.mpf(float(b_np[1,bi,t,j])))
                for t in range(Kd))
            v = sum(mpmath.mpf(float(ol[k, bi, i, j])) for k in range(K))
            maxrel = max(maxrel, abs(v - exact) / (abs(exact) + mpmath.mpf("1e-300")))
# K=4 float32 limbs: ~96 bits; allow a few ulps of slack
assert maxrel < mpmath.mpf(2) ** -88, maxrel
print("OK", mpmath.nstr(maxrel, 3))
"""


@pytest.mark.slow
def test_mp_matmul_pallas_on_tpu():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    result = subprocess.run([sys.executable, "-c", SCRIPT], env=env,
                            capture_output=True, text=True, timeout=600)
    out = result.stdout.strip().splitlines()
    if result.returncode == 0 and out and out[-1] == "NO_TPU":
        pytest.skip("no TPU backend available")
    assert result.returncode == 0, result.stdout + result.stderr
    assert out and out[-1].startswith("OK"), result.stdout + result.stderr
