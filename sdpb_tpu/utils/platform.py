"""Platform/backend configuration and floating-point-semantics self-checks.

The MP expansion arithmetic (sdpb_tpu.ops.mpfloat) requires STRICT IEEE
round-to-nearest base arithmetic with no FP contraction.  Empirical status
of the backends we target:

  * XLA:TPU (v5e) — exact; no contraction observed in fused kernels.
  * XLA:CPU — the (default-on) fusion emitters contract mul+add into fma,
    even across lax.optimization_barrier, which corrupts TwoProd error
    terms.  `--xla_cpu_use_fusion_emitters=false` restores strict
    semantics.  configure_cpu() must run before the first backend use.
  * float64 on TPU is a ~47-bit non-IEEE emulation — never use float64
    limbs on TPU (the solver picks float32 limbs there automatically).

`verify_eft()` is a cheap runtime self-check run by the CLI drivers: it
JITs a composite kernel and asserts error-free transformation exactness on
the actual backend, so a silently-unsafe toolchain upgrade fails loudly
instead of corrupting a solve.
"""
from __future__ import annotations

import os


_CPU_SAFETY_FLAG = "--xla_cpu_use_fusion_emitters=false"


def configure_cpu(force_cpu_platform: bool = False) -> None:
    """Arrange strict-FP XLA:CPU codegen.  Must be called before the first
    JAX backend initialization (safe to call any time before that; raises
    if the backend is already initialized without the flag)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if _CPU_SAFETY_FLAG not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + _CPU_SAFETY_FLAG).strip()
    if force_cpu_platform:
        import jax

        jax.config.update("jax_platforms", "cpu")


def default_base_dtype():
    """float64 limbs on CPU backends, float32 limbs on TPU."""
    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    return jnp.float64 if platform == "cpu" else jnp.float32


def limbs_for_precision(precision_bits: int, dtype) -> int:
    """Number of limbs needed for `precision_bits` of significand.

    Mirrors the role of --precision in the reference
    (/root/reference/src/sdp_solve/Solver_Parameters/Solver_Parameters.cxx:18),
    where GMP rounds the requested bits up to a limb multiple.
    """
    import jax.numpy as jnp

    p = 24 if jnp.dtype(dtype) == jnp.dtype(jnp.float32) else 53
    return max(2, -(-(precision_bits + 8) // p))


def verify_eft(dtype=None) -> None:
    """Assert error-free transformations survive JIT on the active backend."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fractions import Fraction as F

    from ..ops.eft import two_sum, two_prod

    if dtype is None:
        dtype = default_base_dtype()

    @jax.jit
    def kernel(a, b):
        s, e = two_sum(a, b)
        p, pe = two_prod(a, b)
        # feed the results through adds, as renorm does, to provoke fusion
        chk1, chk2 = two_sum(p, s)
        return s, e, p, pe, chk1, chk2

    rng = np.random.default_rng(0)
    span = 12 if jnp.dtype(dtype) == jnp.dtype(jnp.float32) else 30
    a_np = (rng.standard_normal(512) * np.exp(rng.uniform(-span, span, 512)))
    b_np = (rng.standard_normal(512) * np.exp(rng.uniform(-span, span, 512)))
    a = jnp.asarray(a_np, dtype=dtype)
    b = jnp.asarray(b_np, dtype=dtype)
    s, e, p, pe, chk1, chk2 = [np.asarray(x, dtype=np.float64) for x in kernel(a, b)]
    a64 = np.asarray(a, dtype=np.float64)
    b64 = np.asarray(b, dtype=np.float64)
    for i in range(512):
        if F(s[i]) + F(e[i]) != F(a64[i]) + F(b64[i]):
            raise RuntimeError(
                "two_sum is not error-free under JIT on this backend; "
                "on CPU set XLA_FLAGS=--xla_cpu_use_fusion_emitters=false "
                "(sdpb_tpu.utils.platform.configure_cpu) before jax init."
            )
        if F(p[i]) + F(pe[i]) != F(a64[i]) * F(b64[i]):
            raise RuntimeError(
                "two_prod is not error-free under JIT on this backend; "
                "on CPU set XLA_FLAGS=--xla_cpu_use_fusion_emitters=false "
                "(sdpb_tpu.utils.platform.configure_cpu) before jax init."
            )
        if F(chk1[i]) + F(chk2[i]) != F(p[i]) + F(s[i]):
            raise RuntimeError(
                "TwoSum of product limbs is contracted by this backend; "
                "on CPU set XLA_FLAGS=--xla_cpu_use_fusion_emitters=false."
            )
