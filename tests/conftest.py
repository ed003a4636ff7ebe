import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding logic
# is exercised without TPU hardware (the driver separately dry-runs the
# multichip path on real/virtual devices).
#
# Two platform quirks handled here (see sdpb_tpu/utils/platform.py):
#   * the container's sitecustomize imports jax and pins JAX_PLATFORMS=axon
#     (TPU tunnel); backend init is lazy, so jax.config still wins;
#   * XLA:CPU's fusion emitters apply FP contraction which breaks the
#     error-free transformations the MP arithmetic is built on — the flag
#     below disables them (TPU needs no flag; verified exact).
from sdpb_tpu.utils import platform as _platform

_platform.configure_cpu()
xf = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xf:
    os.environ["XLA_FLAGS"] = (xf + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the jitted iteration takes minutes to build
# at higher limb counts; identical test configs reuse compiled artifacts
# across runs
_cache = os.environ.get("SDPB_TPU_CACHE",
                        os.path.expanduser("~/.cache/sdpb_tpu/xla"))
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    if config.getoption("-m", default=""):
        return
    skip_slow = _pytest.mark.skip(reason="slow test; run with -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
