import os

import pytest

# Tests run on CPU with a virtual 8-device mesh (multi-chip sharding tests);
# bench.py and real runs use the actual TPU chip. An EXPLICIT
# JAX_PLATFORMS=tpu in the environment opts into the hardware-TPU tests
# (tests/test_pallas_tpu.py) instead.
_want_tpu = os.environ.get("JAX_PLATFORMS", "") == "tpu"
if not _want_tpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon sitecustomize (TPU tunnel) force-sets jax_platforms="axon,cpu" at
# interpreter start, overriding the env var — undo it before any backend
# initializes, or "CPU" tests silently run on the shared TPU chip with a
# single device and every mesh test skips. (In TPU opt-in mode the chip is
# reached through that axon platform, so leave the forced default alone.)
import jax  # noqa: E402

if not _want_tpu:
    jax.config.update("jax_platforms", "cpu")
else:
    del os.environ["JAX_PLATFORMS"]

# Test runtime is dominated by XLA compiles of the render/phase programs;
# the persistent cache makes every suite run after the first fast.
from splatam_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def pytest_collection_modifyitems(config, items):
    """Fast profile by default: @pytest.mark.slow tests (multi-minute
    end-to-end SLAM runs) are skipped unless RUN_SLOW=1 or an explicit
    -m expression selects them."""
    if os.environ.get("RUN_SLOW") == "1" or config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow (set RUN_SLOW=1 or -m slow to run)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
