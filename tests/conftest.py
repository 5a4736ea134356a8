"""Test configuration: force an 8-device virtual CPU mesh before first use.

This is the standard JAX trick for testing multi-chip sharding without
hardware (SURVEY.md §4): all tests run on CPU with 8 fake devices so
`shard_map`/`pjit` paths execute real collectives.

Note: the container's sitecustomize registers the remote `axon` TPU platform
and pins `jax_platforms`; tests must override it *via jax.config* (the env var
alone is ignored) before any backend is initialized.
"""

import os
import sys

# SQRTLM_TEST_TPU=1 keeps the real accelerator visible so the @pytest.mark.tpu
# tests (compiled Pallas kernel paths) can run on-chip:
#   SQRTLM_TEST_TPU=1 pytest tests -m tpu
_USE_TPU = os.environ.get("SQRTLM_TEST_TPU", "") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not _USE_TPU and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compilation cache for the suite: CPU compiles of the big
# frame-build / BA graphs dominate suite wall time (>80% of a cold run), and
# they are identical run to run. First (cold) run pays full compile cost;
# every later run is minutes faster. Disable with SQRTLM_TEST_NOCACHE=1.
if os.environ.get("SQRTLM_TEST_NOCACHE", "") != "1":
    from sqrtlm_slam_tpu.utils.cache import enable_persistent_cache  # noqa: E402

    enable_persistent_cache(
        os.environ.get(
            "SQRTLM_TEST_CACHE",
            os.path.expanduser("~/.cache/sqrtlm_jax_tests"),
        )
    )
