"""Test harness: force an 8-virtual-device CPU platform before JAX initializes.

The container's sitecustomize registers and pins the single-chip axon TPU backend at
interpreter start, so the platform cannot be switched in-process; we re-exec pytest once with
the corrected environment (JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=8). This
gives every test an 8-device mesh to exercise the sharded contrastive/training paths without
hardware — the multi-device test strategy called for by SURVEY.md §4.
"""

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def pytest_configure(config):
    if os.environ.get("_MMTPU_TEST_ENV") == "1":
        return
    os.environ["_MMTPU_TEST_ENV"] = "1"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""  # skip the axon PJRT registration
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    # persistent compile cache: the suite's cost is dominated by re-jitting the same
    # sharded train steps across sessions; XLA:CPU AOT results load in milliseconds on
    # later runs (fresh machines pay full compile once — correctness is unaffected)
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/jax_test_cache"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    sys.stderr.write("[conftest] re-exec pytest under CPU x8 virtual-device env\n")
    sys.stderr.flush()
    os.execv(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:])
