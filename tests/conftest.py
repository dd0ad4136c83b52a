"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax import.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count), per SURVEY.md §4(c). Set
ISTVT_TEST_TPU=1 to run the suite on real accelerators instead.
"""
import os
import sys

if not os.environ.get("ISTVT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
        # 8 virtual device threads oversubscribe this host's single core:
        # heavy shard_map bodies (e.g. the pipeline-parallel scan) arrive
        # at collectives minutes apart, and XLA-CPU's rendezvous would
        # abort the whole process after its default 40 s.
        flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
                  " --xla_cpu_collective_call_terminate_timeout_seconds=1800")
    os.environ["XLA_FLAGS"] = flags
    # A sitecustomize may have force-registered an accelerator plugin via
    # jax.config.update("jax_platforms", ...), which overrides the env var —
    # override it back so tests run on the 8-device virtual CPU mesh.
    import jax

    jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE = "/root/reference"

import pytest  # noqa: E402


def has_reference() -> bool:
    return os.path.isdir(REFERENCE)


@pytest.fixture(scope="session")
def reference_path():
    if not has_reference():
        pytest.skip("reference repo not mounted")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    return REFERENCE
