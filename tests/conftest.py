"""Test harness: run everything on a virtual 8-device CPU mesh so that
pjit/shard_map collectives are exercised without TPU hardware (the
TPU-idiomatic fake backend — see SURVEY.md §4)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def demo_conf_path():
    return os.path.join(os.path.dirname(__file__), "..", "conf", "demo_recall.yaml")
