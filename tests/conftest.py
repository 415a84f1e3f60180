"""Test harness: run everything on a virtual 8-device CPU mesh so that
pjit/shard_map collectives are exercised without TPU hardware (the
TPU-idiomatic fake backend — see SURVEY.md §4).

NOTE: the runtime image presets JAX_PLATFORMS=axon (the remote TPU tunnel);
env vars alone don't reliably win, so we also force the platform through
jax.config before any device is touched. Without this, every eager op in the
test suite round-trips the tunnel (~0.3s/op).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: the persistent compilation cache (utils/compilation_cache.py) is
# NOT enabled here — measured no win on CPU (suite time is tracing +
# Python, not backend compile; cached artifacts totalled 208 KB).

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def demo_conf_path():
    return os.path.join(os.path.dirname(__file__), "..", "conf", "demo_recall.yaml")
