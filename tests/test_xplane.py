"""utils/xplane.py — the device-trace parser behind PERF.md's roofline
evidence (benchmarks/profile_step.py). Real TPU planes can't exist in CI,
so these pin the shape-byte model, plane selection, and error paths on a
CPU capture; the TPU-plane path is exercised by profile_step.py on chip.
"""
import glob
import os

import jax
import jax.numpy as jnp
import pytest

from recommendflow_tpu.utils.xplane import _hlo_bytes, parse_trace


def test_hlo_bytes_shape_model():
    text = ("%fusion.15 = bf16[1505024,256]{1,0:T(8,128)(2,1)} "
            "fusion(f32[87040]{0} %a, s32[2]{0} %b, pred[] %c)")
    expect = 1505024 * 256 * 2 + 87040 * 4 + 2 * 4 + 1
    assert _hlo_bytes(text) == expect
    assert _hlo_bytes("no shapes here") == 0


def test_parse_trace_missing_dir(tmp_path):
    with pytest.raises(FileNotFoundError):
        parse_trace(str(tmp_path))


@pytest.fixture(scope="module")
def cpu_capture(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("prof"))
    f = jax.jit(lambda x: (x @ x.T).sum())
    x = jnp.ones((128, 128))
    _ = float(f(x))
    jax.profiler.start_trace(d)
    for _ in range(3):
        _ = float(f(x))
    jax.profiler.stop_trace()
    assert glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)
    return d


def test_parse_trace_cpu_capture(cpu_capture):
    rep = parse_trace(cpu_capture, plane_suffix="CPU")
    assert "CPU" in rep.plane
    assert rep.span_ms > 0
    # host planes carry no 'XLA Ops' line — per-op tables need the TPU
    # device plane (profile_step.py on chip); the parse itself must not
    # fail on a host-only capture
    assert isinstance(rep.ops, list)


def test_parse_trace_wrong_suffix(cpu_capture):
    with pytest.raises(ValueError, match="no populated"):
        parse_trace(cpu_capture, plane_suffix="NO_SUCH_PLANE")
