"""Driver-contract pin for bench.py: the LAST stdout line must be one
JSON object with the agreed fields, whatever refinement phases run.
Round-2 lost its BENCH to a tunnel outage and round-4 published a
cold-window number — the contract (insurance line early, improved lines
after, best re-emitted last) is what the driver consumes, so it gets a
subprocess test."""
from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_last_stdout_line_is_the_metric():
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "BENCH_BUDGET_S": "120",
        # keep the subprocess quick: insurance + records-content isolated
        # segments only
        "BENCH_SKIP_SUSTAINED": "1",
        "BENCH_SKIP_BATCH_SWEEP": "1",
    })
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-3000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert lines, "bench printed nothing to stdout"
    rec = json.loads(lines[-1])
    assert rec["metric"] == "train_examples_per_sec_per_chip"
    assert rec["unit"] == "examples/s/chip"
    assert rec["value"] > 0
    assert rec["vs_baseline"] > 0
    # every stdout line is a JSON record of the same metric (the driver
    # may read any of them if the process dies mid-run)
    for ln in lines:
        r = json.loads(ln)
        assert r["metric"] == "train_examples_per_sec_per_chip"
    # the final line re-emits the BEST value seen
    assert rec["value"] == max(json.loads(ln)["value"] for ln in lines)
