"""docs/CONFIG.md freshness: every documented `Networks` key must actually
be consumed by the code, and every key the code consumes must be
documented. Makes VERDICT r4 #7's done-condition ("keys grep-match the
parsers") a mechanical invariant instead of a one-time check."""
from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "recommendflow_tpu")


def _doc_networks_keys():
    doc = open(os.path.join(REPO, "docs", "CONFIG.md")).read()
    sect = doc.split("## `Networks`")[1].split("## `Task`")[0]
    keys = set()
    for row in sect.splitlines():
        if not row.startswith("|"):
            continue
        first_cell = row.split("|")[1]
        keys |= set(re.findall(r"`([a-z_0-9]+)`", first_cell))
    return keys


def _code_networks_keys():
    keys = set()
    pat = re.compile(
        r"""(?:network_conf|networks\.get)\(\s*["']([a-z_0-9]+)["']""")
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                keys |= set(pat.findall(open(os.path.join(root, f)).read()))
    # keys read through other access paths (conf.networks["..."] lookups)
    keys |= {"class", "loss"}
    return keys


def test_documented_cli_flags_exist():
    """Every `--flag` in CONFIG.md's Trainer-knobs table must be a real
    cli/train.py argument (finetune/predict share the core set)."""
    doc = open(os.path.join(REPO, "docs", "CONFIG.md")).read()
    sect = doc.split("## Trainer knobs")[1].split("## Legacy JSON")[0]
    doc_flags = set(re.findall(r"`--([a-z_0-9]+)`", sect))
    train_src = open(os.path.join(PKG, "cli", "train.py")).read()
    code_flags = set(re.findall(r"""add_argument\(\s*["']--([a-z_0-9]+)""",
                                train_src))
    missing = doc_flags - code_flags
    assert not missing, (
        f"docs/CONFIG.md documents train-CLI flags that do not exist: "
        f"{sorted(missing)}")


def test_documented_networks_keys_match_consumers():
    doc = _doc_networks_keys()
    code = _code_networks_keys()
    undocumented = code - doc
    assert not undocumented, (
        f"Networks keys consumed by code but missing from docs/CONFIG.md: "
        f"{sorted(undocumented)}")
    phantom = doc - code
    assert not phantom, (
        f"docs/CONFIG.md documents Networks keys no code consumes: "
        f"{sorted(phantom)}")
