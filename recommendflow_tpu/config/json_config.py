"""Legacy JSON config loader.

Parity with config_parser/config_utils.py:52-107: JSON configs where a key
prefixed with '#' marks the entry for deletion (commented-out config), plus
slot-map and BERT-vocab loaders re-exported from their canonical homes.
"""
from __future__ import annotations

import json
from typing import Any, Dict

from recommendflow_tpu.config.features import load_slot_map  # noqa: F401
from recommendflow_tpu.encoder.tokenizer import load_vocab  # noqa: F401
from recommendflow_tpu.utils.tables import print_kv


def _strip_deleted(tree: Any) -> Any:
    """Drop keys starting with '#' recursively ('#lr': ... is disabled)."""
    if isinstance(tree, dict):
        return {k: _strip_deleted(v) for k, v in tree.items()
                if not str(k).startswith("#")}
    if isinstance(tree, list):
        return [_strip_deleted(v) for v in tree]
    return tree


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        conf = json.load(f)
    return _strip_deleted(conf)


def print_conf(conf: Dict[str, Any], title: str = "Config"):
    flat = {}

    def walk(prefix, tree):
        for k, v in tree.items():
            key = f"{prefix}.{k}" if prefix else str(k)
            if isinstance(v, dict):
                walk(key, v)
            else:
                flat[key] = v
    walk("", conf)
    print_kv(flat, title=title)
