"""YAML config system with flattened sections + CLI ``key value`` overrides.

Mirrors ``util/config.py``: two-level YAML files whose sections (DATA/TRAIN/
Distributed/TEST) are flattened into one attribute namespace (:60-73), plus
positional ``key value`` CLI override pairs with literal-eval type coercion
and type checking against the existing value (:76-159).
"""

from __future__ import annotations

import ast
import copy
from typing import Any, Dict, List

import yaml


class CfgNode(dict):
    """Dict with attribute access (reference ``CfgNode`` :10-57)."""

    def __init__(self, init_dict=None):
        init_dict = init_dict or {}
        super().__init__(init_dict)

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def get(self, key, default=None):
        return dict.get(self, key, default)

    def clone(self):
        return CfgNode(copy.deepcopy(dict(self)))


def load_cfg(path: str) -> CfgNode:
    with open(path) as f:
        raw = yaml.safe_load(f)
    cfg: Dict[str, Any] = {}
    for key, value in raw.items():
        if isinstance(value, dict):
            cfg.update(value)
        else:
            cfg[key] = value
    return CfgNode(cfg)


def _decode(value: str):
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def merge_cfg_from_list(cfg: CfgNode, opts: List[str]) -> CfgNode:
    """Apply positional ``key value`` override pairs."""
    assert len(opts) % 2 == 0, opts
    out = cfg.clone()
    for key, raw in zip(opts[0::2], opts[1::2]):
        value = _decode(raw)
        if key in out and out[key] is not None:
            old = out[key]
            if not isinstance(value, type(old)):
                if isinstance(old, float) and isinstance(value, int):
                    value = float(value)
                elif isinstance(old, tuple) and isinstance(value, list):
                    value = tuple(value)
                elif isinstance(old, str):
                    value = str(value)
                else:
                    raise ValueError(
                        f"type mismatch for {key}: {type(old)} vs"
                        f" {type(value)}")
        out[key] = value
    return out
