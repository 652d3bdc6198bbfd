"""YAML config system with recursive ``parent:`` inheritance.

Behavior contract (reference ``utils/config_utils.py:20-33``): a config file
may name a ``parent`` YAML; the child's keys win over the parent's, chains
resolve until ``parent: None`` or a missing file.  The fully resolved mapping
is exposed as an attribute namespace (``GroupParams``).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import yaml


class GroupParams:
    """Plain attribute namespace for resolved config values."""

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        items = ", ".join(f"{k}={v!r}" for k, v in sorted(vars(self).items()))
        return f"GroupParams({items})"


def merge_dicts(parent: Dict[str, Any], child: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively merge ``child`` over ``parent`` (child wins)."""
    out = dict(parent)
    for key, value in child.items():
        if key in out and isinstance(out[key], dict) and isinstance(value, dict):
            out[key] = merge_dicts(out[key], value)
        else:
            out[key] = value
    return out


def read_config_dict(config_path: str) -> Dict[str, Any]:
    with open(config_path, "r") as f:
        config = yaml.safe_load(f) or {}
    # Walk the parent chain; nearest (child) definitions take precedence.
    while (
        config.get("parent") not in (None, "None")
        and os.path.exists(config["parent"])
    ):
        with open(config["parent"], "r") as f:
            parent = yaml.safe_load(f) or {}
        grandparent = parent.get("parent", "None")
        merged = merge_dicts(parent, config)
        merged["parent"] = grandparent
        config = merged
    return config


def read_config(config_path: str) -> GroupParams:
    """Resolve a YAML config (with parents) into an attribute namespace."""
    config = read_config_dict(config_path)
    group = GroupParams()
    for key, value in config.items():
        setattr(group, key.lstrip("_"), value)
    return group


def save_config(args: GroupParams, save_path: str, name: str = "config.yaml") -> None:
    """Archive the resolved config in the run directory."""
    os.makedirs(save_path, exist_ok=True)
    with open(os.path.join(save_path, name), "w") as f:
        yaml.safe_dump({k: v for k, v in vars(args).items()}, f, sort_keys=True)
