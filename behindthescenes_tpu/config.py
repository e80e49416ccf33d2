"""Config system: YAML files with Hydra-style `defaults` composition.

Mirrors the reference's usage (train.py:12-15, configs/exp_kitti_raw.yaml:1-4)
without the Hydra dependency: a config may list `defaults: [default,
{data: kitti_raw}, _self_]`; entries compose in order with deep merging, and
`_self_` positions the file's own keys. All consumers use plain-dict
`conf.get(key, default)` access, like the reference's OmegaConf usage.
"""
from __future__ import annotations

import copy
import os
from typing import Any, Optional

import yaml


def deep_merge(base: dict, override: dict) -> dict:
    """Recursively merge `override` into `base` (override wins)."""
    out = copy.deepcopy(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _resolve_entry(entry, config_dir: str) -> dict:
    """Resolve one `defaults` list entry to a composed dict."""
    if isinstance(entry, dict):
        # e.g. {data: kitti_raw} -> configs/data/kitti_raw.yaml under key.
        (group, name), = entry.items()
        sub = load_config(os.path.join(config_dir, group, f"{name}.yaml"))
        return {group: sub} if group not in ("", None) else sub
    if entry == "_self_":
        return {}
    return load_config(os.path.join(config_dir, f"{entry}.yaml"))


def load_config(path: str, overrides: Optional[dict] = None) -> dict:
    """Load and compose a YAML config file."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    config_dir = os.path.dirname(os.path.abspath(path))

    defaults = raw.pop("defaults", None)
    if defaults is None:
        composed = raw
    else:
        composed: dict = {}
        self_merged = False
        for entry in defaults:
            if entry == "_self_":
                composed = deep_merge(composed, raw)
                self_merged = True
            else:
                composed = deep_merge(composed, _resolve_entry(entry,
                                                               config_dir))
        if not self_merged:
            composed = deep_merge(composed, raw)
    if overrides:
        composed = deep_merge(composed, overrides)
    return composed


def parse_cli_overrides(args) -> dict:
    """Parse `key.subkey=value` CLI override strings into a nested dict."""
    out: dict = {}
    for arg in args:
        if "=" not in arg:
            raise ValueError(f"Override must be key=value, got: {arg}")
        key, value = arg.split("=", 1)
        try:
            value = yaml.safe_load(value)
        except yaml.YAMLError:
            pass
        if isinstance(value, str):
            # pyyaml's YAML-1.1 float resolver rejects dotless scientific
            # notation ("2e-5" stays a string, silently breaking numeric
            # overrides like lr=2e-5). Hydra/OmegaConf accept it; so do we.
            try:
                value = int(value, 0)
            except ValueError:
                try:
                    value = float(value)
                except ValueError:
                    pass
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def find_config(name: str, search_dirs=("configs",)) -> str:
    """Locate a config by name (`-cn` style)."""
    for d in search_dirs:
        path = os.path.join(d, f"{name}.yaml")
        if os.path.exists(path):
            return path
    raise FileNotFoundError(f"Config {name!r} not found in {search_dirs}")
