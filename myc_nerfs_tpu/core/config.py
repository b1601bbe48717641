"""Config system: python-module configs, YAML inheritance, dot overrides.

Re-implements, with parity of behavior, all three reference config systems
(SURVEY.md §5.6):

- jnerf: a ``.py`` module's globals become the config dict, with ``_base_``
  file inheritance and ``_cover_`` subtree replacement
  (jnerf-myc/python/jnerf/utils/config.py:33-101)
- barf: YAML with ``_parent_`` chains, dot-path CLI overrides ``--a.b.c=v``,
  bare ``--flag`` -> True and ``--flag!`` -> False
  (barf-myc/options.py:16-104)
- a global config singleton (init_cfg/get_cfg, config.py:144-163)

Unlike the reference, the Config object is a plain nested dict wrapper with
attribute access — no live object handles are stashed in it (the reference's
cfg.model_obj pattern, runner.py:26-64, is replaced by explicit wiring).
"""
from __future__ import annotations

import ast
import copy
import importlib.util
import os
from typing import Any, Dict, List, Optional

import yaml


class Config(dict):
    """Nested dict with attribute access (edict-style)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def wrap(d: Any) -> Any:
        if isinstance(d, dict):
            return Config({k: Config.wrap(v) for k, v in d.items()})
        if isinstance(d, list):
            return [Config.wrap(v) for v in d]
        return d


def _module_globals(path: str) -> Dict[str, Any]:
    spec = importlib.util.spec_from_file_location("_cfg_module", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return {k: v for k, v in vars(mod).items()
            if not k.startswith("__") and not callable(v)
            and not isinstance(v, type(importlib))}


def _merge(base: Dict, child: Dict) -> Dict:
    """Recursive merge; a child subtree with ``_cover_: True`` replaces the
    base subtree outright (config.py:59-101)."""
    out = copy.deepcopy(base)
    for k, v in child.items():
        if isinstance(v, dict) and v.pop("_cover_", False):
            out[k] = copy.deepcopy(v)
        elif isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def load_py_config(path: str) -> Config:
    """Python-module config with ``_base_`` inheritance (config.py:33-101)."""
    cfg = _module_globals(path)
    base = cfg.pop("_base_", None)
    if base:
        bases = base if isinstance(base, (list, tuple)) else [base]
        merged: Dict[str, Any] = {}
        for b in bases:
            bpath = os.path.join(os.path.dirname(path), b)
            merged = _merge(merged, dict(load_py_config(bpath)))
        cfg = _merge(merged, cfg)
    return Config.wrap(cfg)


def load_yaml_config(path: str) -> Config:
    """YAML config with ``_parent_`` chains (options.py:54-67)."""
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    parent = cfg.pop("_parent_", None)
    if parent:
        # resolve: absolute > sibling of this file > basename next to this
        # file > cwd-relative (the reference runs from the repo root)
        candidates = [parent,
                      os.path.join(os.path.dirname(path), parent),
                      os.path.join(os.path.dirname(path),
                                   os.path.basename(parent))]
        ppath = next((c for c in candidates if os.path.exists(c)), parent)
        base = dict(load_yaml_config(ppath))
        cfg = _merge(base, cfg)
    return Config.wrap(cfg)


def load_config(path: str) -> Config:
    if path.endswith(".py"):
        return load_py_config(path)
    return load_yaml_config(path)


def parse_value(s: str) -> Any:
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s


def apply_overrides(cfg: Config, args: List[str], strict: bool = True) -> Config:
    """Dot-path overrides: --a.b.c=v, --flag (True), --flag! (False).

    Ref: parse_arguments + override_options (options.py:16-39, 69-85). With
    ``strict`` a new key raises (replacing the reference's interactive
    safe-check prompt, options.py:76-83 — non-interactive environments).
    """
    cfg = Config.wrap(copy.deepcopy(dict(cfg)))
    for arg in args:
        if not arg.startswith("--"):
            raise ValueError(f"override must start with --: {arg}")
        body = arg[2:]
        if "=" in body:
            key, val = body.split("=", 1)
            value = parse_value(val)
        elif body.endswith("!"):
            key, value = body[:-1], False
        else:
            key, value = body, True
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], dict):
                if strict and p not in node:
                    raise KeyError(f"unknown config path: {key}")
                node[p] = Config()
            node = node[p]
        if strict and parts[-1] not in node:
            raise KeyError(f"unknown config key: {key}")
        node[parts[-1]] = value
    return cfg


_global_cfg: Optional[Config] = None


def init_cfg(cfg_or_path) -> Config:
    """Set the global config singleton (config.py:144-155)."""
    global _global_cfg
    _global_cfg = (load_config(cfg_or_path) if isinstance(cfg_or_path, str)
                   else Config.wrap(cfg_or_path))
    return _global_cfg


def get_cfg() -> Optional[Config]:
    """Fetch the global config (config.py:157-163)."""
    return _global_cfg
