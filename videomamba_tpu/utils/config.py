"""File-based config system — capability twin of /root/reference/utils/config.py.

Features (same surface): ``.py``/``.yaml``/``.json`` config files loaded with
collision-proof module names, ``_base_`` inheritance with duplicate-key
rejection across bases, dotted-key CLI overrides, and leaf-string evaluation
(``'0.2'`` -> float, ``'[1, 2]'`` -> list, ``'${a.b}'`` reference
interpolation, ``'eval(...)'`` expressions).

Security note the reference carries as a TODO (config.py:290-305 uses bare
``eval``): here ``eval(...)`` strings and ``${...}`` interpolations are
evaluated with an EMPTY builtins namespace plus a small arithmetic whitelist
— config files can compute, not execute.
"""

from __future__ import annotations

import argparse
import ast
import importlib.util
import json
import os.path as osp
import re
import sys
from copy import deepcopy

import yaml

from videomamba_tpu.utils.easydict import EasyDict

__all__ = ["Config", "eval_dict_leaf", "eval_string", "merge_a_into_b"]

BASE_KEY = "_base_"
BASE_CONFIG = {}

cfg = None

_SAFE_EVAL_NAMES = {
    "abs": abs, "min": min, "max": max, "len": len, "range": range,
    "sum": sum, "round": round, "int": int, "float": float, "str": str,
    "list": list, "tuple": tuple, "dict": dict, "bool": bool,
    "sorted": sorted, "enumerate": enumerate, "zip": zip,
}


def _safe_eval(expr: str, extra=None):
    """Evaluate an expression with no builtins and a small whitelist."""
    namespace = dict(_SAFE_EVAL_NAMES)
    if extra:
        namespace.update(extra)
    return eval(expr, {"__builtins__": {}}, namespace)  # noqa: S307 - sandboxed


class Config(object):
    """Config loader/merger (same classmethod surface as the reference)."""

    @classmethod
    def pretty_text(cls, cfg: dict, indent=2) -> str:
        msg = "{\n"
        for i, (k, v) in enumerate(cfg.items()):
            if isinstance(v, dict):
                v = cls.pretty_text(v, indent + 4)
            spaces = " " * indent
            msg += spaces + "{}: {}".format(k, v)
            msg += " }" if i == len(cfg) - 1 else "\n"
        return msg

    @classmethod
    def dump(cls, cfg, savepath=None):
        if savepath is None:
            savepath = osp.join(cfg.WORKSPACE, "config.json")
        with open(savepath, "w") as f:
            json.dump(cfg, f, indent=2)

    @classmethod
    def get_config(cls, default_config: dict | None = None):
        """Parse argv: positional config file + 'key value' override pairs."""
        global cfg
        if cfg is not None:
            return cfg

        parser = argparse.ArgumentParser()
        parser.add_argument(
            "config_file",
            help="the configuration file to load. support: .yaml, .json, .py",
        )
        parser.add_argument(
            "opts",
            default=None,
            nargs="*",
            help="overrided configs. List. Format: 'key1 name1 key2 name2'",
        )
        args = parser.parse_args()

        cfg = EasyDict(BASE_CONFIG if default_config is None else default_config)
        if osp.isfile(args.config_file):
            cfg_from_file = cls.from_file(args.config_file)
            cfg = merge_a_into_b(cfg_from_file, cfg)
        cfg = cls.merge_list(cfg, args.opts)
        cfg = eval_dict_leaf(cfg)

        for k in BASE_CONFIG:
            cfg[k] = cfg.pop(k)
        return cfg

    @classmethod
    def from_file(cls, filepath: str) -> EasyDict:
        """Load one config file; supports `_base_` inheritance."""
        filepath = osp.abspath(osp.expanduser(filepath))
        if not osp.isfile(filepath):
            raise IOError(f"File does not exist: {filepath}")
        if filepath.endswith(".py"):
            cfg_dir = osp.dirname(filepath)
            # Collision-proof module name (reference regression: two configs
            # named cfg.py in different dirs must not share a module cache
            # entry; config.py:120-136).
            module_name = (
                f"_videomamba_config_"
                f"{abs(hash(filepath))}_{abs(hash((filepath, id(cls))))}"
            )
            spec = importlib.util.spec_from_file_location(module_name, filepath)
            if spec is None or spec.loader is None:
                raise ImportError(f"Cannot import config file: {filepath}")
            mod = importlib.util.module_from_spec(spec)
            sys.path.insert(0, cfg_dir)
            sys.modules[module_name] = mod
            try:
                spec.loader.exec_module(mod)
            finally:
                sys.modules.pop(module_name, None)
                if sys.path and sys.path[0] == cfg_dir:
                    sys.path.pop(0)
            cfg_dict = {
                name: value
                for name, value in mod.__dict__.items()
                if not name.startswith("__")
            }
        elif filepath.endswith((".yml", ".yaml")):
            with open(filepath, "r") as f:
                cfg_dict = yaml.safe_load(f)
        elif filepath.endswith(".json"):
            with open(filepath, "r") as f:
                cfg_dict = json.load(f)
        else:
            raise IOError("Only py/yml/yaml/json type are supported now!")

        if BASE_KEY in cfg_dict:
            cfg_dir = osp.dirname(filepath)
            base_filename = cfg_dict.pop(BASE_KEY)
            base_filename = (
                base_filename if isinstance(base_filename, list) else [base_filename]
            )
            base_cfg_dict = dict()
            for f in base_filename:
                _cfg_dict = Config.from_file(osp.join(cfg_dir, f))
                if len(base_cfg_dict.keys() & _cfg_dict.keys()) > 0:
                    raise KeyError("Duplicate key is not allowed among bases")
                base_cfg_dict.update(_cfg_dict)
            cfg_dict = merge_a_into_b(cfg_dict, base_cfg_dict)

        return EasyDict(cfg_dict)

    @classmethod
    def merge_list(cls, cfg, opts: list):
        """Merge dotted-key CLI overrides: ['a.b', v, ...] => cfg.a.b = v."""
        assert len(opts) % 2 == 0, f"length of opts must be even. Got: {opts}"
        for i in range(0, len(opts), 2):
            full_k, v = opts[i], opts[i + 1]
            keys = full_k.split(".")
            sub_d = cfg
            for j, k in enumerate(keys):
                if not hasattr(sub_d, k):
                    raise ValueError(
                        f"The key {k} not exist in the config. Full key:{full_k}"
                    )
                if j != len(keys) - 1:
                    sub_d = sub_d[k]
                else:
                    sub_d[k] = v
        return cfg


def merge_a_into_b(a, b, inplace=False):
    """Recursively merge dict a into dict b (a wins)."""
    if not inplace:
        b = deepcopy(b)
    for key in a:
        if key in b and isinstance(a[key], dict) and isinstance(b[key], dict):
            b[key] = merge_a_into_b(a[key], b[key], inplace=True)
        else:
            b[key] = a[key]
    return b


def eval_dict_leaf(d, orig_dict=None):
    """Evaluate every string leaf of a nested dict (in place)."""
    if orig_dict is None:
        orig_dict = d
    for k, v in d.items():
        if not isinstance(v, dict):
            d[k] = eval_string(v, orig_dict)
        else:
            eval_dict_leaf(v, orig_dict)
    return d


def eval_string(string, d):
    """Coerce a string leaf to its value.

    '0' -> 0; '0.2' -> 0.2; '[0, 1]' -> list; 'eval(1+2)' -> 3 (sandboxed);
    '${a.b}' -> d.a.b (then sandbox-evaluated); non-strings pass through.
    """
    if not isinstance(string, str):
        return string
    if string[0:5] == "eval(":
        return _safe_eval(string[5:-1], extra={"d": d})

    s0 = string
    s1 = re.sub(r"\${(.*)}", r"d.\1", s0)
    if s1 != s0:
        while s1 != s0:
            s0 = s1
            s1 = re.sub(r"\${(.*)}", r"d.\1", s0)
        return _safe_eval(s1, extra={"d": d})

    try:
        return ast.literal_eval(string)
    except (SyntaxError, ValueError):
        return string
