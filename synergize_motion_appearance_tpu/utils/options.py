"""YAML config system (parity target: utils/options.py:7-109).

Ordered YAML load, experiment-dir derivation, resume-name reuse, and a
pretty-printer. Configs stay plain dicts so they round-trip to/from the
reference's YAML files unchanged.
"""
from __future__ import annotations

import os
import time
from collections import OrderedDict
from os import path as osp
from typing import Any, Dict, Optional, Tuple

import yaml


def ordered_yaml() -> Tuple[Any, Any]:
    """Ordered yaml Loader/Dumper (options.py:7-29)."""
    try:
        from yaml import CDumper as Dumper
        from yaml import CLoader as Loader
    except ImportError:
        from yaml import Dumper, Loader

    _mapping_tag = yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG

    def dict_representer(dumper, data):
        return dumper.represent_dict(data.items())

    def dict_constructor(loader, node):
        return OrderedDict(loader.construct_pairs(node))

    Dumper.add_representer(OrderedDict, dict_representer)
    Loader.add_constructor(_mapping_tag, dict_constructor)
    return Loader, Dumper


def load_yaml(path: str) -> Dict[str, Any]:
    Loader, _ = ordered_yaml()
    with open(path, "r") as f:
        return yaml.load(f, Loader=Loader)


def parse(opt_path: str, is_train: bool = True,
          root_path: Optional[str] = None) -> Dict[str, Any]:
    """Parse a training/test YAML and derive experiment dirs
    (options.py:32-88)."""
    opt = load_yaml(opt_path)
    opt["is_train"] = is_train

    # datasets: tag phases
    for phase, dataset in (opt.get("datasets") or {}).items():
        phase_name = phase.split("_")[0]
        dataset["phase"] = phase_name
        if "scale" in opt:
            dataset["scale"] = opt["scale"]

    # paths
    path_opt = opt.setdefault("path", {})
    save_root = path_opt.get("save_path", "./experiments")
    if path_opt.get("resume_state"):
        # reuse the experiment dir of the resumed run (options.py:49-53);
        # absolute because the orbax restore layer requires absolute paths
        path_opt["resume_state"] = osp.abspath(path_opt["resume_state"])
        experiments_root = osp.dirname(osp.dirname(path_opt["resume_state"]))
        opt["name"] = osp.basename(experiments_root)
    else:
        if is_train and not opt.get("name", "").startswith("debug"):
            opt["name"] = f"{opt.get('name', 'exp')}"
        experiments_root = osp.join(save_root, opt.get("name", "exp"))

    if is_train:
        path_opt["experiments_root"] = experiments_root
        path_opt["models"] = osp.join(experiments_root, "models")
        path_opt["training_states"] = osp.join(experiments_root,
                                               "training_states")
        path_opt["log"] = experiments_root
        path_opt["visualization"] = osp.join(experiments_root,
                                             "visualization")
    else:
        results_root = osp.join(save_root, "results", opt.get("name", "exp"))
        path_opt["results_root"] = results_root
        path_opt["log"] = results_root
        path_opt["visualization"] = osp.join(results_root, "visualization")
    return opt


def dict2str(opt: Dict[str, Any], indent_level: int = 1) -> str:
    """Pretty-print a config dict (options.py:91-109)."""
    msg = "\n"
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent_level * 2) + k + ":["
            msg += dict2str(v, indent_level + 1)
            msg += " " * (indent_level * 2) + "]\n"
        else:
            msg += " " * (indent_level * 2) + k + ": " + str(v) + "\n"
    return msg


def make_exp_dirs(opt: Dict[str, Any]):
    """Create the experiment tree (utils/misc.py:61-75)."""
    path_opt = dict(opt["path"])
    if opt.get("is_train"):
        for key in ("experiments_root", "models", "training_states",
                    "visualization"):
            if path_opt.get(key):
                os.makedirs(path_opt[key], exist_ok=True)
    else:
        for key in ("results_root", "visualization"):
            if path_opt.get(key):
                os.makedirs(path_opt[key], exist_ok=True)
