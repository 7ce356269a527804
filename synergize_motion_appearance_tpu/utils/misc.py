"""Misc utilities (parity target: utils/misc.py:35-146)."""
from __future__ import annotations

import os
import random
import time
from os import path as osp
from typing import Generator, Optional


def set_random_seed(seed: int):
    """Seed host-side RNGs (misc.py:35-41). Device randomness in JAX is
    explicit via PRNG keys, so this only covers numpy/python."""
    import numpy as np

    random.seed(seed)
    np.random.seed(seed)


def get_time_str() -> str:
    return time.strftime("%Y%m%d_%H%M%S", time.localtime())


def mkdir_and_rename(path: str):
    """mkdir; archive an existing dir with a timestamp (misc.py:48-58)."""
    if osp.exists(path):
        new_name = path + "_archived_" + get_time_str()
        print(f"Path already exists. Rename it to {new_name}", flush=True)
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


def scandir(dir_path: str, suffix: Optional[str] = None,
            recursive: bool = False, full_path: bool = False
            ) -> Generator[str, None, None]:
    """Scan a directory for files (misc.py:79-118)."""
    if (suffix is not None) and not isinstance(suffix, (str, tuple)):
        raise TypeError('"suffix" must be a string or tuple of strings')
    root = dir_path

    def _scandir(dir_path, suffix, recursive):
        for entry in os.scandir(dir_path):
            if not entry.name.startswith(".") and entry.is_file():
                if full_path:
                    return_path = entry.path
                else:
                    return_path = osp.relpath(entry.path, root)
                if suffix is None or return_path.endswith(suffix):
                    yield return_path
            elif recursive and entry.is_dir():
                yield from _scandir(entry.path, suffix, recursive)

    return _scandir(dir_path, suffix, recursive)


def check_resume(opt: dict, resume_iter: int):
    """Rewrite pretrain paths to the resumed iteration's checkpoints
    (misc.py:121-146)."""
    if not opt["path"].get("resume_state"):
        return
    networks = [k for k in opt.keys() if k.startswith("network_")]
    for network in networks:
        name = network.replace("network_", "")
        basename = f"net_{name}"
        opt["path"][f"pretrain_{network}"] = osp.join(
            opt["path"]["models"], f"{basename}_{resume_iter}"
        )
    print(f"Set pretrain paths to resume iter {resume_iter}")


def sizeof_fmt(size: float, suffix: str = "B") -> str:
    for unit in ["", "K", "M", "G", "T", "P", "E", "Z"]:
        if abs(size) < 1024.0:
            return f"{size:3.1f} {unit}{suffix}"
        size /= 1024.0
    return f"{size:3.1f} Y{suffix}"
