"""Checkpoint / resume with the reference's triple-network layout.

Parity target: base_model.py:170-296 — per-network weight files
(net_g with {'params','params_ema'}, net_d, net_motion_estimator) plus a
training state {epoch, iter, optimizers, schedulers}. Here one orbax
checkpoint per iteration holds the full TrainState pytree; `latest` is a
symlink-style pointer file. Resume restores params, EMA, optimizer states
and batch-norm running stats exactly.
"""
from __future__ import annotations

import os
from os import path as osp
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from .trainer import TrainState


def _ckptr():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, state: TrainState,
                    epoch: int = 0) -> str:
    """Rank-0-only save (master_only parity, dist_util.py:74-82)."""
    if jax.process_index() != 0:
        return ""
    step = int(state.step)
    path = osp.join(osp.abspath(ckpt_dir), f"iter_{step}")
    state = jax.device_get(state)
    _ckptr().save(path, {"state": state, "epoch": epoch}, force=True)
    with open(osp.join(osp.abspath(ckpt_dir), "latest"), "w") as f:
        f.write(f"iter_{step}\n")
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    marker = osp.join(ckpt_dir, "latest")
    if not osp.exists(marker):
        return None
    with open(marker) as f:
        name = f.read().strip()
    path = osp.join(ckpt_dir, name)
    return path if osp.exists(path) else None


def restore_checkpoint(path: str, target_state: TrainState
                       ) -> Tuple[TrainState, int]:
    """Restore into the structure of `target_state` (shape-checked like
    the reference's strict load, base_model.py:202-234)."""
    restored = _ckptr().restore(
        osp.abspath(path),  # orbax rejects relative paths
        item={"state": jax.device_get(target_state), "epoch": 0},
    )
    return restored["state"], int(restored["epoch"])


def export_params(path: str, params: Any, param_key: str = "params"):
    """Save a single network's params (inference-only distribution file,
    like net_g_{iter}.pth with a param key)."""
    _ckptr().save(osp.abspath(path), {param_key: jax.device_get(params)},
                  force=True)


def load_variables(path: str, param_key: str = "params") -> dict:
    """Full variables dict ({'params'[, 'batch_stats']}) from either an
    orbax export (export_params) or a converted-reference .npz
    (tools/convert_reference_checkpoint.py output, '/'-joined flat keys)
    — so reference-released .pth checkpoints are drop-in after one
    converter run (reference load path: base_model.py:236-263)."""
    if path.endswith(".npz"):
        import numpy as np

        data = np.load(osp.abspath(path))
        restored: dict = {}
        for key in data.files:
            parts = key.split("/")
            node = restored
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = data[key]
    else:
        restored = _ckptr().restore(osp.abspath(path))
    out = {}
    if param_key in restored:
        out["params"] = restored[param_key]
    elif "params" in restored:  # params_ema -> params fallback (:247-252)
        out["params"] = restored["params"]
    else:
        out["params"] = restored
    # BN running stats ride along when present (motion estimator / D)
    if isinstance(restored, dict) and "batch_stats" in restored:
        out["batch_stats"] = restored["batch_stats"]
    return out


def load_params(path: str, param_key: str = "params"):
    return load_variables(path, param_key)["params"]
