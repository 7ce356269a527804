"""Regression: orbax rejects relative paths ("Checkpoint path should be
absolute") — the round-3 soak's resume leg died on exactly this when
`latest_checkpoint` returned a path derived from a relative
`save_path`. Both the restore layer and the options parser must
normalize (reference counterpart: base_model.py:283-296 resume, which
torch.load handles relative; our orbax layer must absolutize)."""
import os
from os import path as osp

import flax.struct
import jax.numpy as jnp
import pytest
import yaml


@flax.struct.dataclass
class _TinyState:
    step: jnp.ndarray
    params: dict


def test_restore_checkpoint_accepts_relative_path(tmp_path, monkeypatch):
    from synergize_motion_appearance_tpu.training.checkpoint import (
        latest_checkpoint, restore_checkpoint, save_checkpoint)

    state = _TinyState(step=jnp.asarray(7),
                       params={"w": jnp.arange(4.0)})
    ckpt_dir = tmp_path / "training_states"
    save_checkpoint(str(ckpt_dir), state, epoch=3)

    # resolve `latest` through a RELATIVE dir, restore through it
    monkeypatch.chdir(tmp_path)
    rel = latest_checkpoint("training_states")
    assert rel == osp.join("training_states", "iter_7")
    restored, epoch = restore_checkpoint(rel, state)
    assert epoch == 3 and int(restored.step) == 7
    assert jnp.allclose(restored.params["w"], state.params["w"])


def test_options_absolutize_resume_state(tmp_path, monkeypatch):
    from synergize_motion_appearance_tpu.utils.options import parse

    root = osp.dirname(osp.dirname(osp.abspath(__file__)))
    with open(osp.join(root, "options", "tiny_train.yml")) as f:
        opt = yaml.safe_load(f)
    opt["path"] = {"resume_state":
                   "train_log/exp1/training_states/iter_400"}
    p = tmp_path / "opt.yml"
    with open(p, "w") as f:
        yaml.safe_dump(opt, f)

    monkeypatch.chdir(tmp_path)
    parsed = parse(str(p), is_train=True)
    rs = parsed["path"]["resume_state"]
    assert osp.isabs(rs), rs
    # experiment dir is re-derived from the (now absolute) resume path
    assert parsed["path"]["experiments_root"] == osp.dirname(
        osp.dirname(rs))
    assert parsed["name"] == "exp1"
