"""Unit tests for tools/ingest_release.py plumbing (the full pipeline is
exercised by the drill — tests/test_release_ingest.py + the slow drill
run; these cover the file-resolution and video-listing helpers the real
ingest depends on)."""
import os
import sys
from os import path as osp

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools"))

from ingest_release import _find_net_file, _list_videos  # noqa: E402


def test_find_net_file_prefers_latest(tmp_path):
    for name in ("net_g_5000.pth", "net_g_latest.pth", "net_g_20000.pth"):
        (tmp_path / name).write_bytes(b"x")
    assert _find_net_file(str(tmp_path), "g").endswith("net_g_latest.pth")


def test_find_net_file_highest_iter(tmp_path):
    for name in ("net_g_5000.pth", "net_g_20000.pth", "net_g_100.pth"):
        (tmp_path / name).write_bytes(b"x")
    assert _find_net_file(str(tmp_path), "g").endswith("net_g_20000.pth")


def test_find_net_file_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="net_g"):
        _find_net_file(str(tmp_path), "g")
    # other stems don't match
    (tmp_path / "net_d_latest.pth").write_bytes(b"x")
    with pytest.raises(FileNotFoundError):
        _find_net_file(str(tmp_path), "motion_estimator")


def test_list_videos_mixed(tmp_path):
    (tmp_path / "clip_b.mp4").write_bytes(b"x")
    (tmp_path / "frames_a").mkdir()
    (tmp_path / "notes.txt").write_bytes(b"x")
    (tmp_path / "clip_c.AVI").write_bytes(b"x")
    vids = [osp.basename(v) for v in _list_videos(str(tmp_path))]
    assert vids == ["clip_b.mp4", "clip_c.AVI", "frames_a"] or \
        sorted(vids) == sorted(["clip_b.mp4", "clip_c.AVI", "frames_a"])
    assert "notes.txt" not in vids
