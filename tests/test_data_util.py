"""Tests for data/data_util.py vs the reference's documented behavior
(basicsr/data/data_util.py:37-88 index examples, DUF protocol, masks)."""
import os

import numpy as np
import pytest

from synergize_motion_appearance_tpu.data.data_util import (
    brush_stroke_mask,
    duf_downsample,
    generate_frame_indices,
    generate_gaussian_kernel,
    paired_paths_from_folder,
    paired_paths_from_meta_info_file,
    paths_from_folder,
    random_ff_mask,
    read_img_seq,
)


def test_frame_indices_reference_examples():
    # the exact examples documented at data_util.py:48-52
    assert generate_frame_indices(0, 100, 5, "replicate") == [0, 0, 0, 1, 2]
    assert generate_frame_indices(0, 100, 5, "reflection") == [2, 1, 0, 1, 2]
    assert generate_frame_indices(0, 100, 5, "reflection_circle") == \
        [4, 3, 0, 1, 2]
    assert generate_frame_indices(0, 100, 5, "circle") == [3, 4, 0, 1, 2]
    # right border
    assert generate_frame_indices(99, 100, 5, "replicate") == \
        [97, 98, 99, 99, 99]
    assert generate_frame_indices(99, 100, 5, "reflection") == \
        [97, 98, 99, 98, 97]
    with pytest.raises(ValueError):
        generate_frame_indices(0, 10, 5, "bogus")
    with pytest.raises(AssertionError):
        generate_frame_indices(0, 10, 4)


def test_paired_paths(tmp_path):
    cv2 = pytest.importorskip("cv2")
    a, b = tmp_path / "lq", tmp_path / "gt"
    a.mkdir(), b.mkdir()
    img = np.zeros((4, 4, 3), np.uint8)
    for n in ("x.png", "y.png"):
        cv2.imwrite(str(a / n), img)
        cv2.imwrite(str(b / n), img)
    pairs = paired_paths_from_folder([str(a), str(b)], ["lq", "gt"], "{}")
    assert len(pairs) == 2
    assert {"lq_path", "gt_path"} == set(pairs[0])

    meta = tmp_path / "meta.txt"
    meta.write_text("x.png (4,4,3)\ny.png (4,4,3)\n")
    pairs2 = paired_paths_from_meta_info_file(
        [str(a), str(b)], ["lq", "gt"], str(meta), "{}")
    assert [os.path.basename(p["gt_path"]) for p in pairs2] == \
        ["x.png", "y.png"]

    assert len(paths_from_folder(str(a))) == 2

    seq = read_img_seq(str(a))
    assert seq.shape == (2, 4, 4, 3) and seq.dtype == np.float32


def test_duf_downsample_protocol():
    rng = np.random.RandomState(0)
    x = rng.rand(3, 32, 32, 2).astype(np.float32)
    out = np.asarray(duf_downsample(x, scale=4))
    assert out.shape == (3, 8, 8, 2)
    # smoothing: downsampled values stay within the input range
    assert out.min() >= x.min() - 1e-5 and out.max() <= x.max() + 1e-5
    k = generate_gaussian_kernel(13, 1.6)
    assert abs(k.sum() - 1.0) < 1e-6 and k.shape == (13, 13)
    with pytest.raises(ValueError):
        duf_downsample(x, scale=5)


def test_masks():
    np.random.seed(0)
    m = random_ff_mask((256, 256))
    assert m.shape == (256, 256) and m.dtype == np.float32
    assert 0.0 < m.mean() < 1.0  # strokes drawn, not full coverage
    assert set(np.unique(m)) <= {0.0, 1.0}

    PIL = pytest.importorskip("PIL")
    from PIL import Image

    img = Image.new("RGB", (64, 64), 0)
    out = brush_stroke_mask(img)
    arr = np.asarray(out)
    assert arr.shape == (64, 64, 3)
    assert arr.max() == 255  # strokes present
