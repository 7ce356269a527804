"""Data pipeline: dataset semantics, sampler sharding, loader batching,
PSNR/SSIM/L1 metric sanity."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from synergize_motion_appearance_tpu.data import (
    BatchLoader, EnlargedSampler, build_dataset,
)
from synergize_motion_appearance_tpu.metrics import calculate_metric


@pytest.fixture()
def synth_root(tmp_path):
    rng = np.random.RandomState(0)
    for split in ("train", "test"):
        for v in range(3):
            d = tmp_path / split / f"id{v}#clip0"
            d.mkdir(parents=True)
            for f in range(4):
                img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
                cv2.imwrite(str(d / f"{f:04d}.png"), img)
    return tmp_path


def test_frames_dataset(synth_root):
    ds = build_dataset(dict(
        type="FramesMotionTransferDataset", root_dir=str(synth_root),
        id_sampling=True, is_train=True, gt_size=32,
        mean=[0.5] * 3, std=[0.5] * 3, use_hflip=True, use_time_flip=True,
        io_backend=dict(type="disk"),
    ))
    assert len(ds) == 3  # 3 unique ids
    item = ds[0]
    assert item["source"].shape == (32, 32, 3)
    assert item["driving"].shape == (32, 32, 3)
    assert -1.0 <= item["source"].min() and item["source"].max() <= 1.0


def test_enlarged_sampler_sharding():
    # 2 replicas must partition the (enlarged) index space disjointly
    s0 = EnlargedSampler(10, num_replicas=2, rank=0, ratio=3)
    s1 = EnlargedSampler(10, num_replicas=2, rank=1, ratio=3)
    s0.set_epoch(5)
    s1.set_epoch(5)
    i0, i1 = list(s0), list(s1)
    assert len(i0) == len(i1) == 15
    assert all(0 <= i < 10 for i in i0 + i1)
    # epoch determinism
    s0.set_epoch(5)
    assert list(s0) == i0
    s0.set_epoch(6)
    assert list(s0) != i0


def test_batch_loader(synth_root):
    ds = build_dataset(dict(
        type="FramesMotionTransferDataset", root_dir=str(synth_root),
        id_sampling=False, is_train=True, gt_size=32,
        io_backend=dict(type="disk"),
    ))
    sampler = EnlargedSampler(len(ds), 1, 0, ratio=4)
    loader = BatchLoader(ds, batch_size=2, sampler=sampler, num_workers=2)
    batches = list(loader.epoch_iter(0))
    assert len(batches) == len(loader)
    for b in batches:
        assert b["source"].shape == (2, 32, 32, 3)
        assert b["driving"].shape == (2, 32, 32, 3)


def test_metrics_protocol():
    rng = np.random.RandomState(1)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    assert calculate_metric(
        dict(img1=img, img2=img), dict(type="calculate_psnr", crop_border=0)
    ) == float("inf")
    noisy = np.clip(img.astype(int) + rng.randint(-10, 10, img.shape),
                    0, 255).astype(np.uint8)
    psnr = calculate_metric(dict(img1=img, img2=noisy),
                            dict(type="calculate_psnr", crop_border=0))
    assert 25 < psnr < 40
    ssim = calculate_metric(dict(img1=img, img2=noisy),
                            dict(type="calculate_ssim", crop_border=0))
    assert 0.2 < ssim < 1.0
    ssim_id = calculate_metric(dict(img1=img, img2=img),
                               dict(type="calculate_ssim", crop_border=0))
    assert ssim_id > 0.999
    l1 = calculate_metric(dict(img1=img, img2=noisy),
                          dict(type="calculate_l1", crop_border=0))
    assert 0 < l1 < 10


def test_external_metrics_gated():
    with pytest.raises(Exception):
        calculate_metric(dict(path_gt="/tmp", path_generated="/tmp"),
                         dict(type="calculate_akd"))


def test_file_client_disk(tmp_path):
    from synergize_motion_appearance_tpu.utils.file_client import FileClient

    p = tmp_path / "x.bin"
    p.write_bytes(b"hello")
    fc = FileClient("disk")
    assert fc.get(str(p)) == b"hello"
    with pytest.raises(ValueError):
        FileClient("nope")
