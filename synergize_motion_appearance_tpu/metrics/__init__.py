"""Metric dispatch (parity target: metrics/__init__.py:14-24).

PSNR/SSIM/L1 are self-contained. The external-model metrics (FID, LPIPS,
AKD, AED, id-similarity, pose accuracy) are scoring tools built on third-
party models (InceptionV3, face_alignment, OpenFace, insightface,
mediapipe — SURVEY.md section 2, metrics row); they register lazily and
raise a clear error if their dependency or weights are absent in this
zero-egress environment.
"""
from typing import Any, Dict

from ..utils.registry import METRIC_REGISTRY
from .psnr_ssim import calculate_psnr, calculate_ssim, calculate_l1
from . import external  # registers gated metrics


def calculate_metric(data: Dict[str, Any], opt: Dict[str, Any]):
    """Dispatch by opt['type'] with data kwargs."""
    opt = dict(opt)
    metric_type = opt.pop("type")
    return METRIC_REGISTRY.get(metric_type)(**data, **opt)
