"""Metric dispatch (parity target: metrics/__init__.py:14-24).

PSNR/SSIM/L1 are self-contained. FID, LPIPS and AED run natively on TPU
through JAX ports of the reference's backbones (inception.py /
lpips_jax.py / openface.py) given only their weight files; AKD,
id-similarity and pose wrap third-party face models (face_alignment,
insightface, mediapipe — SURVEY.md section 2, metrics row) and raise a
clear error when the dependency or weights are absent.
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
