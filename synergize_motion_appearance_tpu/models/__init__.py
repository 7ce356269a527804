"""Model zoo: motion stack + appearance stack + discriminator.

Network registry mirrors the reference's ARCH_REGISTRY surface
(archs/__init__.py:13-19): `build_network({'type': ..., **kwargs})`.
"""
from typing import Any, Dict

from .keypoint_detector import KPDetector
from .dense_motion import DenseMotionNetwork, MotionEstimator
from .vqgan import (
    Encoder,
    Generator,
    VQAutoEncoder,
    AutoEncoder,
    VQGANDiscriminator,
    VectorQuantizer,
)
from .appmotion_former import AppMotionCompFormer
from .transformer import TransformerLayer, MultiheadAttention
from .vqgan_extras import (
    AutoEncoderMSDecoder,
    FuseFeatBlock,
    GumbelQuantizer,
    MSGenerator,
)
from .vgg import VGG19Features, VGGFeatureExtractor
from .arch_util import (
    DCNv2Pack,
    ModulatedDeformConvPack,
    ResidualBlockNoBN,
    Upsample,
    flow_warp,
    make_layer,
    resize_flow,
    scaled_conv_kernel_init,
    trunc_normal_init,
)

from ..utils.registry import ARCH_REGISTRY

for _cls in (
    KPDetector,
    DenseMotionNetwork,
    MotionEstimator,
    VQAutoEncoder,
    AutoEncoder,
    VQGANDiscriminator,
    AppMotionCompFormer,
):
    ARCH_REGISTRY.register(_cls)

# reference-compat aliases (archs/motion_estimator_arch.py:15,
# archs/vqgan_arch.py:629)
ARCH_REGISTRY.register(MotionEstimator, name="Motion_Estimator_keypoint_aware")
ARCH_REGISTRY.register(VGGFeatureExtractor)
ARCH_REGISTRY.register(AutoEncoderMSDecoder, name="AutoEncoder_MSDecoder")


def build_network(opt: Dict[str, Any]):
    """Instantiate a network module from a config dict with a 'type' key."""
    opt = dict(opt)
    net_type = opt.pop("type")
    cls = ARCH_REGISTRY.get(net_type)
    # YAML configs may use list values where flax wants tuples
    opt = {
        k: tuple(v) if isinstance(v, list) and k in (
            "ch_mult", "attn_resolutions"
        ) else v
        for k, v in opt.items()
    }
    return cls(**opt)


__all__ = [
    "KPDetector",
    "DenseMotionNetwork",
    "MotionEstimator",
    "Encoder",
    "Generator",
    "VQAutoEncoder",
    "AutoEncoder",
    "VQGANDiscriminator",
    "VectorQuantizer",
    "AppMotionCompFormer",
    "TransformerLayer",
    "MultiheadAttention",
    "build_network",
]
