from .losses import (
    L1Loss,
    MSELoss,
    CharbonnierLoss,
    WeightedL1Loss,
    WeightedTVLoss,
    GANLoss,
    MultiScalePyramidPerceptualLoss,
    EquivarianceLoss,
    KPDistanceLoss,
    build_loss,
)
