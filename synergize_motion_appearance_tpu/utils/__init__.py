from .registry import (
    Registry,
    DATASET_REGISTRY,
    ARCH_REGISTRY,
    MODEL_REGISTRY,
    LOSS_REGISTRY,
    METRIC_REGISTRY,
)
