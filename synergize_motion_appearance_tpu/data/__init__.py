from .frames_dataset import (
    FramesMotionTransferDataset,
    FramesMotionTransferTestDataset_CrossID_videopair_anchor,
    FramesMotionTransferTestDataset_PairsList,
    build_dataset,
)
from .sampler import EnlargedSampler
from .loader import BatchLoader, infinite_batches
from .transforms import augment_video
