from .frames_dataset import (
    FramesMotionTransferDataset,
    FramesMotionTransferTestDataset_CrossID_videopair_anchor,
    FramesMotionTransferTestDataset_PairsList,
    build_dataset,
)
from .sampler import EnlargedSampler
from .loader import BatchLoader, infinite_batches
from .transforms import augment_video
from .data_util import (
    duf_downsample,
    generate_frame_indices,
    paired_paths_from_folder,
    paired_paths_from_lmdb,
    paired_paths_from_meta_info_file,
    paths_from_folder,
    paths_from_lmdb,
    read_img_seq,
)
