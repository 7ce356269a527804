"""synergize_motion_appearance_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the
talking-head reenactment framework ShaelynZ/synergize-motion-appearance
("Synergizing Motion and Appearance: Multi-Scale Compensatory Codebooks for
Talking Head Video Generation", CVPR 2025).

This is NOT a port of the reference's PyTorch/CUDA code: the compute path is
pure-functional flax/JAX compiled by XLA onto the TPU MXU, hot gather kernels
are Pallas, and scale-out uses `jax.sharding.Mesh` + jit-sharded batches
instead of DDP/NCCL.

Layout convention: all image tensors are NHWC (TPU-native), flow/deformation
fields are (B, H, W, 2) with (x, y) in [-1, 1] exactly like the reference's
`F.grid_sample` grids, so op-level numerics match the reference bit-close.
"""

__version__ = "0.1.0"
