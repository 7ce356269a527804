"""TPU warp kernel status + dispatch.

The north-star op (SURVEY.md section 2.2) is the bilinear backward warp
(grid_sample). TPU-native implementations built and measured:

1. A Pallas kernel holding the source in VMEM and gathering corners with
   Mosaic's `tpu.dynamic_gather` (via take_along_axis over a (H*W, C)
   view). **This does not compile on the real TPU toolchain at any
   model-relevant size** — Mosaic's dynamic_gather cannot gather across
   multiple source vregs along the gather dimension ("Not implemented:
   Multiple source vregs along gather dimension"), and a (H*W, C) view
   spans many vregs for any H*W > a few rows. Block-gather alternatives
   (lax.gather with slice_sizes=(2,2,C)) are worse: XLA tile-pads the
   (2, 2) dims to (8, 128), a 32x memory expansion.

2. A row-blocked Pallas design (gather only within a VMEM row block with
   scalar-prefetched row indices) — see docs/PERF.md for the measured
   verdict and the bandwidth-roofline bound on the packed gather.

3. The production path in `interp.grid_sample`: the 4 corner values are
   pre-packed into channels (roll+concat) so ONE lane-aligned XLA gather
   of (N, 4C) fetches every corner, with per-pixel slot selects
   reproducing torch's independent corner clipping. Measured ~2x faster
   than 4 separate corner gathers at both hot shapes (the 1->64-frame
   256²x64 broadcast warp and the 16-way dense-motion warp).

`grid_sample_fast` is the accelerated entry point; it dispatches to the
packed-gather implementation (honest name: it is an XLA gather program,
not a Mosaic kernel — the kernel attempts above were slower or
uncompilable).
"""
from __future__ import annotations

from .interp import grid_sample as grid_sample_jnp


def grid_sample_fast(img, grid, align_corners=True, padding_mode="zeros",
                     interpret=False):
    """Accelerated grid_sample (see module docstring for why this is the
    corner-packed XLA gather rather than a Mosaic kernel)."""
    del interpret
    return grid_sample_jnp(img, grid, align_corners, padding_mode)
