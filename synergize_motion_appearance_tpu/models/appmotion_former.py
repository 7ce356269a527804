"""AppMotionCompFormer — the flagship generator (net_g).

Parity target: archs/appmotioncodebook_arch.py:170-764. Multi-scale
compensatory codebooks: a motion codebook refines the dense flow
coarse-to-fine at every decoder scale (MRFA-style residual flow+occlusion
head), and an appearance codebook inpaints warped source features via
cross-attention, with nested prefix sub-codebooks per scale
(vqgan_arch.py:43-50, appmotioncodebook_arch.py:373-427, :472-544).

TPU-first notes:
  * The 4-scale loop is unrolled statically; every branch flag is a python
    constant, so one jit trace covers train and one covers inference.
  * All warps are `ops.grid_sample` — an XLA corner-packed gather (the
    Pallas warp attempts measured slower; post-mortem ops/interp.py /
    ops/pallas_warp.py); flow fields stay at the dense-motion resolution
    exactly like the reference, resized per-scale with bilinear
    align_corners=True matmuls on the MXU.
  * stop_gradient placement mirrors the reference's .detach() calls:
    motion_emb input (:377), deform_feat_list (:609-615, :705-719), and the
    straight-through VQ estimator.

Resolution generality: the reference hard-codes img_size=256 (token grid
32x32, scale keys '32'..'256'). Here everything derives from img_size:
scales = [img/8, img/4, img/2, img], token grid = img/8. Config keys may be
given as resolution strings ('64') exactly like the reference YAML.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import (
    grid_sample,
    interpolate_flow,
    make_coordinate_grid,
    resize_bilinear,
    resize_bilinear_at,
    resize_tap_plan,
    tap_reduce,
)
from .layers import (
    Conv2d,
    Dense,
    GroupNorm32,
    from_wl,
    leaky_relu,
    to_wl,
    wl_active,
    wl_layout,
)
from .transformer import TransformerLayer
from .vqgan import (
    AttnBlock,
    Downsample,
    Encoder,
    Generator,
    Upsample,
    VQGANResBlock,
    VectorQuantizer,
    encoder_block_defs,
    generator_block_defs,
)

from ..utils.env import env_flag as _env_flag

sg = jax.lax.stop_gradient


# ---------------------------------------------------------------------------
# helpers mirroring the reference's deform/occlude utilities
# ---------------------------------------------------------------------------

def deform_input(inp, deformation):
    """Warp NHWC `inp` by a (B, Hd, Wd, 2) deformation
    (appmotioncodebook_arch.py:349-356): resize flow to the input's size
    (bilinear, align_corners=True) then grid_sample(align_corners=True)."""
    h, w = inp.shape[1], inp.shape[2]
    deformation = interpolate_flow(deformation, (h, w))
    return grid_sample(inp, deformation, align_corners=True,
                       padding_mode="zeros")


def deform_input_resized(inp, deformation, out_size, point_fn=None):
    """Point-for-point equal to
    ``resize_bilinear(point_fn(deform_input(inp, deformation)),
    (out_size, out_size), align_corners=True)`` for pointwise
    ``point_fn`` (1x1 conv / relu), but evaluates the warp only at the
    downsample's 2*out_size tap rows/cols per axis.

    The reference warps encoder skips at full scale and immediately
    downsamples (appmotioncodebook_arch.py:349-356 warp, then
    F.interpolate at :416-418 / :648) — but an align_corners bilinear
    downsample reads exactly 2 taps per output pixel, so at the 256
    scale only 128x128 (context) / 64x64 (query) warped pixels are ever
    consumed. Profiled on v5e: the full-res warp chain (2.1 GB packed
    gather + layout copies + full-res 1x1 conv) was ~18% of generator
    device time; this computes the same values 3-16x smaller.
    """
    B, H, W, C = inp.shape
    ty, wy = resize_tap_plan(H, out_size)
    tx, wx = resize_tap_plan(W, out_size)
    flow = resize_bilinear_at(deformation, (H, W), ty, tx)
    warped = grid_sample(inp, flow, align_corners=True,
                         padding_mode="zeros")
    if point_fn is not None:
        warped = point_fn(warped)
    return tap_reduce(warped, wy, wx)


def occlude_input(inp, occlusion_map):
    """(appmotioncodebook_arch.py:358-362): resize occlusion (bilinear,
    align_corners=True) to the input's size, multiply."""
    if inp.shape[1:3] != occlusion_map.shape[1:3]:
        occlusion_map = resize_bilinear(
            occlusion_map, inp.shape[1:3], align_corners=True
        )
    # occlusion values live in [0,1]; multiply in the FEATURE dtype so an
    # f32 occlusion map doesn't promote the whole bf16 decoder tail to f32
    # (profiled: the promotion materialized f32[B,256,256,C] through every
    # fuse/generator conv — >1 GB of extra HBM traffic per 64-frame batch)
    return inp * occlusion_map.astype(inp.dtype)


def encoder_tap_indices(nf, emb_dim, ch_mult, res_blocks, resolution,
                        attn_resolutions):
    """resolution -> encoder block index, matching fuse_encoder_block
    ('256':2,'128':5,'64':8,'32':11 for the flagship config)."""
    defs = encoder_block_defs(nf, emb_dim, ch_mult, res_blocks, resolution,
                              attn_resolutions)
    taps = {}
    curr = resolution
    lowest = resolution // 2 ** (len(ch_mult) - 1)
    group_count = 0
    for i, (kind, _) in enumerate(defs):
        if kind == "down":
            taps[curr] = i - 1  # last res/attn block before downsample
            curr //= 2
            group_count = 0
        elif curr == lowest and kind in ("res", "attn"):
            group_count += 1
            # first (res[,attn]) group at the lowest resolution
            per_group = 2 if lowest in attn_resolutions else 1
            if group_count == per_group and lowest not in taps:
                taps[lowest] = i
    return taps


def generator_tap_indices(nf, emb_dim, ch_mult, res_blocks, resolution,
                          attn_resolutions):
    """resolution -> generator block index, matching fuse_generator_block
    ('32':6,'64':9,'128':12,'256':15 for the flagship config)."""
    defs = generator_block_defs(nf, emb_dim, ch_mult, res_blocks, resolution,
                                attn_resolutions)
    taps = {}
    lowest = resolution // 2 ** (len(ch_mult) - 1)
    curr = lowest
    res_seen_at_lowest = 0
    after_up = False
    for i, (kind, _) in enumerate(defs):
        if i < 4:
            continue  # initial conv + res/attn/res preamble
        if kind == "res" and curr == lowest and lowest not in taps:
            res_seen_at_lowest += 1
            if res_seen_at_lowest == res_blocks:
                taps[lowest] = i  # last res of the lowest group (pre-attn)
        if kind == "up":
            curr *= 2
            after_up = True
        elif after_up and kind == "res":
            if curr not in taps:
                taps[curr] = i  # first res after each upsample
            after_up = False
    return taps


class FuseSftBlock(nn.Module):
    """CFT scale/shift fusion (appmotioncodebook_arch.py:28-52)."""

    out_ch: int

    @nn.compact
    def __call__(self, enc_feat, dec_feat, w=1.0):
        cat_axis = 2 if wl_active() else -1
        enc = VQGANResBlock(self.out_ch, name="encode_enc")(
            jnp.concatenate([enc_feat, dec_feat], axis=cat_axis)
        )
        scale = Conv2d(self.out_ch, (3, 3), padding=1, name="scale1")(enc)
        scale = leaky_relu(scale, 0.2)
        scale = Conv2d(self.out_ch, (3, 3), padding=1, name="scale2")(scale)
        shift = Conv2d(self.out_ch, (3, 3), padding=1, name="shift1")(enc)
        shift = leaky_relu(shift, 0.2)
        shift = Conv2d(self.out_ch, (3, 3), padding=1, name="shift2")(shift)
        return dec_feat + w * (dec_feat * scale + shift)


class BasicMotionEncoder(nn.Module):
    """MRFA motion encoder (appmotioncodebook_arch.py:129-147)."""

    motion_dim: int

    @nn.compact
    def __call__(self, delta_flow, motion_feat):
        cor = jax.nn.relu(Conv2d(128, (1, 1), padding=0, name="convc1")(motion_feat))
        cor = jax.nn.relu(Conv2d(96, (3, 3), padding=1, name="convc2")(cor))
        flo = jax.nn.relu(Conv2d(128, (7, 7), padding=3, name="convf1")(delta_flow))
        flo = jax.nn.relu(Conv2d(64, (3, 3), padding=1, name="convf2")(flo))
        out = jax.nn.relu(
            Conv2d(126, (3, 3), padding=1, name="conv")(
                jnp.concatenate([cor, flo], axis=-1)
            )
        )
        return jnp.concatenate([out, delta_flow], axis=-1)  # 128 ch


class RefineFlow(nn.Module):
    """MRFA flow/occlusion residual head (appmotioncodebook_arch.py:150-167)."""

    @nn.compact
    def __call__(self, m_f, warp_f):
        c = jax.nn.relu(Conv2d(128, (3, 3), padding=1, name="convc1")(warp_f))
        inp = jnp.concatenate([m_f, c], axis=-1)  # 256 ch
        flow = Conv2d(2, (3, 3), padding=1, name="conv2")(
            jax.nn.relu(Conv2d(128, (3, 3), padding=1, name="conv1")(inp))
        )
        occ = Conv2d(1, (3, 3), padding=1, name="convo2")(
            jax.nn.relu(Conv2d(128, (3, 3), padding=1, name="convo1")(inp))
        )
        return jnp.concatenate([flow, occ], axis=-1)


class AppMotionCompFormer(nn.Module):
    img_size: int = 256
    nf: int = 64
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    res_blocks: int = 2
    attn_resolutions: Sequence[int] = (32,)
    quantizer_type: str = "nearest"
    beta: float = 0.25
    codebook_size_motion: int = 1024
    embed_dim_motion: int = 32
    codebook_size_app: int = 1024
    embed_dim_app: int = 256
    n_head: int = 8
    dim_embd_motion: int = 32
    n_layers_motion: int = 2
    dim_embd_app: int = 256
    n_layers_app: int = 2
    num_kp: int = 15
    with_position_emb: bool = True
    warp_s_d_kp_query: bool = True
    MRFA_motion_enc: bool = True
    motion_codebook_split: bool = True
    detach_motion_query: bool = True
    multiscale_feature_fusion: bool = True
    multiscale_sft: bool = True
    app_codebook_split: bool = True
    wo_motion_cdbk_share: bool = False
    wo_app_cdbk_share: bool = False
    connect_list: Optional[Sequence[Any]] = None
    connect_app_list: Optional[Sequence[Any]] = None
    # W-in-lanes decoder layout at inference (docs/PERF.md §15):
    # None = auto (on when the backend is TPU), True/False = force.
    # Env SAMT_WL_DECODER=0/1 overrides. Training stays NHWC unless
    # SAMT_WL_TRAIN=1 / wl_train=True opts the train graph in (the
    # conv3x3_wl_ad custom VJP makes the kernel differentiable —
    # gradient verdict docs/PERF.md §15b, train-step A/B §17).
    wl_decoder: Optional[bool] = None
    wl_train: bool = False
    # run the parallel low-res decode (train only) in the same WL layout
    # as the main stream. Measured §18: −4 ms at the b2 remat-off recipe
    # (157 vs 161 chained), +2 ms at b8-selective — so the b2 recipe
    # (train.yml) keeps the default and the b8 recipes set wl_xlr: false.
    # SAMT_WL_XLR overrides either way.
    wl_xlr: bool = True

    def _wl_inference_enabled(self) -> bool:
        """WL decoder region in INFERENCE graphs. Default OFF: the r3
        same-day e2e A/B that made it the TPU default was link-noise
        confounded — the link-invariant device measurement (r5,
        docs/PERF.md §20) shows WL at inference LOSES 12% device time
        (fb=16 device_fps 184.3 NHWC vs 163.0 WL). Env SAMT_WL_DECODER
        or config wl_decoder still opt in (A/B harnesses, tests)."""
        env = _env_flag("SAMT_WL_DECODER")
        if env is not None:
            return env
        if self.wl_decoder is not None:
            return bool(self.wl_decoder)
        return False

    def _wl_train_enabled(self) -> bool:
        """WL region in TRAIN graphs — measured WIN there (§17/§18:
        b2 chained 179→157 with wl_train+wl_xlr+vgg-dt; the train step
        is conv-VJP-bound where the shuffle-free kernel pays off).
        `wl_train` rides the wl_decoder tri-state for the kernel gate:
        default (None) = TPU-auto, explicit bool wins, env overrides."""
        env = _env_flag("SAMT_WL_TRAIN")
        if env is not None:
            return env
        if not bool(self.wl_train):
            return False
        if self.wl_decoder is not None:
            return bool(self.wl_decoder)
        return jax.default_backend() == "tpu"

    # ---------------- derived static config ----------------

    @property
    def scales(self) -> List[int]:
        """Feature resolutions lowest->highest, e.g. [32, 64, 128, 256]."""
        n = len(self.ch_mult)
        return [self.img_size // 2 ** (n - 1 - i) for i in range(n)]

    @property
    def token_hw(self) -> int:
        return self.scales[0]

    @property
    def channels(self) -> Dict[int, int]:
        """resolution -> channel count (appmotioncodebook_arch.py:211-216)."""
        rev = list(reversed(self.ch_mult))
        return {r: self.nf * rev[i] for i, r in enumerate(self.scales)}

    def _as_res_list(self, lst, default):
        if lst is None:
            return list(default)
        return [int(v) for v in lst]

    @property
    def connect(self) -> List[int]:
        return self._as_res_list(self.connect_list, self.scales[1:])

    @property
    def connect_app(self) -> List[int]:
        return self._as_res_list(self.connect_app_list, self.scales)

    def scale_idx(self, res: int) -> int:
        """resolution -> 1-based split index ({32:1,64:2,128:3,256:4})."""
        return self.scales.index(res) + 1

    # ---------------- setup ----------------

    def setup(self):
        from .vqgan import make_blocks

        enc_defs = encoder_block_defs(
            self.nf, self.embed_dim_app, self.ch_mult, self.res_blocks,
            self.img_size, self.attn_resolutions,
        )
        gen_defs = generator_block_defs(
            self.nf, self.embed_dim_app, self.ch_mult, self.res_blocks,
            self.img_size, self.attn_resolutions,
        )
        self.encoder_blocks = make_blocks(enc_defs, "encoder_blocks")
        self.generator_blocks = make_blocks(gen_defs, "generator_blocks")
        self.enc_taps = encoder_tap_indices(
            self.nf, self.embed_dim_app, self.ch_mult, self.res_blocks,
            self.img_size, self.attn_resolutions,
        )
        self.gen_taps = generator_tap_indices(
            self.nf, self.embed_dim_app, self.ch_mult, self.res_blocks,
            self.img_size, self.attn_resolutions,
        )

        t = self.token_hw
        ch = self.channels

        # appearance patch embeddings (appmotioncodebook_arch.py:218-240)
        app_emb = {}
        to_app = {}
        for r in self.connect_app:
            p = r // t
            if p == 1:
                app_emb[r] = Conv2d(self.dim_embd_app, (1, 1), padding=0,
                                    name=f"app_feat_emb_{r}")
                to_app[r] = Conv2d(ch[r], (1, 1), padding=0,
                                   name=f"to_app_feat_{r}")
            else:
                app_emb[r] = Dense(self.dim_embd_app,
                                   name=f"app_feat_emb_{r}")
                to_app[r] = Dense(ch[r] * p * p, name=f"to_app_feat_{r}")
        self.app_feat_emb = app_emb
        self.to_app_feat = to_app

        self.quantize_app = VectorQuantizer(
            self.codebook_size_app, self.embed_dim_app, self.beta,
            name="quantize_app",
        )
        self.quantize_motion = VectorQuantizer(
            self.codebook_size_motion, self.embed_dim_motion, self.beta,
            name="quantize_motion",
        )

        if self.multiscale_sft:
            self.fuse_convs_dict = {
                r: FuseSftBlock(ch[r], name=f"fuse_convs_{r}")
                for r in self.connect
            }
        if self.multiscale_feature_fusion:
            self.fuse_ms_dict = {
                r: Conv2d(ch[r], (3, 3), padding=1, name=f"fuse_ms_{r}")
                for r in self.connect
            }

        if self.with_position_emb:
            self.position_emb_app = self.param(
                "position_emb_app", nn.initializers.zeros,
                (t * t, self.dim_embd_app),
            )
            self.position_emb_motion = self.param(
                "position_emb_motion", nn.initializers.zeros,
                (t * t, self.dim_embd_motion),
            )

        # motion embedding / readout stacks (appmotioncodebook_arch.py:284-292)
        self.motion_emb_conv = Conv2d(self.dim_embd_motion, (3, 3),
                                      padding=1, name="motion_emb_conv")
        self.motion_emb_down = Downsample(name="motion_emb_down")
        self.motion_emb_res = VQGANResBlock(self.dim_embd_motion,
                                            name="motion_emb_res")
        self.to_motion_up = Upsample(name="to_motion_up")
        self.to_motion_res = VQGANResBlock(self.dim_embd_motion,
                                           name="to_motion_res")
        self.to_motion_norm = GroupNorm32(name="to_motion_norm")
        self.to_motion_conv = Conv2d(2, (3, 3), padding=1,
                                     name="to_motion_conv")

        self.motion_block = [
            TransformerLayer(self.dim_embd_motion, self.n_head,
                             self.dim_embd_motion * 2,
                             name=f"motion_block_{i}")
            for i in range(self.n_layers_motion)
        ]
        self.app_block = [
            TransformerLayer(self.dim_embd_app, self.n_head,
                             self.dim_embd_app * 2, name=f"app_block_{i}")
            for i in range(self.n_layers_app)
        ]

        if self.MRFA_motion_enc:
            self.basic_motion_encoder = BasicMotionEncoder(
                self.dim_embd_motion, name="BasicMotionEncoder"
            )
            self.to_context = {
                r: Conv2d(192, (1, 1), padding=0, name=f"to_context_{r}")
                for r in self.scales
            }
            self.refine = RefineFlow(name="refine")

        if self.warp_s_d_kp_query:
            self.warped_source_enc = {
                r: Conv2d(self.dim_embd_motion, (1, 1), padding=0,
                          name=f"warped_source_enc_{r}")
                for r in self.scales
            }
            self.driving_kp_enc = Conv2d(self.dim_embd_motion, (1, 1),
                                         padding=0, name="driving_kp_enc")
            self.motion_query_enc_1 = Conv2d(
                self.dim_embd_motion, (1, 1), padding=0,
                name="motion_query_enc_1",
            )
            self.motion_query_enc_2 = Conv2d(
                self.dim_embd_motion, (1, 1), padding=0,
                name="motion_query_enc_2",
            )

    # ---------------- sub-computations ----------------

    def _motion_emb(self, m):
        f = self.motion_emb_conv(m)
        f = self.motion_emb_down(f)
        return self.motion_emb_res(f)

    def _to_motion(self, f):
        f = self.to_motion_up(f)
        f = self.to_motion_res(f)
        f = self.to_motion_norm(f)
        return self.to_motion_conv(f)

    def _codebook_context(self, quantizer, codebook_size, split_count,
                          scale_idx, batch, disjoint):
        """Sliced codebook entries (K, D), shared across the batch
        (appmotioncodebook_arch.py:400-407, :508-525 — the torch code
        repeats the codebook per batch element; here the single copy
        flows through MultiheadAttention's unbatched-context path so the
        k/v projection and head relayout run once, not per frame)."""
        del batch
        chunk = codebook_size // split_count
        if scale_idx is None:
            return quantizer.codebook_slice(0, codebook_size)
        if disjoint:
            return quantizer.codebook_slice(chunk * (scale_idx - 1), chunk)
        return quantizer.codebook_slice(0, chunk * scale_idx)

    def motion_codebook_compensation(self, motion, query_feat,
                                     warp_source_feat, res=None,
                                     inference=False, warp_ctx=None):
        """appmotioncodebook_arch.py:373-427.

        motion: (B, Hd, Wd, 2) flow residual in *pixel* units.
        query_feat: (B, t, t, dim_embd_motion) fused warp+kp query.
        warp_source_feat: (B, r, r, ch[r]) warped source feature (MRFA ctx).
        res: feature resolution for codebook splitting (None = full book).
        warp_ctx: optional precomputed relu(to_context(warped)) at
          (Hd, Wd) — the tap-composed fast path from `motion_pass`
          (identical values; skips the full-res context chain).
        """
        B, Hd, Wd, _ = motion.shape
        t = self.token_hw
        split_count = 1 + len(self.connect)

        m = sg(motion)  # m.detach() — :377
        m_feat = self._motion_emb(m)  # (B, t, t, dim)

        quant_out = None
        if not inference:
            if res is not None and self.motion_codebook_split:
                chunk = self.codebook_size_motion // split_count
                idx = self.scale_idx(res)
                if self.wo_motion_cdbk_share:
                    quant_out = self.quantize_motion(
                        m_feat, start=chunk * (idx - 1), num=chunk
                    )
                else:
                    quant_out = self.quantize_motion(m_feat, num=chunk * idx)
            else:
                quant_out = self.quantize_motion(m_feat)

        if self.warp_s_d_kp_query:
            if query_feat.shape[1:3] != m_feat.shape[1:3]:
                query_feat = resize_bilinear(query_feat, m_feat.shape[1:3],
                                             align_corners=True)
            query_emb = self.motion_query_enc_2(
                jnp.concatenate([m_feat, query_feat], axis=-1)
            )
        else:
            query_emb = m_feat
        query_emb = query_emb.reshape(B, t * t, self.dim_embd_motion)

        pos = self.position_emb_motion[None] if self.with_position_emb else None
        cb_idx = self.scale_idx(res) if (
            res is not None and self.motion_codebook_split
        ) else None
        context = self._codebook_context(
            self.quantize_motion, self.codebook_size_motion, split_count,
            cb_idx, B, self.wo_motion_cdbk_share,
        )
        for block in self.motion_block:
            query_emb = block(query_emb, context, (t, t), query_pos=pos)
        query_emb = query_emb.reshape(B, t, t, self.dim_embd_motion)

        if self.MRFA_motion_enc:
            motion_f = resize_bilinear(query_emb, (Hd, Wd),
                                       align_corners=True)
            m_f = self.basic_motion_encoder(motion, motion_f)
            if warp_ctx is not None:
                warp_f = warp_ctx
            else:
                r = warp_source_feat.shape[1]
                warp_f = jax.nn.relu(self.to_context[r](warp_source_feat))
                warp_f = resize_bilinear(warp_f, (Hd, Wd),
                                         align_corners=True)
            m_res = self.refine(m_f, warp_f)  # (B, Hd, Wd, 3)
        else:
            m_res = self._to_motion(query_emb)

        if inference:
            return m_res, None, None
        m_recon = self._to_motion(quant_out[0])
        return m_res, m_recon, quant_out[1]

    def _app_tokens(self, feat, res):
        """Patch-embed a (B, r, r, C) feature to (B, t*t, dim_embd_app)."""
        B = feat.shape[0]
        t = self.token_hw
        p = res // t
        if p == 1:
            tok = self.app_feat_emb[res](feat)
            return tok.reshape(B, t * t, self.dim_embd_app)
        # stride-p conv == patch-matmul with inner order (p_row, p_col, C);
        # avoids the (B,t,p,t,p,C) transpose relayout
        tok = self.app_feat_emb[res](feat, patch=p)
        return tok.reshape(B, t * t, self.dim_embd_app)

    def _app_untokens(self, tokens, res):
        """Inverse of _app_tokens: (B, t*t, d) -> (B, r, r, C)."""
        B = tokens.shape[0]
        t = self.token_hw
        p = res // t
        grid = tokens.reshape(B, t, t, self.dim_embd_app)
        if p == 1:
            return self.to_app_feat[res](grid)
        # stride-p transposed conv == dense + (B,t,t,p,p,C) scatter
        return self.to_app_feat[res](grid, transpose_patch=p)

    def app_codebook_compensation(self, feat, motion):
        """appmotioncodebook_arch.py:472-544."""
        B, r, _, c = feat.shape
        t = self.token_hw
        split_count = len(self.connect_app)

        m = resize_bilinear(motion, (t, t), align_corners=True)
        m = m.reshape(B, t * t, 2)
        ignore = jnp.any((m > 1) | (m < -1), axis=-1)  # (B, t*t)

        tokens = self._app_tokens(feat, r)
        pos = self.position_emb_app[None] if self.with_position_emb else None
        cb_idx = self.scale_idx(r) if self.app_codebook_split else None
        context = self._codebook_context(
            self.quantize_app, self.codebook_size_app, split_count,
            cb_idx, B, self.wo_app_cdbk_share,
        )
        for j, block in enumerate(self.app_block):
            mask = ignore if j == 0 else None  # first block only (:509-525)
            tokens = block(tokens, context, (t, t),
                           key_padding_mask=mask, query_pos=pos)
        return self._app_untokens(tokens, r)

    def app_codebook_loss(self, gt):
        """Quantize driving features at every app scale; commit losses
        (appmotioncodebook_arch.py:429-469)."""
        taps = [self.enc_taps[r] for r in self.connect_app]
        x = gt
        feats = {}
        for i, block in enumerate(self.encoder_blocks):
            x = block(x)
            if i in taps:
                r = x.shape[1]
                feats[r] = x
        t = self.token_hw
        split_count = len(self.connect_app)
        chunk = self.codebook_size_app // split_count

        recon_list, loss_list = [], []
        for r in self.connect_app:
            feat = feats[r]
            tokens = self._app_tokens(feat, r)  # (B, t*t, d)
            grid = tokens.reshape(-1, t, t, self.dim_embd_app)
            idx = self.scale_idx(r)
            if self.app_codebook_split:
                if self.wo_app_cdbk_share:
                    quant, loss, _ = self.quantize_app(
                        grid, start=chunk * (idx - 1), num=chunk
                    )
                else:
                    quant, loss, _ = self.quantize_app(grid, num=chunk * idx)
            else:
                quant, loss, _ = self.quantize_app(grid)
            q_tok = quant.reshape(tokens.shape)
            recon_list.append(
                (self._app_untokens(q_tok, r), self._app_untokens(tokens, r))
            )
            loss_list.append(loss)
        return recon_list, loss_list

    def encode_driving(self, x):
        """Skip features + lowest-res tap (appmotioncodebook_arch.py:364-371)."""
        taps = [self.enc_taps[r] for r in set(self.connect + [self.scales[0]])]
        feats = {}
        for i, block in enumerate(self.encoder_blocks):
            x = block(x)
            if i in taps:
                feats[x.shape[1]] = x
        return feats

    def encode_source(self, x):
        """One encoder sweep -> {'latent', 'feats'}; pass the result as
        `source_feats` to __call__ to skip re-encoding the same source for
        every driving-frame batch (TPU inference optimization — the
        reference re-runs the encoder per frame at batch 1). Batch-1 feats
        broadcast against batch-F flows inside grid_sample for free."""
        enc_tap_idx = {self.enc_taps[r]: r for r in self.connect}
        feats = {}
        for i, block in enumerate(self.encoder_blocks):
            x = block(x)
            if i in enc_tap_idx:
                feats[enc_tap_idx[i]] = x
        return {"latent": x, "feats": feats}

    def decode_latent(self, lq_feat):
        """Plain generator sweep of a 32x32 latent (net_g.generator(...),
        used for the lq reconstruction visual — appmotioncomp_model.py:454)."""
        x = lq_feat
        for block in self.generator_blocks:
            x = block(x)
        return x

    # ---------------- full forward ----------------

    def __call__(self, x, dense_motion, w: float = 1.0,
                 inference: bool = False, gt=None, source_feats=None):
        if x.shape[1] != self.img_size or x.shape[2] != self.img_size:
            raise ValueError(
                f"AppMotionCompFormer(img_size={self.img_size}) got source "
                f"of shape {x.shape}; resize inputs to "
                f"({self.img_size}, {self.img_size}) first."
            )
        B = dense_motion["deformation"].shape[0]
        t = self.token_hw
        connect = self.connect
        enc_tap_idx = {self.enc_taps[r]: r for r in connect}

        if source_feats is None:
            # encoder sweep with skip taps (:549-554)
            enc_feat_dict = {}
            for i, block in enumerate(self.encoder_blocks):
                x = block(x)
                if i in enc_tap_idx:
                    enc_feat_dict[enc_tap_idx[i]] = x
            # x is now the 32x32 latent (emb_dim_app channels)
        else:
            enc_feat_dict = source_feats["feats"]
            x = source_feats["latent"]

        deformation = dense_motion["deformation"]  # (B, Hd, Wd, 2)
        Hd, Wd = deformation.shape[1:3]
        half = (Hd - 1.0) / 2.0
        grid = make_coordinate_grid(Hd, Wd)[None]

        motion_list = [deformation]
        res_motion_list = []
        out_occ = []
        motion_recon_list = []
        codebook_loss_motion_list = []

        # single mode: (B, Hd, Wd, 1) sigmoid'd map; multi_mask mode: a
        # coarse->fine LIST of maps consumed positionally (:606-610,
        # :702-706) — the MRFA occlusion residuals are computed but never
        # applied in that mode (:598 gates on `not isinstance(..., list)`)
        dense_occ = dense_motion["occlusion_map"]
        occ_is_list = isinstance(dense_occ, (list, tuple))

        # driving-kp query feature, computed once (:571)
        driving_kp_feat = None
        if self.warp_s_d_kp_query:
            kp_heat = dense_motion["driving_kp_heatmap"]  # (B, K, Hd, Wd)
            kp_heat = kp_heat.transpose(0, 2, 3, 1)
            kp_heat = resize_bilinear(kp_heat, (t, t), align_corners=True)
            driving_kp_feat = jax.nn.relu(self.driving_kp_enc(kp_heat))

        def motion_pass(feat_for_query, res):
            """One motion-codebook compensation pass at feature `res`.

            The query (->t^2) and MRFA-context (->Hd^2) consumers of the
            warped feature only read the downsample taps, so at scales
            above 2*Hd the full-resolution warp is replaced by exact
            tap-composed warps (`deform_input_resized`)."""
            motion_q = motion_list[-1]
            H = feat_for_query.shape[1]
            need_dense = (
                (self.warp_s_d_kp_query and 2 * t >= H)
                or (self.MRFA_motion_enc and 2 * Hd >= H)
                or not (self.warp_s_d_kp_query or self.MRFA_motion_enc)
            )
            warp_src_0 = (deform_input(feat_for_query, motion_q)
                          if need_dense else None)
            if self.warp_s_d_kp_query:
                if warp_src_0 is not None:
                    ws = resize_bilinear(warp_src_0, (t, t),
                                         align_corners=True)
                else:
                    ws = deform_input_resized(feat_for_query, motion_q, t)
                ws = jax.nn.relu(self.warped_source_enc[res](ws))
                q_feat = self.motion_query_enc_1(
                    jnp.concatenate([ws, driving_kp_feat], axis=-1)
                )
            else:
                q_feat = None
            warp_ctx = None
            if self.MRFA_motion_enc:
                def ctx_fn(v):
                    return jax.nn.relu(self.to_context[res](v))

                if warp_src_0 is not None:
                    warp_ctx = resize_bilinear(ctx_fn(warp_src_0),
                                               (Hd, Wd),
                                               align_corners=True)
                else:
                    warp_ctx = deform_input_resized(
                        feat_for_query, motion_q, Hd, point_fn=ctx_fn
                    )
            m_res, m_recon, cb_loss = self.motion_codebook_compensation(
                (motion_q - grid) * half, q_feat, warp_src_0,
                res=res if self.motion_codebook_split else None,
                inference=inference, warp_ctx=warp_ctx,
            )
            if self.MRFA_motion_enc:
                d_occ = m_res[..., 2:3]
                m_res = m_res[..., 0:2]
            else:
                d_occ = None
            res_motion_list.append(m_res / half)
            motion_list.append(motion_q + res_motion_list[-1])
            if not inference:
                motion_recon_list.append(m_recon / half)
                codebook_loss_motion_list.append(cb_loss)
            return d_occ

        # ---- base scale (token grid) ----
        r0 = self.scales[0]
        d_occ = motion_pass(x, r0)
        if occ_is_list:
            occ0 = dense_occ[0]  # (:606-610)
            occlusion_idx = 1
        elif self.MRFA_motion_enc:
            out_occ.append(jax.nn.sigmoid(dense_occ + d_occ))  # (:598-601)
            occ0 = out_occ[0]
        else:
            occ0 = dense_occ

        m_com = motion_list[-1]
        lq_feat = occlude_input(deform_input(x, m_com), occ0)
        # deform_feat_list duplicates every warp with stop_gradient for
        # telemetry (:609-615) — training-only; skip at inference
        deform_feat_list = [] if inference else [
            occlude_input(deform_input(sg(x), m_com), sg(occ0))
        ]
        app_before_comp_list = [lq_feat]
        lq_feat = self.app_codebook_compensation(lq_feat, m_com)
        app_comp_list = [lq_feat]

        # driving-side codebook losses (:640-641)
        app_recon_list, codebook_loss_app_list = [], []
        if gt is not None and not inference:
            app_recon_list, codebook_loss_app_list = self.app_codebook_loss(gt)

        # ---- generator sweep with per-scale fusion (:656-738) ----
        xg = lq_feat
        x_lr = None if inference else lq_feat
        gen_tap_idx = {self.gen_taps[r]: r for r in connect}
        max_app_res = max(self.connect_app)

        # W-in-lanes decoder region (docs/PERF.md §15): at inference on
        # TPU, blocks operating at >=128² run with activations laid out
        # (B, H, C, W) so their 3x3 convs hit the shuffle-free Pallas
        # kernel. Entry is fused into the first qualifying Upsample
        # (transpose at the SMALL pre-upsample size); exit happens before
        # the final RGB conv. Everything outside block/fuse calls (warps,
        # occlusion, codebook compensation) stays NHWC.
        use_wl = (self._wl_inference_enabled() if inference
                  else self._wl_train_enabled())
        # the parallel low-res decode (train only, :651/:658-659) runs the
        # same blocks; same-layout-as-main won the b2 A/B and lost the b8
        # one (measured docs/PERF.md §18) — per-recipe config `wl_xlr`,
        # env SAMT_WL_XLR overrides.
        env_xlr = _env_flag("SAMT_WL_XLR")
        xlr_wl = use_wl and (bool(self.wl_xlr) if env_xlr is None
                             else env_xlr)
        in_wl = False
        lr_wl = False

        pre_final = None
        for i, block in enumerate(self.generator_blocks):
            if use_wl and not in_wl and isinstance(block, Upsample) \
                    and ((xg.shape[2] * 2) % 128 == 0
                         or jax.default_backend() != "tpu"):
                xg = to_wl(xg, name="wl_edge")
                in_wl = True
                if x_lr is not None and xlr_wl:
                    x_lr = to_wl(x_lr, name="wl_edge")
                    lr_wl = True
            if i == len(self.generator_blocks) - 1:
                if in_wl:
                    xg = from_wl(xg, name="wl_edge")
                    in_wl = False
                if lr_wl:
                    x_lr = from_wl(x_lr, name="wl_edge")
                    lr_wl = False
                # activation entering the final RGB conv — used by the
                # adaptive GAN weight (appmotioncomp_model.py:222-228, 334)
                pre_final = xg
            with wl_layout(in_wl):
                xg = block(xg)
            if x_lr is not None:
                with wl_layout(lr_wl):
                    x_lr = block(x_lr)
            if i in gen_tap_idx:
                f_res = gen_tap_idx[i]
                enc_feat = enc_feat_dict[f_res]
                d_occ = motion_pass(enc_feat, f_res)
                m_com = motion_list[-1]
                if occ_is_list:
                    occ = dense_occ[occlusion_idx]  # (:702-706)
                    occlusion_idx += 1
                elif self.MRFA_motion_enc:
                    out_occ.append(jax.nn.sigmoid(out_occ[-1] + d_occ))
                    occ = out_occ[-1]
                else:
                    occ = dense_occ
                enc_feat_warped = occlude_input(
                    deform_input(enc_feat, m_com), occ
                )
                if not inference:
                    deform_feat_list.append(
                        occlude_input(deform_input(sg(enc_feat), m_com),
                                      sg(occ))
                    )
                if f_res <= max_app_res:  # (:723)
                    app_before_comp_list.append(enc_feat_warped)
                    enc_feat_warped = self.app_codebook_compensation(
                        enc_feat_warped, m_com
                    )
                    app_comp_list.append(enc_feat_warped)
                if in_wl:
                    enc_feat_warped = to_wl(enc_feat_warped,
                                            name="wl_edge")
                with wl_layout(in_wl):
                    if self.multiscale_sft:
                        xg = self.fuse_convs_dict[f_res](
                            enc_feat_warped, xg, w)
                    if self.multiscale_feature_fusion:
                        xg = xg + self.fuse_ms_dict[f_res](enc_feat_warped)

        out = {
            "out": xg,
            "pre_final": pre_final,
            "lq_feat": lq_feat,
            "out_occ": out_occ,
            "deformation_list": motion_list,
            "res_deform_list": res_motion_list,
            "deform_feat_list": deform_feat_list,
            "app_comp_list": app_comp_list,
            "app_before_comp_list": app_before_comp_list,
        }
        if not inference:
            out["out_lr"] = [x_lr]
            out["motion_recon_list"] = motion_recon_list
            out["codebook_loss_motion_list"] = codebook_loss_motion_list
        if gt is not None and not inference:
            out["app_recon_list"] = app_recon_list
            out["codebook_loss_app_list"] = codebook_loss_app_list
        return out
