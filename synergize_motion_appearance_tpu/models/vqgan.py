"""VQGAN backbone: encoder/generator block stacks, quantizer, discriminator.

Parity target: archs/vqgan_arch.py. The encoder/generator are built as
explicit block *lists* with the same per-index structure as the reference
(nn.ModuleList semantics), because AppMotionCompFormer taps skip features
at fixed block indices — fuse_encoder_block {'256':2,'128':5,'64':8,'32':11}
and fuse_generator_block {'32':6,'64':9,'128':12,'256':15}
(appmotioncodebook_arch.py:327-329). With ch_mult=[1,2,2,4], res_blocks=2,
attn at the lowest resolution, those indices land on the same layers here.

TPU notes: AttnBlock's 1x1-conv qkv spatial attention is three matmuls on
the MXU; GroupNorm/swish fuse into the surrounding convs under XLA.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import upsample_nearest, vq_quantize
from .layers import (Conv2d, GroupNorm32, swish, leaky_relu, wl_active,
                     wl_layout, to_wl, from_wl)


class VQGANResBlock(nn.Module):
    """GroupNorm32 + swish + conv, x2, with 1x1 shortcut on channel change
    (vqgan_arch.py:168-191)."""

    out_channels: int

    @nn.compact
    def __call__(self, x_in):
        # channel axis is 2 inside a wl_layout() scope ((B, H, C, W))
        in_channels = x_in.shape[2 if wl_active() else -1]
        x = GroupNorm32(name="norm1")(x_in)
        x = swish(x)
        x = Conv2d(self.out_channels, (3, 3), padding=1, name="conv1")(x)
        x = GroupNorm32(name="norm2")(x)
        x = swish(x)
        x = Conv2d(self.out_channels, (3, 3), padding=1, name="conv2")(x)
        if in_channels != self.out_channels:
            x_in = Conv2d(self.out_channels, (1, 1), padding=0,
                          name="conv_out")(x_in)
        return x + x_in


class AttnBlock(nn.Module):
    """Spatial self-attention with 1x1-conv qkv (vqgan_arch.py:194-253)."""

    @nn.compact
    def __call__(self, x):
        # Not WL-layout-aware by design (attention is relayout-bound
        # anyway): inside a wl_layout() scope, transpose to NHWC and run
        # the standard path so a config that places attention in the WL
        # region (attn at >=128², or post-upsample attn off-TPU) computes
        # correctly instead of silently attending over the wrong axes.
        wl = wl_active()
        if wl:
            x = from_wl(x)
        with wl_layout(False):
            B, H, W, C = x.shape
            h_ = GroupNorm32(name="norm")(x)
            q = Conv2d(C, (1, 1), padding=0, name="q")(h_)
            k = Conv2d(C, (1, 1), padding=0, name="k")(h_)
            v = Conv2d(C, (1, 1), padding=0, name="v")(h_)

            q = q.reshape(B, H * W, C)
            k = k.reshape(B, H * W, C)
            v = v.reshape(B, H * W, C)
            w_ = jnp.einsum("bqc,bkc->bqk", q, k) * (C ** -0.5)
            w_ = jax.nn.softmax(w_, axis=2)
            h_ = jnp.einsum("bqk,bkc->bqc", w_, v).reshape(B, H, W, C)
            h_ = Conv2d(C, (1, 1), padding=0, name="proj_out")(h_)
            out = x + h_
        return to_wl(out) if wl else out


class Downsample(nn.Module):
    """pad (0,1,0,1) + 3x3 stride-2 valid conv (vqgan_arch.py:144-153)."""

    @nn.compact
    def __call__(self, x):
        # Like AttnBlock: not WL-aware — transpose to NHWC under a
        # wl_layout(False) scope so a WL-region Downsample (no shipped
        # config has one) computes correctly instead of padding the
        # wrong axes silently.
        wl = wl_active()
        if wl:
            x = from_wl(x)
        with wl_layout(False):
            C = x.shape[-1]
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            y = Conv2d(C, (3, 3), strides=(2, 2), padding=0,
                       name="conv")(x)
        return to_wl(y) if wl else y


class Upsample(nn.Module):
    """nearest 2x + 3x3 conv (vqgan_arch.py:156-165)."""

    @nn.compact
    def __call__(self, x):
        if wl_active():
            C = x.shape[2]
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=3)
        else:
            C = x.shape[-1]
            x = upsample_nearest(x, 2)
        return Conv2d(C, (3, 3), padding=1, name="conv")(x)


class _NormBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        return GroupNorm32(name="norm")(x)


class _ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return Conv2d(self.features, (3, 3), padding=1, name="conv")(x)


def encoder_block_defs(nf: int, emb_dim: int, ch_mult: Sequence[int],
                       num_res_blocks: int, resolution: int,
                       attn_resolutions: Sequence[int]):
    """Block spec list mirroring Encoder.__init__ (vqgan_arch.py:256-294).

    Returns a list of (kind, arg) tuples; kinds: conv/res/attn/down/norm.
    """
    defs: List[Tuple[str, int]] = []
    num_resolutions = len(ch_mult)
    curr_res = resolution
    in_ch_mult = (1,) + tuple(ch_mult)
    defs.append(("conv", nf))
    block_in_ch = nf * in_ch_mult[0]
    for i in range(num_resolutions):
        block_in_ch = nf * in_ch_mult[i]
        block_out_ch = nf * ch_mult[i]
        for _ in range(num_res_blocks):
            defs.append(("res", block_out_ch))
            block_in_ch = block_out_ch
            if curr_res in attn_resolutions:
                defs.append(("attn", block_in_ch))
        if i != num_resolutions - 1:
            defs.append(("down", block_in_ch))
            curr_res = curr_res // 2
    defs.append(("res", block_in_ch))
    defs.append(("attn", block_in_ch))
    defs.append(("res", block_in_ch))
    defs.append(("norm", block_in_ch))
    defs.append(("conv", emb_dim))
    return defs


def generator_block_defs(nf: int, emb_dim: int, ch_mult: Sequence[int],
                         num_res_blocks: int, resolution: int,
                         attn_resolutions: Sequence[int],
                         out_channels: int = 3):
    """Block spec list mirroring Generator.__init__ (vqgan_arch.py:303-343)."""
    defs: List[Tuple[str, int]] = []
    num_resolutions = len(ch_mult)
    block_in_ch = nf * ch_mult[-1]
    curr_res = resolution // 2 ** (num_resolutions - 1)
    defs.append(("conv", block_in_ch))
    defs.append(("res", block_in_ch))
    defs.append(("attn", block_in_ch))
    defs.append(("res", block_in_ch))
    for i in reversed(range(num_resolutions)):
        block_out_ch = nf * ch_mult[i]
        for _ in range(num_res_blocks):
            defs.append(("res", block_out_ch))
            block_in_ch = block_out_ch
            if curr_res in attn_resolutions:
                defs.append(("attn", block_in_ch))
        if i != 0:
            defs.append(("up", block_in_ch))
            curr_res = curr_res * 2
    defs.append(("norm", block_in_ch))
    defs.append(("conv", out_channels))
    return defs


def make_blocks(defs, name_prefix: str):
    """Instantiate flax modules for a block def list (call inside setup)."""
    blocks = []
    for i, (kind, ch) in enumerate(defs):
        name = f"{name_prefix}_{i}"
        if kind == "conv":
            blocks.append(_ConvBlock(ch, name=name))
        elif kind == "res":
            blocks.append(VQGANResBlock(ch, name=name))
        elif kind == "attn":
            blocks.append(AttnBlock(name=name))
        elif kind == "down":
            blocks.append(Downsample(name=name))
        elif kind == "up":
            blocks.append(Upsample(name=name))
        elif kind == "norm":
            blocks.append(_NormBlock(name=name))
        else:
            raise ValueError(kind)
    return blocks


class Encoder(nn.Module):
    nf: int = 64
    emb_dim: int = 256
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    num_res_blocks: int = 2
    resolution: int = 256
    attn_resolutions: Sequence[int] = (32,)

    def setup(self):
        self.block_defs = encoder_block_defs(
            self.nf, self.emb_dim, self.ch_mult, self.num_res_blocks,
            self.resolution, self.attn_resolutions,
        )
        self.blocks = make_blocks(self.block_defs, "blocks")

    def __call__(self, x, taps: Sequence[int] = ()):
        """Run all blocks; return (latent, {block_idx: feature})."""
        tap_out = {}
        for i, block in enumerate(self.blocks):
            x = block(x)
            if i in taps:
                tap_out[i] = x
        return x, tap_out


class Generator(nn.Module):
    nf: int = 64
    emb_dim: int = 256
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    num_res_blocks: int = 2
    resolution: int = 256
    attn_resolutions: Sequence[int] = (32,)

    def setup(self):
        self.block_defs = generator_block_defs(
            self.nf, self.emb_dim, self.ch_mult, self.num_res_blocks,
            self.resolution, self.attn_resolutions,
        )
        self.blocks = make_blocks(self.block_defs, "blocks")

    def __call__(self, x):
        for block in self.blocks:
            x = block(x)
        return x


class VectorQuantizer(nn.Module):
    """Codebook parameter + quantize call (vqgan_arch.py:24-111)."""

    codebook_size: int
    emb_dim: int
    beta: float = 0.25

    def setup(self):
        bound = 1.0 / self.codebook_size
        self.embedding = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -bound, bound
            ),
            (self.codebook_size, self.emb_dim),
        )

    def __call__(self, z, start: int = 0, num: Optional[int] = None):
        return vq_quantize(z, self.embedding, self.beta, start, num)

    def codebook_slice(self, start: int = 0, num: Optional[int] = None):
        if num is None:
            num = self.codebook_size - start
        return jax.lax.slice(
            self.embedding, (start, 0), (start + num, self.emb_dim)
        )


class VQGANDiscriminator(nn.Module):
    """PatchGAN discriminator (vqgan_arch.py:535-575)."""

    nc: int = 3
    ndf: int = 64
    n_layers: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .layers import BatchNorm2d

        x = Conv2d(self.ndf, (4, 4), strides=(2, 2), padding=1,
                   name="conv0")(x)
        x = leaky_relu(x, 0.2)
        ndf_mult = 1
        for n in range(1, self.n_layers):
            ndf_mult = min(2 ** n, 8)
            x = Conv2d(self.ndf * ndf_mult, (4, 4), strides=(2, 2),
                       padding=1, use_bias=False, name=f"conv{n}")(x)
            x = BatchNorm2d(self.ndf * ndf_mult, name=f"bn{n}")(x, train)
            x = leaky_relu(x, 0.2)
        ndf_mult = min(2 ** self.n_layers, 8)
        x = Conv2d(self.ndf * ndf_mult, (4, 4), strides=(1, 1), padding=1,
                   use_bias=False, name=f"conv{self.n_layers}")(x)
        x = BatchNorm2d(self.ndf * ndf_mult, name=f"bn{self.n_layers}")(
            x, train
        )
        x = leaky_relu(x, 0.2)
        x = Conv2d(1, (4, 4), strides=(1, 1), padding=1, name="conv_out")(x)
        return x


class VQAutoEncoder(nn.Module):
    """Encoder -> VectorQuantizer -> Generator (vqgan_arch.py:467-530)."""

    img_size: int = 256
    nf: int = 64
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    codebook_size: int = 1024
    emb_dim: int = 256
    beta: float = 0.25

    def setup(self):
        self.encoder = Encoder(self.nf, self.emb_dim, self.ch_mult,
                               self.res_blocks, self.img_size,
                               self.attn_resolutions)
        self.quantize = VectorQuantizer(self.codebook_size, self.emb_dim,
                                        self.beta)
        self.generator = Generator(self.nf, self.emb_dim, self.ch_mult,
                                   self.res_blocks, self.img_size,
                                   self.attn_resolutions)

    def __call__(self, x):
        x, _ = self.encoder(x)
        quant, codebook_loss, quant_stats = self.quantize(x)
        x = self.generator(quant)
        return x, codebook_loss, quant_stats


class AutoEncoder(nn.Module):
    """Codebook-free AE (vqgan_arch.py:578-627)."""

    img_size: int = 256
    nf: int = 64
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    emb_dim: int = 256

    def setup(self):
        self.encoder = Encoder(self.nf, self.emb_dim, self.ch_mult,
                               self.res_blocks, self.img_size,
                               self.attn_resolutions)
        self.generator = Generator(self.nf, self.emb_dim, self.ch_mult,
                                   self.res_blocks, self.img_size,
                                   self.attn_resolutions)

    def __call__(self, x):
        x, _ = self.encoder(x)
        return self.generator(x)
