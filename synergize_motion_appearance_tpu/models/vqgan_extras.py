"""VQGAN variants completing the reference inventory.

Parity targets (archs/vqgan_arch.py): GumbelQuantizer (:114-141),
MSGenerator (:352-464), AutoEncoder_MSDecoder (:629-689); Fuse_feat_block
(appmotioncodebook_arch.py:54-62).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv2d, GroupNorm32
from .vqgan import (
    AttnBlock, Encoder, Upsample, VQGANResBlock,
)


class GumbelQuantizer(nn.Module):
    """Gumbel-softmax quantizer (:114-141). Needs an rng ('gumbel')
    during training."""

    codebook_size: int
    emb_dim: int
    num_hiddens: int
    straight_through: bool = False
    kl_weight: float = 5e-4
    temp_init: float = 1.0

    @nn.compact
    def __call__(self, z, train: bool = False):
        hard = self.straight_through if train else True
        logits = Conv2d(self.codebook_size, (1, 1), padding=0,
                        name="proj")(z)  # (B,H,W,K)
        embed = self.param(
            "embed", nn.initializers.normal(1.0),
            (self.codebook_size, self.emb_dim),
        )
        if train:
            g = jax.random.gumbel(
                self.make_rng("gumbel"), logits.shape, logits.dtype
            )
            y = jax.nn.softmax((logits + g) / self.temp_init, axis=-1)
        else:
            y = jax.nn.softmax(logits / self.temp_init, axis=-1)
        if hard:
            idx = jnp.argmax(y, axis=-1)
            y_hard = jax.nn.one_hot(idx, self.codebook_size, dtype=y.dtype)
            y = y + jax.lax.stop_gradient(y_hard - y)
        z_q = jnp.einsum("bhwk,kd->bhwd", y, embed)
        qy = jax.nn.softmax(logits, axis=-1)
        diff = self.kl_weight * jnp.mean(jnp.sum(
            qy * jnp.log(qy * self.codebook_size + 1e-10), axis=-1
        ))
        return z_q, diff, {"min_encoding_indices": jnp.argmax(y, axis=-1)}


class MSGenerator(nn.Module):
    """Multi-branch decoder: per-scale branches upsampled to full res and
    fused (:352-464). Branch i consumes the encoder tap at scale i."""

    nf: int = 64
    emb_dim: int = 256
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    res_blocks: int = 2
    img_size: int = 256
    attn_resolutions: Sequence[int] = (32,)
    out_channels: int = 3

    @nn.compact
    def __call__(self, x0, x1, x2, x3):
        """x0: lowest-res latent; x1..x3: encoder taps at 2x, 4x, 8x."""
        num_res = len(self.ch_mult)
        assert num_res == 4
        inputs = [x0, x1, x2, x3]
        branches = []
        for i, xin in enumerate(inputs):
            curr_res = self.img_size // 2 ** (num_res - i - 1)
            ch = self.nf * self.ch_mult[-1 - i]
            h = xin
            if i != num_res - 1:
                h = Conv2d(ch, (3, 3), padding=1, name=f"b{i}_conv_in")(h)
            if i == 0:
                h = VQGANResBlock(ch, name=f"b{i}_res_a")(h)
                h = AttnBlock(name=f"b{i}_attn_a")(h)
                h = VQGANResBlock(ch, name=f"b{i}_res_b")(h)
            for j in range(num_res - 1 - i):
                h = VQGANResBlock(ch, name=f"b{i}_res{j}")(h)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(name=f"b{i}_attn{j}")(h)
            if i != num_res - 1:
                for j in range(num_res - 1 - i):
                    h = Upsample(name=f"b{i}_up{j}")(h)
            branches.append(h)

        h = jnp.concatenate(branches, axis=-1)
        out_ch = self.nf * self.ch_mult[0]
        for j in range(self.res_blocks):
            h = VQGANResBlock(out_ch, name=f"fuse_res{j}")(h)
        h = GroupNorm32(name="norm_out")(h)
        return Conv2d(self.out_channels, (3, 3), padding=1,
                      name="conv_out")(h)


class AutoEncoderMSDecoder(nn.Module):
    """Encoder + MSGenerator with taps at {2x,4x,8x} (:629-689)."""

    img_size: int = 256
    nf: int = 64
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    emb_dim: int = 256

    def setup(self):
        from .appmotion_former import encoder_tap_indices

        self.encoder = Encoder(self.nf, self.emb_dim, self.ch_mult,
                               self.res_blocks, self.img_size,
                               self.attn_resolutions)
        self.generator = MSGenerator(self.nf, self.emb_dim, self.ch_mult,
                                     self.res_blocks, self.img_size,
                                     self.attn_resolutions)
        self.taps = encoder_tap_indices(
            self.nf, self.emb_dim, self.ch_mult, self.res_blocks,
            self.img_size, self.attn_resolutions,
        )

    def __call__(self, x):
        n = len(self.ch_mult)
        scales = [self.img_size // 2 ** (n - 1 - i) for i in range(n)]
        tap_idx = {self.taps[r]: r for r in scales[1:]}
        latent, feats = self.encoder(x, taps=tuple(tap_idx))
        by_res = {tap_idx[i]: f for i, f in feats.items()}
        return self.generator(
            latent, by_res[scales[1]], by_res[scales[2]], by_res[scales[3]]
        )


class FuseFeatBlock(nn.Module):
    """Residual concat-fusion (appmotioncodebook_arch.py:54-62)."""

    out_ch: int

    @nn.compact
    def __call__(self, enc_feat, dec_feat):
        res = VQGANResBlock(self.out_ch, name="encode_enc")(
            jnp.concatenate([enc_feat, dec_feat], axis=-1)
        )
        return dec_feat + res
