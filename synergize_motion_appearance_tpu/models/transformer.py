"""Codebook cross-attention transformer layer.

Parity target: TransformerLayer (appmotioncodebook_arch.py:65-126):
pre-LN self-attention (pos emb on q,k), cross-attention against codebook
entries (k=v=context, pos only on q), and a conv-FFN (3x3 convs over the
spatial reshape of the token grid) instead of an MLP.

Layout: batch-first (B, L, E) — the reference uses torch's seq-first
(L, B, E); math is identical. Attention is plain dense attention: L=1024
tokens and K<=1024 codebook entries make one (B*h, L, K) score tensor a
few MB — XLA fuses softmax into the matmuls; no flash attention needed at
this size.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv2d, LayerNorm


def _xavier_packed_init(key, shape, dtype=jnp.float32):
    """xavier_uniform over the torch-packed (3E, E) in_proj weight."""
    e = shape[-1]
    bound = math.sqrt(6.0 / (4.0 * e))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class MultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention parity (packed qkv proj + out proj)."""

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask: Optional[jnp.ndarray] = None):
        """q: (B, Lq, E); k, v: (B, Lk, E) — or (Lk, E) unbatched for a
        batch-shared context (the codebook): its projection + head
        relayout then run once instead of per batch element, and the
        fused attention kernel reads the single copy directly;
        key_padding_mask: (B, Lk) bool, True = exclude key."""
        E, H = self.embed_dim, self.num_heads

        wq = self.param("wq", _xavier_packed_init, (E, E))
        wk = self.param("wk", _xavier_packed_init, (E, E))
        wv = self.param("wv", _xavier_packed_init, (E, E))
        b_in = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,))

        from .layers import torch_linear_kernel_init

        wo = self.param("out_proj_kernel", torch_linear_kernel_init, (E, E))
        bo = self.param("out_proj_bias", nn.initializers.zeros, (E,))

        B, Lq, _ = q.shape
        qp = q @ wq + b_in[:E]
        kp = k @ wk + b_in[E:2 * E]
        vp = v @ wv + b_in[2 * E:]

        # head-packed fused attention: heads are split/merged INSIDE the
        # kernel via lane slices, so no (B, H, Lq, d) tensor ever hits
        # HBM — with d = E/H as small as 4 (motion blocks) the head
        # layout lane-pads 32x and cost ~18 ms of relayouts per 64-frame
        # generation (docs/PERF.md §9.3). All-masked rows -> 0, matching
        # the nan_to_num guard of the dense reference (CPU fallback).
        from ..ops.fused_attention import fused_attention_packed

        bias = None
        if key_padding_mask is not None:
            bias = jnp.where(key_padding_mask, -1e30, 0.0).astype(
                jnp.float32)
        out = fused_attention_packed(qp, kp, vp, bias, num_heads=H)
        return out @ wo + bo


class TransformerLayer(nn.Module):
    embed_dim: int
    nhead: int = 8
    dim_conv: int = 64

    @nn.compact
    def __call__(self, tgt, context, hw, key_padding_mask=None,
                 query_pos=None):
        """tgt: (B, L, E); context: (B, K, E), or (K, E) batch-shared
        (the codebook — projected once, not per batch element);
        hw: (h, w) with h*w == L."""
        h, w = hw
        B, L, E = tgt.shape

        def with_pos(t, pos):
            return t if pos is None else t + pos

        # self attention (pre-LN)
        tgt2 = LayerNorm(name="norm1")(tgt)
        q = with_pos(tgt2, query_pos)
        sa = MultiheadAttention(E, self.nhead, name="self_attn")(
            q, q, tgt2, key_padding_mask=key_padding_mask
        )
        tgt = tgt + sa

        # cross attention against codebook context
        tgt2 = LayerNorm(name="norm2")(tgt)
        q = with_pos(tgt2, query_pos)
        ca = MultiheadAttention(E, self.nhead, name="cross_attn")(
            q, context, context
        )
        tgt = tgt + ca

        # conv FFN over the spatial grid
        tgt2 = LayerNorm(name="norm3")(tgt)
        grid = tgt2.reshape(B, h, w, E)
        grid = Conv2d(self.dim_conv, (3, 3), padding=1, name="conv1")(grid)
        grid = jax.nn.gelu(grid, approximate=False)
        grid = Conv2d(E, (3, 3), padding=1, name="conv2")(grid)
        tgt = tgt + grid.reshape(B, L, E)
        return tgt
