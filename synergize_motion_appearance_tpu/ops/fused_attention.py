"""Fused softmax-attention Pallas kernel for the codebook transformer.

The model's attention (transformer.py, parity with torch MHA at
appmotioncodebook_arch.py:65-126) runs over L=1024 spatial tokens against
K<=1024 keys (tokens or codebook entries) with head_dim as small as 4
(dim_embd_motion=32 / 8 heads). The naive einsum+softmax materializes the
(B, H, L, K) f32 score tensor in HBM — ~2 GB per attention at a 64-frame
batch — and re-reads it for exp/sum/AV, which profiling shows is the
single largest cost in the generator (~37 ms per transformer block).

At these sizes one (L, K) f32 score tile is only 4 MB: it fits in VMEM,
so no flash-style K-blocking is needed. Each grid program handles one
batch row and loops the (static) head count, keeping every intermediate
on-chip; HBM sees only q/k/v in and the (L, d) outputs.

Numerics: scores and softmax in f32 (an upgrade over the bf16 dense path;
max-subtracted, so exact for well-scaled inputs), AV in f32 accumulation.
Backward: custom_vjp recomputes via the dense jnp reference — training
uses the reference gradients; this kernel is the inference hot path.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# MEASURED DEAD END (2026-08-17, do not revive): casting the f32 softmax
# tile to bf16 for the AV dot made the kernel SLOWER (1572 vs 1471 us at
# (16,8,1024,1024,32)) — the AV dot is ~69 MFLOP (sub-microsecond on the
# MXU); the kernel is bound by VPU passes over the (L, K) tile, and the
# cast ADDS a pass. Fewer passes beat narrower ones.


def _dense_reference(q, k, v, bias):
    """jnp reference: q (B,H,L,d); k,v (B,H,K,d) — or (1,H,K,d) shared
    across the batch (codebook context); bias (B,K) additive."""
    d = q.shape[-1]
    if k.shape[0] == 1 and q.shape[0] != 1:
        k = jnp.broadcast_to(k, (q.shape[0],) + k.shape[1:])
        v = jnp.broadcast_to(v, (q.shape[0],) + v.shape[1:])
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) / math.sqrt(d)
    if bias is not None:
        scores = scores + bias[:, None, None, :].astype(jnp.float32)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.nan_to_num(attn)  # all-masked rows -> 0 (torch leaves NaN)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v.astype(jnp.float32))
    return out.astype(q.dtype)


def _attn_kernel(scale: float, masked: bool, *refs):
    """One (batch, head) per program: a single (L, K) f32 score tile lives
    in VMEM; grid pipelining overlaps the tiny q/k/v DMAs across programs."""
    if masked:
        q_ref, k_ref, v_ref, bias_ref, out_ref = refs
    else:
        q_ref, k_ref, v_ref, out_ref = refs
        bias_ref = None
    # QK dot in the INPUT dtype with f32 accumulation: bf16 inputs are
    # exactly representable either way, so this is numerically identical
    # to upcasting first — but the MXU's bf16 mode is ~8x the f32-mode
    # throughput. Scores/softmax stay f32.
    q = q_ref[0, 0]  # (L, d)
    k = k_ref[0, 0]  # (K, d)
    v = v_ref[0, 0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32) * scale  # (L, K)
    if bias_ref is not None:
        scores = scores + bias_ref[0]  # (1, K) broadcasts over L rows
    m = jnp.max(scores, axis=-1, keepdims=True)  # (L, 1)
    p = jnp.exp(scores - m)
    # softmax denominator via the MXU instead of a VPU reduce pass over
    # the (L, K) tile: a ones-column appended to V makes the AV dot also
    # emit row sums (profiled: the VPU passes over the score tile are
    # the kernel's bottleneck; this removes one of them). sum >= 1
    # always since exp(max - max) = 1, so the divide is safe.
    d = v.shape[-1]
    v1 = jnp.concatenate(
        [v, jnp.ones((v.shape[0], 1), jnp.float32)], axis=-1)
    num = jax.lax.dot_general(
        p, v1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (L, d + 1)
    out = num[:, :d] / num[:, d:]
    if bias_ref is not None:
        # every key masked (bias -inf on all): match the dense path's
        # nan_to_num -> zeros instead of exp(0)/K * mean(v)
        out = out * (m > -1e29).astype(jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_attention_pallas(q, k, v, bias, interpret=False):
    B, H, L, d = q.shape
    K = k.shape[2]
    scale = 1.0 / math.sqrt(d)
    masked = bias is not None
    kernel = functools.partial(_attn_kernel, scale, masked)
    # batch-shared k/v (codebook context arrives as (1, H, K, d)): every
    # program reads block row 0 — the kernel never materializes the
    # broadcast, so the 64x-redundant per-frame k/v projection+relayout
    # the dense path would need simply disappears
    kv_b = (lambda b, h: (b, h, 0, 0)) if k.shape[0] == B \
        else (lambda b, h: (0, h, 0, 0))
    in_specs = [
        pl.BlockSpec((1, 1, L, d), lambda b, h: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, K, d), kv_b, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, K, d), kv_b, memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if masked:
        # (B, 1, K) so the block's trailing dims equal the array's (a bare
        # (1, K) block violates the sublane-divisibility rule)
        in_specs.append(
            pl.BlockSpec((1, 1, K), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(bias.astype(jnp.float32).reshape(B, 1, K))
    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, L, d), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, L, d), q.dtype),
        interpret=interpret,
    )(*args)


@jax.custom_vjp
def fused_attention(q, k, v, bias=None):
    """Softmax attention, fused on TPU. q: (B,H,L,d); k,v: (B,H,K,d), or
    (1,H,K,d) to share one k/v across the batch (codebook context — the
    kernel indexes block row 0 instead of materializing the broadcast);
    bias: optional (B, K) additive mask (use -1e30 for excluded keys).
    Returns (B, H, L, d) in q's dtype."""
    return _fused_attention_impl(q, k, v, bias)


def _within_envelope(q, k):
    B, H, L, d = q.shape
    K = k.shape[2]
    # one f32 score tile + q/k/v/out per program must fit VMEM comfortably
    return (L * K * 4 + (2 * L + 2 * K) * max(d, 128) * 4) < 12 * 2 ** 20


def _fused_attention_impl(q, k, v, bias):
    import os

    if not _within_envelope(q, k):
        return _dense_reference(q, k, v, bias)
    # Multi-platform lowering (jax.export platforms=("cpu","tpu")) keeps
    # every platform_dependent branch and Pallas cannot lower on CPU, so
    # such exports must opt into the portable dense path. Single-platform
    # lowering resolves the branch statically: a tpu-targeted export from
    # a CPU host still embeds the Mosaic kernel.
    if os.environ.get("SAMT_PORTABLE_ATTENTION") == "1":
        return _dense_reference(q, k, v, bias)
    # platform_dependent resolves at LOWERING time, so a tpu-targeted
    # jax.export artifact (serving.py) keeps the Pallas kernel while cpu
    # lowering takes the dense path
    if bias is None:
        return jax.lax.platform_dependent(
            q, k, v,
            tpu=lambda q_, k_, v_: _fused_attention_pallas(q_, k_, v_,
                                                           None),
            default=lambda q_, k_, v_: _dense_reference(q_, k_, v_, None),
        )
    return jax.lax.platform_dependent(
        q, k, v, bias,
        tpu=_fused_attention_pallas,
        default=_dense_reference,
    )


def _fwd(q, k, v, bias):
    return _fused_attention_impl(q, k, v, bias), (q, k, v, bias)


def _bwd(res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _dense_reference(q_, k_, v_, bias),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


fused_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Head-packed variant: (B, L, E) in, (B, L, E) out — no (B, H, L, d)
# intermediates. With d = E/H as small as 4 (motion transformer: E=32,
# H=8), the head-split layout pads the lane dim 4 -> 128, i.e. 32x HBM
# padding on q/k/v/out PLUS a relayout pass each way (traced at ~18 ms
# per 64-frame generation). Here the heads never leave the kernel: each
# grid program holds one batch row's (L, E) q tile and loops the static
# head count, reading/writing lane slices [h*d:(h+1)*d] in VMEM.
# ---------------------------------------------------------------------------


def _dense_reference_packed(num_heads, q, k, v, bias):
    """(B, L, E) layout reference: reshape to heads, run the dense
    reference, merge back. k/v may be (K, E) for a batch-shared context."""
    B, L, E = q.shape
    d = E // num_heads
    K = k.shape[-2]

    def split(t):
        if t.ndim == 2:
            return t.reshape(1, K, num_heads, d).transpose(0, 2, 1, 3)
        return t.reshape(t.shape[0], t.shape[1], num_heads, d)\
                .transpose(0, 2, 1, 3)

    out = _dense_reference(split(q), split(k), split(v), bias)
    return out.transpose(0, 2, 1, 3).reshape(B, L, E)


def _attn_kernel_packed(scale: float, masked: bool, H: int, *refs):
    """One batch row per program; static python loop over heads with
    lane-slice reads/writes — same per-head math as `_attn_kernel`."""
    if masked:
        q_ref, k_ref, v_ref, bias_ref, out_ref = refs
    else:
        q_ref, k_ref, v_ref, out_ref = refs
        bias_ref = None
    q = q_ref[0]  # (L, E)
    k = k_ref[0]  # (K, E)
    v = v_ref[0]  # (K, E)
    E = q.shape[-1]
    d = E // H
    for h in range(H):
        sl = slice(h * d, (h + 1) * d)
        qh = q[:, sl]
        kh = k[:, sl]
        vh = v[:, sl].astype(jnp.float32)
        scores = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32) * scale  # (L, K)
        if bias_ref is not None:
            scores = scores + bias_ref[0]  # (1, K) broadcasts over L
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        v1 = jnp.concatenate(
            [vh, jnp.ones((vh.shape[0], 1), jnp.float32)], axis=-1)
        num = jax.lax.dot_general(
            p, v1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (L, d + 1)
        out_h = num[:, :d] / num[:, d:]
        if bias_ref is not None:
            out_h = out_h * (m > -1e29).astype(jnp.float32)
        out_ref[0, :, sl] = out_h.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _fused_attention_packed_pallas(num_heads, q, k, v, bias,
                                   interpret=False):
    B, L, E = q.shape
    k3 = k[None] if k.ndim == 2 else k
    v3 = v[None] if v.ndim == 2 else v
    K = k3.shape[1]
    scale = 1.0 / math.sqrt(E // num_heads)
    masked = bias is not None
    kernel = functools.partial(_attn_kernel_packed, scale, masked,
                               num_heads)
    kv_b = (lambda b: (b, 0, 0)) if k3.shape[0] == B \
        else (lambda b: (0, 0, 0))
    in_specs = [
        pl.BlockSpec((1, L, E), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, E), kv_b, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, E), kv_b, memory_space=pltpu.VMEM),
    ]
    args = [q, k3, v3]
    if masked:
        in_specs.append(
            pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(bias.astype(jnp.float32).reshape(B, 1, K))
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, L, E), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, E), q.dtype),
        interpret=interpret,
    )(*args)


def _within_envelope_packed(L, K, E):
    # per program: one (L, K) f32 score tile + q/out (L, E) + k/v (K, E)
    # (bf16/f32) + per-head f32 copies; lane-padded to >=128
    ep = max(E, 128)
    return (L * K * 4 + (2 * L + 2 * K) * ep * 4) < 12 * 2 ** 20


def _fused_attention_packed_impl(num_heads, q, k, v, bias):
    import os

    B, L, E = q.shape
    K = k.shape[-2]
    if not _within_envelope_packed(L, K, E) \
            or os.environ.get("SAMT_PORTABLE_ATTENTION") == "1":
        return _dense_reference_packed(num_heads, q, k, v, bias)
    kernel = functools.partial(_fused_attention_packed_pallas, num_heads)
    dense = functools.partial(_dense_reference_packed, num_heads)
    if bias is None:
        return jax.lax.platform_dependent(
            q, k, v,
            tpu=lambda q_, k_, v_: kernel(q_, k_, v_, None),
            default=lambda q_, k_, v_: dense(q_, k_, v_, None),
        )
    return jax.lax.platform_dependent(
        q, k, v, bias, tpu=kernel, default=dense)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_attention_packed(num_heads, q, k, v, bias):
    return _fused_attention_packed_impl(num_heads, q, k, v, bias)


def _packed_fwd(num_heads, q, k, v, bias):
    return _fused_attention_packed_impl(num_heads, q, k, v, bias), \
        (q, k, v, bias)


def _packed_bwd(num_heads, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _dense_reference_packed(num_heads, q_, k_, v_,
                                                   bias),
        q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_fused_attention_packed.defvjp(_packed_fwd, _packed_bwd)


def fused_attention_packed(q, k, v, bias=None, *, num_heads):
    """Softmax attention in token-major layout. q: (B, L, E); k, v:
    (B, K, E), or (K, E) to share one context across the batch (the
    codebook — the kernel indexes block row 0); bias: optional (B, K)
    additive mask. Returns (B, L, E) in q's dtype — heads are split,
    attended, and merged entirely inside the kernel (no padded
    (B, H, L, d) intermediates in HBM)."""
    return _fused_attention_packed(num_heads, q, k, v, bias)
