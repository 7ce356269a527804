"""Shared flax building blocks with torch-parity initialization.

Initializers reproduce torch defaults (kaiming_uniform(a=sqrt(5)) for conv /
linear weights, U(+-1/sqrt(fan_in)) for biases) so training dynamics match
the reference from step 0. All modules are NHWC.

Note on synchronized batch-norm: the reference vendors a master/slave
sync-BN (sync_batchnorm/batchnorm.py:38-315) that only syncs across
DataParallel replicas and silently degrades to per-GPU BN under DDP
(SURVEY.md section 2.3). Here batch statistics are plain jnp.mean over the
batch axis of a *globally sharded* array inside jit, so XLA inserts the
cross-chip psum automatically — true cross-replica sync-BN with zero
bespoke machinery.
"""
from __future__ import annotations

import contextlib
import contextvars
import functools
import math
import os
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name


# ---------------------------------------------------------------------------
# torch-parity initializers
# ---------------------------------------------------------------------------

def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """kaiming_uniform(a=sqrt(5)) on flax (kh, kw, in, out) kernels."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _shift_cols(x, kh, kw, strides, padding):
    """im2col as kh*kw shifted strided slices concat on the channel dim."""
    sh, sw = strides
    (pt, pb), (pl, pr) = padding
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    Hp, Wp = xp.shape[1], xp.shape[2]
    Ho = (Hp - kh) // sh + 1
    Wo = (Wp - kw) // sw + 1
    cols = [
        xp[:, i:i + sh * (Ho - 1) + 1:sh, j:j + sw * (Wo - 1) + 1:sw, :]
        for i in range(kh) for j in range(kw)
    ]
    return jnp.concatenate(cols, axis=-1)  # (B, Ho, Wo, kh*kw*C)


def _flat_taps(x, kh, kw, padding):
    """Stride-1 im2col with the spatial pad done on a (B, H, W*C) view.

    jnp.pad of an NHWC tensor with C<=8 materializes in a (H*W, C, B)
    {1,2,0:T(2,128)} layout in large graphs — a 42x tile-padded DMA
    relayout measured at ~1.4 ms per pad on v5e at 258² (docs/PERF.md
    §8). Padding the flattened (W*C)-minor view (lane-aligned) and
    slicing taps at j*C offsets avoids that layout class entirely.
    Returns (B, Ho, kh*kw, Wo, C)."""
    (pt, pb), (pl, pr) = padding
    B, H, W, C = x.shape
    xf = x.reshape(B, H, W * C)
    xpf = jnp.pad(xf, ((0, 0), (pt, pb), (pl * C, pr * C)))
    Ho = H + pt + pb - kh + 1
    Wo = W + pl + pr - kw + 1
    taps = jnp.stack(
        [xpf[:, i:i + Ho, j * C:(j + Wo) * C]
         for i in range(kh) for j in range(kw)], axis=2)
    return taps.reshape(B, Ho, kh * kw, Wo, C)


def _shift_conv_impl(x, kernel, strides, padding):
    kh, kw, cin, cout = kernel.shape
    if strides == (1, 1) and cin <= _SMALL_CH:
        taps = _flat_taps(x, kh, kw, padding)  # (B,Ho,k²,Wo,C)
        return jax.lax.dot_general(
            taps, kernel.reshape(kh * kw, cin, cout),
            (((2, 4), (0, 1)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
    patches = _shift_cols(x, kh, kw, strides, padding)
    return jnp.matmul(patches, kernel.reshape(kh * kw * cin, cout),
                      precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _shift_conv(x, kernel, strides, padding):
    """Conv as shifted slices + one MXU matmul, with a custom VJP so the
    input-gradient is ALSO a shift+matmul (full correlation with the
    spatially-flipped, channel-transposed kernel).

    Plain autodiff of the concat-of-slices forward emits kh*kw per-tap
    pad-and-accumulate fusions on the small-channel tensor — measured
    ~1.4 ms EACH on v5e at 256² (the (66564,3,2)-shaped custom fusions
    in docs/PERF.md §8). The custom backward replaces them with one
    concat + one matmul. Only used for stride 1; strided callers take
    the autodiff path.
    """
    return _shift_conv_impl(x, kernel, strides, padding)


def _shift_conv_fwd(x, kernel, strides, padding):
    return _shift_conv_impl(x, kernel, strides, padding), (x, kernel)


def _shift_conv_bwd(strides, padding, res, dy):
    x, kernel = res
    kh, kw, cin, cout = kernel.shape
    if strides == (1, 1) and cin <= _SMALL_CH:
        taps = _flat_taps(x, kh, kw, padding)  # (B,H,k²,W,C)
        dK = jnp.einsum("bhtwc,bhwf->tcf", taps, dy,
                        precision=jax.lax.Precision.HIGHEST)
        dK = dK.reshape(kh, kw, cin, cout)
    else:
        patches = _shift_cols(x, kh, kw, strides, padding)
        dK = jnp.einsum("bhwk,bhwf->kf", patches, dy,
                        precision=jax.lax.Precision.HIGHEST)
        dK = dK.reshape(kh, kw, cin, cout)
    # dX[i] = sum_k dy[i - k + p] K[k]^T  ==  corr(dy, flip(K)^T) with
    # pad (k-1-p) — the same shift+matmul conv with a flipped,
    # channel-transposed kernel (stride 1 only)
    (pt, pb), (pl, pr) = padding
    kflip = kernel[::-1, ::-1].transpose(0, 1, 3, 2)  # (kh,kw,cout,cin)
    dX = _shift_conv_impl(
        dy, kflip, (1, 1),
        ((kh - 1 - pt, kh - 1 - pb), (kw - 1 - pl, kw - 1 - pr)))
    return dX, dK


_shift_conv.defvjp(_shift_conv_fwd, _shift_conv_bwd)


class _ShiftMatmulConv(nn.Module):
    """Conv computed as kh*kw shifted slices + ONE MXU matmul.

    v5e trace evidence (docs/PERF.md §8): any conv_general_dilated whose
    input OR output channel count is tiny (the RGB stems/heads: VGG
    conv0, kp-detector stem after the antialias downsample, PatchGAN
    conv0, the generator's final RGB convs) lowers to XLA conv emitters
    running at 0.05-1.5 TF/s — and their autodiff *gradients* (e.g. the
    VGG conv0 input-grad feeding the image cotangent) are the single
    worst ops in the train step (11 ms each at 0.06 TF/s). Expressing
    the conv as an im2col concat (minor-dim kh*kw*C stays lane-resident)
    contracted by one dot makes the forward AND both backwards (via
    `_shift_conv`'s custom VJP) matmul-shaped. Param names/shapes are
    identical to nn.Conv ("kernel" (kh,kw,in,out) + "bias"), so
    checkpoints are interchangeable.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[Tuple[int, int], Tuple[int, int]]
    use_bias: bool
    dtype: Any
    kernel_init: Any
    bias_init: Any

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, in_ch, self.features))
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        pad = tuple(tuple(p) for p in self.padding)
        if self.strides == (1, 1) and all(
                k - 1 - p >= 0 for k, pp in
                zip(self.kernel_size, pad) for p in pp):
            y = _shift_conv(x, kernel, (1, 1), pad)
        else:
            y = _shift_conv_impl(x, kernel, tuple(self.strides), pad)
        if bias is not None:
            y = y + bias
        return y


class _WLConv(nn.Module):
    """Conv applied to a (B, H, C, W) W-in-lanes activation.

    3x3/stride-1/pad-1 convs run the shuffle-free Pallas kernel
    (ops/pallas_conv_wl.py — measured 1.6x XLA's conv at the decoder's
    256²xC64 shape, docs/PERF.md §15); 1x1 convs are a sublane-dim
    einsum; anything else transposes to NHWC, runs lax.conv, and
    transposes back. Param names/shapes are identical to nn.Conv
    ("kernel" (kh,kw,in,out) + "bias"), so checkpoints are
    interchangeable with the NHWC graph.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[Tuple[int, int], Tuple[int, int]]
    groups: int
    use_bias: bool
    dtype: Any
    kernel_init: Any
    bias_init: Any

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas_conv_wl import conv3x3_wl_ad, pick_block_rows

        kh, kw = self.kernel_size
        B, H, C, W = x.shape
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, C // self.groups, self.features))
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        interp = jax.default_backend() != "tpu"
        pad = tuple(tuple(p) for p in self.padding)

        if ((kh, kw) == (3, 3) and self.strides == (1, 1)
                and pad == ((1, 1), (1, 1)) and self.groups == 1
                and (interp or (W % 128 == 0 and H % 8 == 0))):
            # VMEM-model block_rows choice (big-C f32 shapes, e.g. the
            # 128² fuse conv at C=256, OOM the 16 MB scoped budget at
            # br=32 otherwise — measured, PERF.md §15)
            br = pick_block_rows(H, W, C, self.features,
                                 x.dtype.itemsize)
        else:
            br = None

        if br is not None:
            # the _ad wrapper carries the custom VJP (dgrad on the same
            # Pallas kernel, wgrad as 9 MXU contractions) so the WL
            # layout is usable inside the train graph too
            y = conv3x3_wl_ad(
                br, interp, x, kernel,
                bias if bias is not None
                else jnp.zeros((self.features,), x.dtype))
        elif ((kh, kw) == (1, 1) and self.strides == (1, 1)
              and pad == ((0, 0), (0, 0)) and self.groups == 1):
            y = jnp.einsum("bhcw,co->bhow", x, kernel[0, 0])
            if bias is not None:
                y = y + bias[:, None]
        else:
            y = jax.lax.conv_general_dilated(
                from_wl(x), kernel, self.strides, pad,
                feature_group_count=self.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if bias is not None:
                y = y + bias
            y = to_wl(y)
        return y


# Channel-count threshold below which the conv emitters are pathological
# (bf16 lane tile 128: minor dims this small tile-pad >=16x). Overridable
# for perf experiments (tools/bench_conv_b2.py): raising it routes
# mid-channel convs through the shift+matmul form too.
_SMALL_CH = int(os.environ.get("SAMT_SHIFT_CONV_MAX_CH", "8"))

# Trace-scoped routing for small-OUTPUT-channel convs (see Conv2d). A
# ContextVar so loader/prefetch threads can't leak the train setting
# into an inference trace. Param trees are identical either way, so the
# same checkpoint drives both graphs.
_COUT_SHIFT = contextvars.ContextVar("samt_cout_shift_convs",
                                     default=False)


@contextlib.contextmanager
def cout_shift_convs(enable: bool = True):
    """Scope (around a jit TRACE) in which Conv2d routes cout<=8 convs
    through the shift+matmul form — the train-step recipe. Inference
    traces leave this off (lax.conv measured 2.9-5.6x faster there)."""
    tok = _COUT_SHIFT.set(enable)
    try:
        yield
    finally:
        _COUT_SHIFT.reset(tok)


# Trace-scoped W-in-lanes activation layout (docs/PERF.md §4/§15): inside
# a `wl_layout()` scope, layout-aware modules (Conv2d, GroupNorm32, the
# vqgan decoder blocks) treat activations as (B, H, C, W) — W in lanes,
# C in sublanes — so 3x3 convs run on the shuffle-free Pallas kernel
# (ops/pallas_conv_wl.py). Param trees are identical either way.
_WL_LAYOUT = contextvars.ContextVar("samt_wl_layout", default=False)


def wl_active() -> bool:
    """True while tracing inside a wl_layout() scope."""
    return _WL_LAYOUT.get()


@contextlib.contextmanager
def wl_layout(enable: bool = True):
    """Scope (around a jit TRACE) in which activations are (B, H, C, W)."""
    tok = _WL_LAYOUT.set(enable)
    try:
        yield
    finally:
        _WL_LAYOUT.reset(tok)


def to_wl(x, name=None):
    """(B, H, W, C) -> (B, H, C, W).

    ``name="wl_edge"`` remat-names the transpose: under selective remat
    the layout copy XLA emits for it is elementwise-class and would
    re-run in the backward's re-forward; saving it keeps that transpose
    a once-per-step cost (measured A/B docs/PERF.md §18). Only the WL
    REGION boundaries in appmotion_former pass the name — the per-conv
    fallback transposes (Conv2d._call_wl) and the AttnBlock/Downsample
    shims stay unnamed so residency matches what the trainer comment
    describes.
    """
    y = jnp.swapaxes(x, 2, 3)
    return _checkpoint_name(y, name) if name else y


def from_wl(x, name=None):
    """(B, H, C, W) -> (B, H, W, C). Remat naming like to_wl."""
    y = jnp.swapaxes(x, 2, 3)
    return _checkpoint_name(y, name) if name else y


class Conv2d(nn.Module):
    """nn.Conv with torch-default init and torch padding semantics."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 0  # int, tuple, or flax padding spec
    groups: int = 1
    use_bias: bool = True
    dtype: Any = None
    kernel_init: Any = None  # defaults to torch conv init
    bias_init: Any = None  # defaults to torch uniform(+-1/sqrt(fan_in))

    @nn.compact
    def __call__(self, x):
        if _WL_LAYOUT.get():
            return self._call_wl(x)
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        fan_in = kh * kw * in_ch // self.groups
        # Small-INPUT-channel convs (RGB/flow stems: VGG conv0, kp stem,
        # PatchGAN conv0, BasicMotionEncoder flow convs) always take the
        # shift+matmul form. Small-OUTPUT-channel heads (RGB head 64->3,
        # RefineFlow 128->2/1) are workload-dependent: at inference fb=64
        # the kh*kw*Cin patch materialization measured 2.9-5.6x slower
        # than lax.conv (tools/bench_small_cout.py), but inside the TRAIN
        # graph the shift form is a net -18 ms/step at batch 2 (202->184
        # ms — the isolated microbench misses the layout pollution the
        # lane-padded cout emitters inflict on their grad neighbors).
        # The trainer scopes `cout_shift_convs()` around its step trace;
        # inference graphs keep lax.conv. docs/PERF.md §9.
        if (self.groups == 1 and (kh, kw) != (1, 1)
                and isinstance(pad, tuple)
                and (in_ch <= _SMALL_CH
                     or (_COUT_SHIFT.get()
                         and self.features <= _SMALL_CH))):
            y = _ShiftMatmulConv(
                features=self.features,
                kernel_size=self.kernel_size,
                strides=self.strides,
                padding=pad,
                use_bias=self.use_bias,
                kernel_init=self.kernel_init or torch_conv_kernel_init,
                bias_init=self.bias_init or torch_bias_init(fan_in),
                dtype=self.dtype,
                name="Conv_0",
            )(x)
        else:
            y = nn.Conv(
                features=self.features,
                kernel_size=self.kernel_size,
                strides=self.strides,
                padding=pad,
                feature_group_count=self.groups,
                use_bias=self.use_bias,
                kernel_init=self.kernel_init or torch_conv_kernel_init,
                bias_init=self.bias_init or torch_bias_init(fan_in),
                dtype=self.dtype,
            )(x)
        # anchor for SELECTIVE rematerialization (trainer remat:
        # "selective"): jax.checkpoint(policy=save_only_these_names)
        # keeps conv outputs resident and recomputes only the cheap
        # elementwise/norm ops between them. No-op outside jax.checkpoint.
        return _checkpoint_name(y, "conv_out")

    def _call_wl(self, x):
        """W-in-lanes layout: x is (B, H, C, W); see wl_layout()."""
        in_ch = x.shape[2]
        kh, kw = self.kernel_size
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, str):
            # flax string specs ("SAME"/"VALID") would reach _WLConv as
            # garbage (`tuple(tuple(p) for p in pad)` iterates the
            # characters) — resolve the two common ones, reject the rest
            if pad.upper() == "VALID":
                pad = ((0, 0), (0, 0))
            elif pad.upper() == "SAME" and self.strides in ((1, 1), [1, 1]):
                pad = tuple(((k - 1) // 2, k // 2) for k in (kh, kw))
            else:
                raise NotImplementedError(
                    f"padding={self.padding!r} with strides="
                    f"{self.strides} is not supported under wl_layout()")
        fan_in = kh * kw * in_ch // self.groups
        y = _WLConv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=tuple(self.strides),
            padding=pad,
            groups=self.groups,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init or torch_conv_kernel_init,
            bias_init=self.bias_init or torch_bias_init(fan_in),
            dtype=self.dtype,
            name="Conv_0",
        )(x)
        return _checkpoint_name(y, "conv_out")


class _DenseParams(nn.Module):
    """(kernel, bias) holder named "Dense_0" inside Dense so the param
    tree matches flax nn.Dense (and the checkpoint converter)."""

    fan_in: int
    features: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_linear_kernel_init,
                            (self.fan_in, self.features))
        bias = self.param("bias", torch_bias_init(self.fan_in),
                          (self.features,)) if self.use_bias else None
        return kernel, bias


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, patch: Optional[int] = None,
                 transpose_patch: Optional[int] = None):
        """Standard dense layer, plus two patch-embedding application
        modes with identical params and math to a stride-p conv /
        transposed conv (token inner order (p_row, p_col, C)):

        * ``patch=p``: (B, r, r, C) -> (B, r/p, r/p, E) patch embed as
          space-to-depth + one matmul.
        * ``transpose_patch=p``: the inverse; tokens (B, t, t, E) ->
          (B, t*p, t*p, C) with features == p*p*C, as matmul +
          depth-to-space.
        """
        if patch is not None:
            fan_in = x.shape[-1] * patch * patch
        else:
            fan_in = x.shape[-1]
        kernel, bias = _DenseParams(fan_in, self.features, self.use_bias,
                                    name="Dense_0")()
        kernel = kernel.astype(x.dtype)
        if patch is not None:
            p, c = patch, x.shape[-1]
            B, H, W, _ = x.shape
            th, tw = H // p, W // p
            # space-to-depth (p*c-contiguous DMA blocks) + ONE MXU
            # matmul. Profiled on v5e: the stride-p conv form hits XLA's
            # AllBatchInSublanes emitter at ~40x off roofline (14.5 ms
            # for app_feat_emb_256 vs ~0.4 ms of matmul); the relayout
            # here costs ~1/5 of that.
            xr = x.reshape(B, th, p, tw, p * c)
            xr = xr.transpose(0, 1, 3, 2, 4).reshape(B, th, tw, p * p * c)
            y = xr @ kernel
        elif transpose_patch is not None:
            # inverse: dense to (py, px, c) patch pixels + depth-to-space
            p = transpose_patch
            c = self.features // (p * p)
            B, th, tw, _ = x.shape
            y = x @ kernel
            if bias is not None:
                y = y + bias.astype(y.dtype)
            y = y.reshape(B, th, tw, p, p * c).transpose(0, 1, 3, 2, 4)
            return _checkpoint_name(
                y.reshape(B, th * p, tw * p, c), "dense_out")
        else:
            y = x @ kernel
        if bias is not None:
            y = y + bias.astype(y.dtype)
        # selective-remat anchor (see Conv2d)
        return _checkpoint_name(y, "dense_out")


class BatchNorm2d(nn.Module):
    """torch BatchNorm2d parity (momentum 0.1, eps 1e-5, affine).

    train=True uses (globally synced) batch stats and updates running
    stats in the 'batch_stats' collection; train=False uses running stats.
    """

    features: int
    momentum: float = 0.1  # torch convention
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum,
            epsilon=self.epsilon,
            use_bias=True,
            use_scale=True,
            dtype=None,
        )(x)
        # stats in f32, output in the input dtype — stops f32 contagion
        # through bf16 inference graphs
        return y.astype(x.dtype)


class _AffineParams(nn.Module):
    """Bare (scale, bias) parameter holder. Named "GroupNorm_0" inside
    GroupNorm32 so the param tree matches flax nn.GroupNorm (and the
    torch<->flax checkpoint converter's `gn` mapping)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class GroupNorm32(nn.Module):
    """torch GroupNorm(num_groups=32, eps=1e-6, affine) — vqgan `normalize`
    (archs/vqgan_arch.py:14-15). Falls back to `features` groups when the
    channel count is below 32 (torch would error; we only hit this in tiny
    test configs).

    Folded-affine implementation: group statistics reduce in f32, then the
    normalize+affine collapses to one per-(batch, channel) multiply-add
    applied in the *input* dtype — under bf16 inference no f32 tensor of
    the activation's full size is ever materialized (flax nn.GroupNorm
    normalizes in f32 before casting, which doubles HBM traffic at 256²).
    """

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        wl = _WL_LAYOUT.get()
        c = x.shape[2] if wl else x.shape[-1]
        groups = 32 if c % 32 == 0 else math.gcd(c, 32)
        scale, bias = _AffineParams(c, name="GroupNorm_0")()
        b = x.shape[0]
        if wl:
            # (B, H, C, W): group stats over (H, C-in-group, W), affine
            # broadcast over (1, C, 1)
            B_, H_, _, W_ = x.shape
            xg = x.astype(jnp.float32).reshape(
                b, H_, groups, c // groups, W_)
            mean = jnp.mean(xg, axis=(1, 3, 4))
            var = jnp.mean(jnp.square(xg), axis=(1, 3, 4)) - jnp.square(mean)
            rstd = jax.lax.rsqrt(var + self.epsilon)      # (b, groups) f32
            a = jnp.repeat(rstd, c // groups, axis=-1) * scale[
                None, :].astype(jnp.float32)
            t = bias[None, :].astype(jnp.float32) - jnp.repeat(
                mean, c // groups, axis=-1) * a
            bshape = (b, 1, c, 1)
            return x * a.reshape(bshape).astype(x.dtype) + t.reshape(
                bshape).astype(x.dtype)
        xg = x.astype(jnp.float32).reshape(b, -1, groups, c // groups)
        mean = jnp.mean(xg, axis=(1, 3))
        var = jnp.mean(jnp.square(xg), axis=(1, 3)) - jnp.square(mean)
        rstd = jax.lax.rsqrt(var + self.epsilon)          # (b, groups) f32
        # y = (x - mean)*rstd*scale + bias  ==  x*a + t, folded per (b, c)
        a = jnp.repeat(rstd, c // groups, axis=-1) * scale[None, :].astype(
            jnp.float32)
        t = bias[None, :].astype(jnp.float32) - jnp.repeat(
            mean, c // groups, axis=-1) * a
        bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
        return x * a.reshape(bshape).astype(x.dtype) + t.reshape(
            bshape).astype(x.dtype)


class LayerNorm(nn.Module):
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon)(x).astype(x.dtype)


def swish(x):
    return x * jax.nn.sigmoid(x)


def leaky_relu(x, negative_slope=0.2):
    return jax.nn.leaky_relu(x, negative_slope)
