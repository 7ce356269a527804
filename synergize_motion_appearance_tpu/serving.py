"""AOT-compiled serving artifacts for the reenactment pipeline.

The reference deploys by shipping Python + torch checkpoints and paying
module construction + eager dispatch on every process start
(basicsr/demo.py:136-200 rebuilds both networks and loops frame-by-frame).
The TPU-native serving story is ahead-of-time export: `jax.export`
serializes the three jitted pipeline stages (keypoint extraction, source
encode, batched generation) to StableHLO once, and a server process
deserializes them and runs inference WITHOUT building the flax modules or
re-tracing Python model code — weights travel alongside as a flat array
archive. Cold-start work drops to deserialization + XLA compile of the
canned StableHLO (which hits the persistent compilation cache).

Artifact layout (one directory):
    manifest.json   pipeline flags, stage shapes/dtypes, format version
    kp1.bin         kp stage, batch 1 (source / driving[0])
    kpN.bin         kp stage, batch = frame_batch (driving chunks)
    enc.bin         source-encoder sweep, batch 1
    gen.bin         full generation step, frame_batch frames
    params.npz      flattened {net}/{collection}/{module path} arrays

Stages are exported with the network variables as ARGUMENTS (matching
inference.ReenactmentPipeline's jit structure), so the same artifact can
serve updated weights of identical shape without re-exporting.

By default a stage is exported for the platform the exporter runs on.
``platforms=("tpu",)`` cross-compiles a TPU artifact from any host and
still embeds the Pallas attention kernel (platform selection happens at
lowering via lax.platform_dependent, ops/fused_attention.py). A genuinely
multi-platform ``platforms=("cpu", "tpu")`` artifact must lower every
branch for every platform, which Pallas cannot do on CPU, so those
exports trace the portable dense paths instead.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence

import numpy as np

FORMAT_VERSION = 1
_STAGES = ("kp1", "kpN", "enc", "gen")


def _to_plain(tree):
    """FrozenDict / Mapping -> plain nested dict (stable pytree structure
    across export and reload)."""
    if hasattr(tree, "items"):
        return {k: _to_plain(v) for k, v in tree.items()}
    return tree


def _flatten_vars(tree, prefix: str, out: Dict[str, np.ndarray]):
    if hasattr(tree, "items"):
        for k, v in tree.items():
            assert "/" not in str(k), f"'/' in variable name {k!r}"
            _flatten_vars(v, f"{prefix}/{k}" if prefix else str(k), out)
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten_vars(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for key, arr in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return root


def _save_params(path: str, g_vars, m_vars) -> Dict[str, str]:
    """npz of both variable trees; non-numpy-native dtypes (bfloat16) are
    stored as raw bytes with the true dtype recorded for reload."""
    flat: Dict[str, np.ndarray] = {}
    _flatten_vars(_to_plain(g_vars), "g", flat)
    _flatten_vars(_to_plain(m_vars), "m", flat)
    dtypes = {}
    store = {}
    for k, a in flat.items():
        dtypes[k] = str(a.dtype)
        store[k] = a if a.dtype.kind in "fiub" else a.view(np.uint8)
    np.savez(path, **store)
    return dtypes


def _load_params(path: str, dtypes: Dict[str, str]):
    import ml_dtypes

    data = np.load(path)
    flat = {}
    for k in data.files:
        a = data[k]
        want = dtypes[k]
        if str(a.dtype) != want:
            a = a.view(np.dtype(want) if want != "bfloat16"
                       else ml_dtypes.bfloat16)
        flat[k] = a
    tree = _unflatten_vars(flat)
    return tree.get("g", {}), tree.get("m", {})


def _str_keys(tree):
    if hasattr(tree, "items"):
        return {str(k): _str_keys(v) for k, v in tree.items()}
    return tree


def _int_keys(tree):
    if hasattr(tree, "items"):
        return {(int(k) if str(k).lstrip("-").isdigit() else k):
                _int_keys(v) for k, v in tree.items()}
    return tree


def _spec_tree(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree
    )


def export_pipeline(pipeline, out_dir: str,
                    platforms: Optional[Sequence[str]] = None) -> None:
    """Serialize a ReenactmentPipeline's stages + weights to `out_dir`.

    The pipeline's flags (relative/adapt_scale/w/frame_batch/IO modes) are
    baked into the generation stage exactly as its jitted form would trace
    them; the manifest records them for the loader's host orchestration.
    """
    import jax
    from jax import export as jexport

    img_size = None
    # infer the working image size from the generator config
    for attr in ("img_size", "image_size"):
        img_size = getattr(pipeline.net_g, attr, None)
        if img_size is not None:
            break
    if img_size is None:
        raise ValueError("net_g exposes no img_size attribute")
    img_size = int(img_size)

    os.makedirs(out_dir, exist_ok=True)

    g_vars = _to_plain(pipeline.g_vars)
    m_vars = _to_plain(pipeline.m_vars)
    g_spec, m_spec = _spec_tree(g_vars), _spec_tree(m_vars)

    fb = int(pipeline.frame_batch)
    in_dtype = np.uint8 if pipeline.u8_io else np.float32
    if pipeline.host_kp_downsample:
        import ml_dtypes

        ks = float(pipeline.kp_scale)
        kp_hw = (int(round(img_size * ks)), int(round(img_size * ks)))
        kp_dtype = ml_dtypes.bfloat16
        pre_ds = True
    else:
        kp_hw = (img_size, img_size)
        kp_dtype = in_dtype
        pre_ds = False

    def kp_fn(m, images):
        return pipeline._kp_impl(m, images, pre_ds)

    # jax.export only serializes string dict keys; the encoder's skip
    # dict is keyed by integer scale, so stringify across the enc->gen
    # stage boundary (invisible to callers — gen undoes it)
    def enc_fn(g, source):
        return _str_keys(pipeline._enc_impl(g, source))

    def gen_fn(g, m, source, src_feats, kp_s, kp_d, kp_i):
        return pipeline._gen_impl(g, m, source, _int_keys(src_feats),
                                  kp_s, kp_d, kp_i)

    kp1_in = jax.ShapeDtypeStruct((1,) + kp_hw + (3,), kp_dtype)
    kpN_in = jax.ShapeDtypeStruct((fb,) + kp_hw + (3,), kp_dtype)
    src_in = jax.ShapeDtypeStruct((1, img_size, img_size, 3), in_dtype)

    kp1_spec = jax.eval_shape(kp_fn, m_spec, kp1_in)
    kpN_spec = jax.eval_shape(kp_fn, m_spec, kpN_in)
    feats_spec = jax.eval_shape(enc_fn, g_spec, src_in)

    kwargs = {} if platforms is None else {"platforms": tuple(platforms)}
    # a genuinely multi-platform artifact lowers every branch for every
    # platform, which Pallas kernels cannot do on CPU — trace those
    # exports through the portable paths (see ops/fused_attention.py)
    portable = platforms is not None and len(tuple(platforms)) > 1
    prev = os.environ.get("SAMT_PORTABLE_ATTENTION")
    if portable:
        os.environ["SAMT_PORTABLE_ATTENTION"] = "1"
    try:
        exports = {
            "kp1": jexport.export(jax.jit(kp_fn), **kwargs)(m_spec,
                                                            kp1_in),
            "kpN": jexport.export(jax.jit(kp_fn), **kwargs)(m_spec,
                                                            kpN_in),
            "enc": jexport.export(jax.jit(enc_fn), **kwargs)(g_spec,
                                                             src_in),
            "gen": jexport.export(jax.jit(gen_fn), **kwargs)(
                g_spec, m_spec, src_in, feats_spec, kp1_spec, kpN_spec,
                kp1_spec),
        }
    finally:
        if portable:
            if prev is None:
                os.environ.pop("SAMT_PORTABLE_ATTENTION", None)
            else:
                os.environ["SAMT_PORTABLE_ATTENTION"] = prev
    for name, ex in exports.items():
        with open(os.path.join(out_dir, f"{name}.bin"), "wb") as f:
            f.write(ex.serialize())

    dtypes = _save_params(os.path.join(out_dir, "params.npz"),
                          g_vars, m_vars)
    manifest = {
        "format_version": FORMAT_VERSION,
        "img_size": img_size,
        "frame_batch": fb,
        "relative": bool(pipeline.relative),
        "adapt_scale": bool(pipeline.adapt_scale),
        "w": float(pipeline.w),
        "compute_dtype": (None if pipeline.compute_dtype is None
                          else np.dtype(pipeline.compute_dtype).name),
        "u8_io": bool(pipeline.u8_io),
        "yuv420_io": bool(pipeline.yuv420_io),
        "host_kp_downsample": bool(pipeline.host_kp_downsample),
        "kp_scale": float(pipeline.kp_scale),
        "input_dtype": np.dtype(in_dtype).name,
        "platforms": list(exports["gen"].platforms),
        "param_dtypes": dtypes,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)


class ServingPipeline:
    """Runs reenactment from an exported artifact directory.

    Mirrors inference.ReenactmentPipeline's host orchestration (chunked
    kp+generation pipelining, anchor stitching) but every device stage is
    a deserialized AOT StableHLO program — no flax modules, no Python
    model tracing. Weights are jit arguments, swappable via
    `load_weights`."""

    def __init__(self, manifest: Dict[str, Any], stages: Dict[str, Any],
                 g_vars, m_vars):
        import jax

        self.manifest = manifest
        self.frame_batch = int(manifest["frame_batch"])
        self.relative = bool(manifest["relative"])
        self.adapt_scale = bool(manifest["adapt_scale"])
        self.w = float(manifest["w"])
        self.u8_io = bool(manifest["u8_io"])
        self.yuv420_io = bool(manifest["yuv420_io"])
        self.host_kp_downsample = bool(manifest["host_kp_downsample"])
        self.kp_scale = float(manifest["kp_scale"])
        self.img_size = int(manifest["img_size"])
        self.input_dtype = np.dtype(manifest["input_dtype"])
        self.mesh = None
        self._stages = {k: jax.jit(v.call) for k, v in stages.items()}
        self.g_vars, self.m_vars = g_vars, m_vars

    def load_weights(self, g_vars, m_vars):
        """Swap weights (same shapes/dtypes) without touching the AOT
        programs."""
        self.g_vars = _to_plain(g_vars)
        self.m_vars = _to_plain(m_vars)

    # stage adapters matching ReenactmentPipeline's internal surface
    def _kp_fn(self, images, pre_downsampled: bool = False):
        import jax.numpy as jnp

        images = jnp.asarray(images)
        stage = "kp1" if images.shape[0] == 1 else "kpN"
        if images.shape[0] not in (1, self.frame_batch):
            raise ValueError(
                f"serving kp stage compiled for batch 1 or "
                f"{self.frame_batch}, got {images.shape[0]}")
        return self._stages[stage](self.m_vars, images)

    def _enc_fn(self, source):
        import jax.numpy as jnp

        return self._stages["enc"](self.g_vars, jnp.asarray(source))

    def _gen_fn(self, source, src_feats, kp_source, kp_driving, kp_initial):
        import jax.numpy as jnp

        return self._stages["gen"](self.g_vars, self.m_vars,
                                   jnp.asarray(source), src_feats,
                                   kp_source, kp_driving, kp_initial)

    def estimate_kp(self, images_np):
        """kp for batch-1 or frame_batch inputs; routes through the host
        downsampler when that is the only kp stage the artifact bakes."""
        if self.host_kp_downsample:
            return self._kp_fn(self._host_kp_prep(np.asarray(images_np)),
                               True)
        import jax.numpy as jnp

        return self._kp_fn(jnp.asarray(images_np))

    # host orchestration is shared with the live pipeline
    from .inference import ReenactmentPipeline as _RP
    _host_kp_prep = _RP._host_kp_prep
    animate = _RP.animate
    animate_with_anchor = _RP.animate_with_anchor
    del _RP


def load_serving_pipeline(art_dir: str) -> ServingPipeline:
    from jax import export as jexport

    with open(os.path.join(art_dir, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"artifact format {manifest.get('format_version')} != "
            f"supported {FORMAT_VERSION}")
    stages = {}
    for name in _STAGES:
        with open(os.path.join(art_dir, f"{name}.bin"), "rb") as f:
            stages[name] = jexport.deserialize(bytearray(f.read()))
    g_vars, m_vars = _load_params(os.path.join(art_dir, "params.npz"),
                                  manifest["param_dtypes"])
    return ServingPipeline(manifest, stages, g_vars, m_vars)
