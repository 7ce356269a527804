"""Bidirectional reference(PyTorch) <-> flax checkpoint converter.

Forward: torch state_dicts of the three networks (base_model.py:170-200
layout) -> this framework's param trees:
  net_g_*.pth                -> AppMotionCompFormer params
  net_motion_estimator_*.pth -> MotionEstimator params (+ batch_stats)
  net_d_*.pth                -> VQGANDiscriminator params (+ batch_stats)
Reverse: export trained flax params back to reference-named state_dicts
(cross-validation / running our weights in the reference code).

Usage:
  python tools/convert_reference_checkpoint.py --net g \
      --src net_g_latest.pth --dst net_g_flax.npz --config options/train.yml

Array conventions: torch conv OIHW <-> flax HWIO; linear (O,I) <-> (I,O);
BatchNorm weight/bias <-> scale/bias + running stats <-> batch_stats;
MultiheadAttention packed in_proj (3E,E) <-> wq/wk/wv.

The single mapping description (one `conv`/`bn`/`mha`/... call per torch
module, name maps cited from the reference structure) drives both
directions, so the round-trip test in tests/test_checkpoint_converter.py
validates coverage and shape transforms exactly.
"""
from __future__ import annotations

import argparse
import sys
from os import path as osp
from typing import Dict, List, Optional, Tuple

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from convert_vgg_weights import flatten, save_npz, unflatten  # noqa: E402


def conv_w_fwd(a):
    return np.asarray(a).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def conv_w_rev(a):
    return np.asarray(a).transpose(3, 2, 0, 1)  # HWIO -> OIHW


class Converter:
    """Forward mode: sd -> (params, stats). Reverse mode: variables -> sd."""

    def __init__(self, sd: Optional[Dict[str, np.ndarray]] = None,
                 variables: Optional[dict] = None):
        self.reverse = sd is None
        if self.reverse:
            self.src_params = variables["params"]
            self.src_stats = variables.get("batch_stats", {})
            self.out_sd: Dict[str, np.ndarray] = {}
        else:
            self.sd = {k: np.asarray(v) for k, v in sd.items()}
            self.params: dict = {}
            self.stats: dict = {}
            self.used = set()

    # -------- tree helpers --------

    def _get(self, tree, path):
        node = tree
        for p in path.split("/"):
            node = node[p]
        return np.asarray(node)

    def _has(self, tree, path) -> bool:
        node = tree
        for p in path.split("/"):
            if not isinstance(node, dict) or p not in node:
                return False
            node = node[p]
        return True

    def _put(self, tree, path, value):
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)

    def take(self, key):
        self.used.add(key)
        return self.sd[key]

    def has_param(self, fpath: str, tkey: str) -> bool:
        """Existence check that works in both directions (optional
        submodules like ResBlock.conv_out)."""
        if self.reverse:
            return self._has(self.src_params, fpath)
        return tkey in self.sd

    # -------- mapping primitives --------

    def conv(self, tkey: str, fpath: str, bias: bool = True):
        if self.reverse:
            self.out_sd[tkey + ".weight"] = conv_w_rev(
                self._get(self.src_params, fpath + "/kernel")
            )
            if bias and self._has(self.src_params, fpath + "/bias"):
                self.out_sd[tkey + ".bias"] = self._get(
                    self.src_params, fpath + "/bias"
                )
        else:
            self._put(self.params, fpath + "/kernel",
                      conv_w_fwd(self.take(tkey + ".weight")))
            if bias and tkey + ".bias" in self.sd:
                self._put(self.params, fpath + "/bias",
                          self.take(tkey + ".bias"))

    def conv2d(self, tkey: str, fpath: str, bias: bool = True):
        """our Conv2d wrapper nests nn.Conv as Conv_0"""
        self.conv(tkey, fpath + "/Conv_0", bias)

    def dense(self, tkey: str, fpath: str):
        p = fpath + "/Dense_0"
        if self.reverse:
            self.out_sd[tkey + ".weight"] = self._get(
                self.src_params, p + "/kernel").T
            self.out_sd[tkey + ".bias"] = self._get(
                self.src_params, p + "/bias")
        else:
            self._put(self.params, p + "/kernel",
                      np.asarray(self.take(tkey + ".weight")).T)
            self._put(self.params, p + "/bias", self.take(tkey + ".bias"))

    def bn(self, tkey: str, fpath: str):
        p = fpath + "/BatchNorm_0"
        if self.reverse:
            self.out_sd[tkey + ".weight"] = self._get(self.src_params,
                                                      p + "/scale")
            self.out_sd[tkey + ".bias"] = self._get(self.src_params,
                                                    p + "/bias")
            self.out_sd[tkey + ".running_mean"] = self._get(
                self.src_stats, p + "/mean")
            self.out_sd[tkey + ".running_var"] = self._get(
                self.src_stats, p + "/var")
            self.out_sd[tkey + ".num_batches_tracked"] = np.asarray(0)
        else:
            self._put(self.params, p + "/scale",
                      self.take(tkey + ".weight"))
            self._put(self.params, p + "/bias", self.take(tkey + ".bias"))
            self._put(self.stats, p + "/mean",
                      self.take(tkey + ".running_mean"))
            self._put(self.stats, p + "/var",
                      self.take(tkey + ".running_var"))
            self.used.add(tkey + ".num_batches_tracked")

    def _affine(self, tkey: str, fpath: str, sub: str):
        p = f"{fpath}/{sub}"
        if self.reverse:
            self.out_sd[tkey + ".weight"] = self._get(self.src_params,
                                                      p + "/scale")
            self.out_sd[tkey + ".bias"] = self._get(self.src_params,
                                                    p + "/bias")
        else:
            self._put(self.params, p + "/scale",
                      self.take(tkey + ".weight"))
            self._put(self.params, p + "/bias", self.take(tkey + ".bias"))

    def gn(self, tkey: str, fpath: str):
        self._affine(tkey, fpath, "GroupNorm_0")

    def ln(self, tkey: str, fpath: str):
        self._affine(tkey, fpath, "LayerNorm_0")

    def mha(self, tkey: str, fpath: str):
        if self.reverse:
            wq = self._get(self.src_params, fpath + "/wq")
            wk = self._get(self.src_params, fpath + "/wk")
            wv = self._get(self.src_params, fpath + "/wv")
            self.out_sd[tkey + ".in_proj_weight"] = np.concatenate(
                [wq.T, wk.T, wv.T], axis=0
            )
            self.out_sd[tkey + ".in_proj_bias"] = self._get(
                self.src_params, fpath + "/in_proj_bias")
            self.out_sd[tkey + ".out_proj.weight"] = self._get(
                self.src_params, fpath + "/out_proj_kernel").T
            self.out_sd[tkey + ".out_proj.bias"] = self._get(
                self.src_params, fpath + "/out_proj_bias")
        else:
            w = self.take(tkey + ".in_proj_weight")  # (3E, E)
            b = self.take(tkey + ".in_proj_bias")
            e = w.shape[1]
            self._put(self.params, fpath + "/wq", np.asarray(w[:e]).T)
            self._put(self.params, fpath + "/wk", np.asarray(w[e:2 * e]).T)
            self._put(self.params, fpath + "/wv", np.asarray(w[2 * e:]).T)
            self._put(self.params, fpath + "/in_proj_bias", b)
            self._put(self.params, fpath + "/out_proj_kernel",
                      np.asarray(self.take(tkey + ".out_proj.weight")).T)
            self._put(self.params, fpath + "/out_proj_bias",
                      self.take(tkey + ".out_proj.bias"))

    def direct(self, tkey: str, fpath: str):
        if self.reverse:
            self.out_sd[tkey] = self._get(self.src_params, fpath)
        else:
            self._put(self.params, fpath, self.take(tkey))

    def result(self):
        if self.reverse:
            return self.out_sd, []
        unused = sorted(set(self.sd) - self.used)
        return {"params": self.params, "batch_stats": self.stats}, unused


# ---------------------------------------------------------------------------
# network mapping descriptions
# ---------------------------------------------------------------------------

def map_hourglass(c: Converter, t: str, f: str, num_blocks: int):
    """Hourglass (motion_estimator_util.py:440-563)."""
    for i in range(num_blocks):
        c.conv2d(f"{t}.encoder.down_blocks.{i}.conv",
                 f"{f}/encoder/down_{i}/conv")
        c.bn(f"{t}.encoder.down_blocks.{i}.norm",
             f"{f}/encoder/down_{i}/norm")
        c.conv2d(f"{t}.decoder.up_blocks.{i}.conv",
                 f"{f}/decoder/up_{i}/conv")
        c.bn(f"{t}.decoder.up_blocks.{i}.norm",
             f"{f}/decoder/up_{i}/norm")


def _antialias_weight(channels: int, scale: float) -> np.ndarray:
    """The reference's fixed depthwise gaussian blur buffer
    (motion_estimator_util.py:603-631), reproduced exactly: separable
    gaussian with sigma=(1/scale-1)/2, size 2*round(4*sigma)+1,
    normalized, tiled (C,1,k,k)."""
    sigma = (1.0 / scale - 1.0) / 2.0
    ksize = 2 * round(sigma * 4) + 1
    ax = np.arange(ksize, dtype=np.float32)
    g = np.exp(-((ax - (ksize - 1) / 2.0) ** 2) / (2.0 * sigma ** 2))
    k2d = np.outer(g, g).astype(np.float32)
    k2d /= k2d.sum()
    return np.tile(k2d[None, None], (channels, 1, 1, 1))


def map_motion_estimator(c: Converter, num_blocks_kp=5, num_blocks_dm=5,
                         estimate_jacobian=True,
                         estimate_occlusion=True,
                         multi_mask=False, occlusion_num=5,
                         scale_factor=0.25):
    """Motion_Estimator_keypoint_aware (motion_estimator_arch.py:14-52)."""
    map_hourglass(c, "kp_detector.predictor", "kp_detector/predictor",
                  num_blocks_kp)
    c.conv2d("kp_detector.kp", "kp_detector/kp")
    if estimate_jacobian:
        # plain nn.Conv in our KPDetector (named 'jacobian', no wrapper)
        c.conv("kp_detector.jacobian", "kp_detector/jacobian")
    if not c.reverse:
        # antialias blur kernels are fixed buffers, recomputed on our side
        c.used.add("kp_detector.down.weight")
        c.used.add("dense_motion_network.down.weight")
    else:
        # emit the deterministic AntiAliasInterpolation2d gaussian
        # buffers (motion_estimator_util.py:599-632) so exported
        # state_dicts load strict=True in the reference
        w = _antialias_weight(3, scale_factor)
        c.out_sd["kp_detector.down.weight"] = w
        c.out_sd["dense_motion_network.down.weight"] = w
    map_hourglass(c, "dense_motion_network.hourglass",
                  "dense_motion_network/hourglass", num_blocks_dm)
    c.conv2d("dense_motion_network.mask", "dense_motion_network/mask")
    if estimate_occlusion:
        if multi_mask:
            # ModuleList heads + upsampling tail (dense_motion_arch.py:34-54)
            import math

            up_nums = int(math.log(1.0 / scale_factor, 2))
            for i in range(occlusion_num):
                c.conv2d(f"dense_motion_network.occlusion.{i}",
                         f"dense_motion_network/occlusion_{i}")
            for i in range(up_nums):
                c.conv2d(f"dense_motion_network.up.{i}.conv",
                         f"dense_motion_network/up_{i}/conv")
                c.bn(f"dense_motion_network.up.{i}.norm",
                     f"dense_motion_network/up_{i}/norm")
        else:
            c.conv2d("dense_motion_network.occlusion",
                     "dense_motion_network/occlusion")


def map_block_list(c: Converter, defs, t_prefix: str, f_prefix: str):
    """vqgan Encoder/Generator ModuleLists (vqgan_arch.py:256-350)."""
    for i, (kind, _) in enumerate(defs):
        t = f"{t_prefix}.{i}"
        f = f"{f_prefix}_{i}"
        if kind == "conv":
            c.conv2d(t, f"{f}/conv")
        elif kind == "res":
            c.gn(f"{t}.norm1", f"{f}/norm1")
            c.conv2d(f"{t}.conv1", f"{f}/conv1")
            c.gn(f"{t}.norm2", f"{f}/norm2")
            c.conv2d(f"{t}.conv2", f"{f}/conv2")
            if c.has_param(f"{f}/conv_out/Conv_0/kernel",
                           f"{t}.conv_out.weight"):
                c.conv2d(f"{t}.conv_out", f"{f}/conv_out")
        elif kind == "attn":
            c.gn(f"{t}.norm", f"{f}/norm")
            for qkv in ("q", "k", "v", "proj_out"):
                c.conv2d(f"{t}.{qkv}", f"{f}/{qkv}")
        elif kind in ("down", "up"):
            c.conv2d(f"{t}.conv", f"{f}/conv")
        elif kind == "norm":
            c.gn(t, f"{f}/norm")


def map_transformer_layer(c: Converter, t: str, f: str):
    """TransformerLayer (appmotioncodebook_arch.py:65-126)."""
    c.mha(f"{t}.self_attn", f"{f}/self_attn")
    c.mha(f"{t}.cross_attn", f"{f}/cross_attn")
    c.conv2d(f"{t}.conv1", f"{f}/conv1")
    c.conv2d(f"{t}.conv2", f"{f}/conv2")
    for n in ("norm1", "norm2", "norm3"):
        c.ln(f"{t}.{n}", f"{f}/{n}")


def map_res_block(c: Converter, t: str, f: str):
    c.gn(f"{t}.norm1", f"{f}/norm1")
    c.conv2d(f"{t}.conv1", f"{f}/conv1")
    c.gn(f"{t}.norm2", f"{f}/norm2")
    c.conv2d(f"{t}.conv2", f"{f}/conv2")
    if c.has_param(f"{f}/conv_out/Conv_0/kernel", f"{t}.conv_out.weight"):
        c.conv2d(f"{t}.conv_out", f"{f}/conv_out")


def map_net_g(c: Converter, net):
    """AppMotionCompFormer (appmotioncodebook_arch.py:170-339)."""
    from synergize_motion_appearance_tpu.models.vqgan import (
        encoder_block_defs, generator_block_defs,
    )

    enc_defs = encoder_block_defs(net.nf, net.embed_dim_app, net.ch_mult,
                                  net.res_blocks, net.img_size,
                                  net.attn_resolutions)
    gen_defs = generator_block_defs(net.nf, net.embed_dim_app, net.ch_mult,
                                    net.res_blocks, net.img_size,
                                    net.attn_resolutions)
    map_block_list(c, enc_defs, "encoder.blocks", "encoder_blocks")
    map_block_list(c, gen_defs, "generator.blocks", "generator_blocks")

    t_hw = net.token_hw
    for r in net.connect_app:
        if r == t_hw:
            c.conv2d(f"app_feat_emb_{r}", f"app_feat_emb_{r}")
            c.conv2d(f"to_app_feat_{r}", f"to_app_feat_{r}")
        else:
            c.dense(f"app_feat_emb_{r}.1", f"app_feat_emb_{r}")
            c.dense(f"to_app_feat_{r}.0", f"to_app_feat_{r}")

    c.direct("quantize_app.embedding.weight", "quantize_app/embedding")
    c.direct("quantize_motion.embedding.weight",
             "quantize_motion/embedding")
    if net.with_position_emb:
        c.direct("position_emb_app", "position_emb_app")
        c.direct("position_emb_motion", "position_emb_motion")

    for r in net.connect:
        t = f"fuse_convs_dict.{r}"
        f = f"fuse_convs_{r}"
        map_res_block(c, f"{t}.encode_enc", f"{f}/encode_enc")
        c.conv2d(f"{t}.scale.0", f"{f}/scale1")
        c.conv2d(f"{t}.scale.2", f"{f}/scale2")
        c.conv2d(f"{t}.shift.0", f"{f}/shift1")
        c.conv2d(f"{t}.shift.2", f"{f}/shift2")
        c.conv2d(f"fuse_ms_dict.{r}", f"fuse_ms_{r}")

    c.conv2d("motion_emb.0", "motion_emb_conv")
    c.conv2d("motion_emb.1.conv", "motion_emb_down/conv")
    map_res_block(c, "motion_emb.2", "motion_emb_res")
    c.conv2d("to_motion.0.conv", "to_motion_up/conv")
    map_res_block(c, "to_motion.1", "to_motion_res")
    c.gn("to_motion.2", "to_motion_norm")
    c.conv2d("to_motion.3", "to_motion_conv")

    for i in range(net.n_layers_motion):
        map_transformer_layer(c, f"motion_block.{i}", f"motion_block_{i}")
    for i in range(net.n_layers_app):
        map_transformer_layer(c, f"app_block.{i}", f"app_block_{i}")

    if net.MRFA_motion_enc:
        for name in ("convc1", "convc2", "convf1", "convf2", "conv"):
            c.conv2d(f"BasicMotionEncoder.{name}",
                     f"BasicMotionEncoder/{name}")
        # to_context ModuleList order == scales order
        # (appmotioncodebook_arch.py:296-301)
        for i, r in enumerate(net.scales):
            if c.has_param(f"to_context_{r}/Conv_0/kernel",
                           f"to_context.{i}.weight"):
                c.conv2d(f"to_context.{i}", f"to_context_{r}")
        for name in ("convc1", "conv1", "conv2", "convo1", "convo2"):
            c.conv2d(f"refine.{name}", f"refine/{name}")

    if net.warp_s_d_kp_query:
        for r in net.scales:
            if c.has_param(f"warped_source_enc_{r}/Conv_0/kernel",
                           f"warped_source_enc_{r}.weight"):
                c.conv2d(f"warped_source_enc_{r}", f"warped_source_enc_{r}")
        c.conv2d("driving_kp_enc", "driving_kp_enc")
        c.conv2d("motion_query_enc_1", "motion_query_enc_1")
        c.conv2d("motion_query_enc_2", "motion_query_enc_2")


def map_net_d(c: Converter, n_layers=4):
    """VQGANDiscriminator Sequential (vqgan_arch.py:535-575)."""
    c.conv2d("main.0", "conv0")
    idx = 2
    for n in range(1, n_layers):
        c.conv2d(f"main.{idx}", f"conv{n}", bias=False)
        c.bn(f"main.{idx + 1}", f"bn{n}")
        idx += 3
    c.conv2d(f"main.{idx}", f"conv{n_layers}", bias=False)
    c.bn(f"main.{idx + 1}", f"bn{n_layers}")
    idx += 3
    c.conv2d(f"main.{idx}", "conv_out")


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def convert_net_g(sd, net_cfg):
    from synergize_motion_appearance_tpu.models import build_network

    net = build_network(dict(net_cfg))
    c = Converter(sd=sd)
    map_net_g(c, net)
    return c.result()


def export_net_g(variables, net_cfg):
    from synergize_motion_appearance_tpu.models import build_network

    net = build_network(dict(net_cfg))
    c = Converter(variables=variables)
    map_net_g(c, net)
    return c.result()[0]


def convert_motion_estimator(sd, **kw):
    c = Converter(sd=sd)
    map_motion_estimator(c, **kw)
    return c.result()


def export_motion_estimator(variables, **kw):
    c = Converter(variables=variables)
    map_motion_estimator(c, **kw)
    return c.result()[0]


def convert_net_d(sd, n_layers=4):
    c = Converter(sd=sd)
    map_net_d(c, n_layers)
    return c.result()


def export_net_d(variables, n_layers=4):
    c = Converter(variables=variables)
    map_net_d(c, n_layers)
    return c.result()[0]


def load_torch_state_dict(path: str, param_key: str = "params"):
    import torch

    sd = torch.load(path, map_location="cpu")
    if param_key in sd:
        sd = sd[param_key]
    elif "params" in sd:
        sd = sd["params"]
    # strip DDP 'module.' prefixes (base_model.py:236-243)
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    return {k: v.numpy() for k, v in sd.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", choices=["g", "d", "motion_estimator"],
                    required=True)
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--config", default="options/train.yml")
    ap.add_argument("--param_key", default="params_ema")
    args = ap.parse_args()

    from synergize_motion_appearance_tpu.utils.options import load_yaml

    cfg = load_yaml(args.config)
    sd = load_torch_state_dict(args.src, args.param_key)

    if args.net == "g":
        variables, unused = convert_net_g(sd, dict(cfg["network_g"]))
    elif args.net == "motion_estimator":
        me = cfg["network_motion_estimator"]
        variables, unused = convert_motion_estimator(
            sd,
            num_blocks_kp=me["kp_detector_params"]["num_blocks"],
            num_blocks_dm=me["dense_motion_params"]["num_blocks"],
            estimate_jacobian=me["kp_detector_params"].get(
                "estimate_jacobian", True),
            estimate_occlusion=me["dense_motion_params"].get(
                "estimate_occlusion_map", True),
            multi_mask=me["dense_motion_params"].get("multi_mask", False),
            occlusion_num=me["dense_motion_params"].get("occlusion_num", 5),
            scale_factor=me["dense_motion_params"].get("scale_factor", 0.25),
        )
    else:
        d = cfg["network_d"]
        variables, unused = convert_net_d(sd, d.get("n_layers", 4))

    if unused:
        print(f"WARNING: {len(unused)} unconverted torch keys:")
        for k in unused[:20]:
            print("  ", k)
    save_npz(variables, args.dst)
    print(f"Wrote {args.dst}")


if __name__ == "__main__":
    main()
