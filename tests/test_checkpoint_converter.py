"""Round-trip validation of the bidirectional torch<->flax converter.

flax init tree -> export (reverse mapping) -> torch-named state_dict ->
convert (forward mapping) -> flax tree. The result must be bit-identical
and cover every leaf, proving name-map coverage and shape transforms are
mutually consistent. A forward pass with the converted params must match
the original forward exactly.
"""
import sys
from os import path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "tools"))

from convert_reference_checkpoint import (  # noqa: E402
    convert_motion_estimator, convert_net_d, convert_net_g,
    export_motion_estimator, export_net_d, export_net_g,
)
from convert_vgg_weights import flatten  # noqa: E402

from synergize_motion_appearance_tpu.models import build_network  # noqa: E402

pytestmark = pytest.mark.slow  # heavy tier

NET_G_CFG = dict(
    type="AppMotionCompFormer", img_size=64, nf=8, ch_mult=[1, 2, 2, 4],
    attn_resolutions=[8], codebook_size_motion=64, embed_dim_motion=8,
    codebook_size_app=64, embed_dim_app=32, n_head=4, dim_embd_motion=8,
    dim_embd_app=32, num_kp=5,
)

ME_CFG = dict(
    type="Motion_Estimator_keypoint_aware",
    common_params=dict(num_kp=5, num_channels=3),
    dense_motion_params=dict(block_expansion=8, max_features=32,
                             num_blocks=2, scale_factor=0.25,
                             estimate_occlusion_map=True),
    kp_detector_params=dict(temperature=0.1, block_expansion=8,
                            max_features=32, scale_factor=0.25,
                            num_blocks=2, estimate_jacobian=True),
)


def _np_tree(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def _assert_trees_equal(a, b, what):
    fa, fb = flatten(a), flatten(b)
    missing = sorted(set(fa) - set(fb))
    extra = sorted(set(fb) - set(fa))
    assert not missing, f"{what}: converter missed leaves: {missing[:10]}"
    assert not extra, f"{what}: converter invented leaves: {extra[:10]}"
    for k in fa:
        np.testing.assert_array_equal(
            fa[k], fb[k], err_msg=f"{what}: mismatch at {k}"
        )


@pytest.fixture(scope="module")
def nets_and_vars():
    net_g = build_network(dict(NET_G_CFG))
    me = build_network(dict(ME_CFG))
    net_d = build_network(dict(type="VQGANDiscriminator", nc=3, ndf=8,
                               n_layers=2))
    s = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3),
                           minval=-1, maxval=1)
    d = jnp.roll(s, 3, axis=2)
    m_vars = me.init(jax.random.PRNGKey(0), d, s)
    dm = me.apply(m_vars, d, s)
    g_vars = net_g.init(jax.random.PRNGKey(1), s, dm, gt=d)
    d_vars = net_d.init(jax.random.PRNGKey(2), d)
    return net_g, me, net_d, _np_tree(g_vars), _np_tree(m_vars), \
        _np_tree(d_vars), s, d, dm


def test_net_g_roundtrip(nets_and_vars):
    net_g, _, _, g_vars, _, _, s, d, dm = nets_and_vars
    sd = export_net_g(g_vars, dict(NET_G_CFG))
    restored, unused = convert_net_g(sd, dict(NET_G_CFG))
    assert unused == [], f"unconverted torch keys: {unused[:10]}"
    _assert_trees_equal(g_vars["params"], restored["params"], "net_g")

    out0 = net_g.apply({"params": g_vars["params"]}, s, dm, inference=True)
    out1 = net_g.apply({"params": restored["params"]}, s, dm,
                       inference=True)
    np.testing.assert_array_equal(np.asarray(out0["out"]),
                                  np.asarray(out1["out"]))


def test_motion_estimator_roundtrip(nets_and_vars):
    _, me, _, _, m_vars, _, s, d, _ = nets_and_vars
    kw = dict(num_blocks_kp=2, num_blocks_dm=2, estimate_jacobian=True,
              estimate_occlusion=True)
    sd = export_motion_estimator(m_vars, **kw)
    restored, unused = convert_motion_estimator(sd, **kw)
    assert unused == []
    _assert_trees_equal(m_vars["params"], restored["params"], "me params")
    _assert_trees_equal(m_vars["batch_stats"], restored["batch_stats"],
                        "me stats")
    dm0 = me.apply(m_vars, d, s)
    dm1 = me.apply(restored, d, s)
    np.testing.assert_array_equal(np.asarray(dm0["deformation"]),
                                  np.asarray(dm1["deformation"]))


def test_net_d_roundtrip(nets_and_vars):
    _, _, net_d, _, _, d_vars, s, d, _ = nets_and_vars
    sd = export_net_d(d_vars, n_layers=2)
    restored, unused = convert_net_d(sd, n_layers=2)
    assert unused == []
    _assert_trees_equal(d_vars["params"], restored["params"], "net_d")
    _assert_trees_equal(d_vars["batch_stats"], restored["batch_stats"],
                        "net_d stats")


def test_exported_names_look_like_reference():
    """Spot-check the torch-side names against the reference structure."""
    net_g = build_network(dict(NET_G_CFG))
    s = jnp.zeros((1, 64, 64, 3))
    dm = {"deformation": jnp.zeros((1, 16, 16, 2)),
          "occlusion_map": jnp.zeros((1, 16, 16, 1)),
          "driving_kp_heatmap": jnp.zeros((1, 5, 16, 16))}
    # train-mode init so every submodule (incl. to_motion) owns params
    g_vars = net_g.init(jax.random.PRNGKey(0), s, dm, gt=s)
    sd = export_net_g(_np_tree(g_vars), dict(NET_G_CFG))
    keys = set(sd)
    # names the reference state_dict must contain
    # (appmotioncodebook_arch.py:218-339, vqgan_arch.py:256-350)
    for expected in [
        "encoder.blocks.0.weight",
        "encoder.blocks.1.norm1.weight",
        "generator.blocks.18.weight",
        "quantize_app.embedding.weight",
        "quantize_motion.embedding.weight",
        "position_emb_app",
        "motion_block.0.self_attn.in_proj_weight",
        "app_block.0.cross_attn.out_proj.weight",
        "motion_emb.0.weight",
        "to_motion.3.weight",
        "BasicMotionEncoder.convc1.weight",
        "refine.convo2.bias",
        "driving_kp_enc.weight",
        "fuse_ms_dict.16.weight",
        "fuse_convs_dict.16.scale.0.weight",
    ]:
        assert expected in keys, f"missing torch key {expected}"
