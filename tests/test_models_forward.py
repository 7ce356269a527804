"""Shape/finite-ness tests for the model stack on tiny configs.

Mirrors SURVEY.md section 4's prescribed test strategy items (b): per-module
shape/dtype tests. Tiny config: img_size=64 so scales are [8, 16, 32, 64]
and the token grid is 8x8 — same code paths, 100x cheaper.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synergize_motion_appearance_tpu.models import (
    AppMotionCompFormer,
    DenseMotionNetwork,
    KPDetector,
    MotionEstimator,
    VQGANDiscriminator,
    build_network,
)
from synergize_motion_appearance_tpu.models.appmotion_former import (
    encoder_tap_indices,
    generator_tap_indices,
)

pytestmark = pytest.mark.slow  # heavy tier

TINY_IMG = 64


def tiny_motion_estimator():
    return MotionEstimator(
        common_params=dict(num_kp=5, num_channels=3),
        dense_motion_params=dict(
            block_expansion=8, max_features=32, num_blocks=2,
            scale_factor=0.25, estimate_occlusion_map=True,
        ),
        kp_detector_params=dict(
            temperature=0.1, block_expansion=8, max_features=32,
            scale_factor=0.25, num_blocks=2, estimate_jacobian=True,
        ),
    )


def tiny_former(**kw):
    cfg = dict(
        img_size=TINY_IMG, nf=8, ch_mult=(1, 2, 2, 4), res_blocks=2,
        attn_resolutions=(8,), codebook_size_motion=64, embed_dim_motion=8,
        codebook_size_app=64, embed_dim_app=32, n_head=4, dim_embd_motion=8,
        n_layers_motion=1, dim_embd_app=32, n_layers_app=1, num_kp=5,
    )
    cfg.update(kw)
    return AppMotionCompFormer(**cfg)


def test_tap_indices_match_reference_flagship():
    """The hard-coded maps at appmotioncodebook_arch.py:327-329."""
    enc = encoder_tap_indices(64, 256, (1, 2, 2, 4), 2, 256, (32,))
    assert enc == {256: 2, 128: 5, 64: 8, 32: 11}
    gen = generator_tap_indices(64, 256, (1, 2, 2, 4), 2, 256, (32,))
    assert gen == {32: 6, 64: 9, 128: 12, 256: 15}


def test_kp_detector_shapes():
    net = KPDetector(block_expansion=8, num_kp=5, num_channels=3,
                     max_features=32, num_blocks=2, temperature=0.1,
                     estimate_jacobian=True, scale_factor=0.25)
    x = jnp.zeros((2, TINY_IMG, TINY_IMG, 3))
    vars_ = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(vars_, x)
    assert out["value"].shape == (2, 5, 2)
    assert out["jacobian"].shape == (2, 5, 2, 2)
    # zero-init jacobian conv + identity bias -> jacobians are identity
    np.testing.assert_allclose(
        np.asarray(out["jacobian"]),
        np.broadcast_to(np.eye(2), (2, 5, 2, 2)),
        atol=1e-5,
    )
    assert np.all(np.abs(np.asarray(out["value"])) <= 1.0)


def test_motion_estimator_shapes():
    net = tiny_motion_estimator()
    d = jnp.ones((2, TINY_IMG, TINY_IMG, 3)) * 0.1
    s = jnp.ones((2, TINY_IMG, TINY_IMG, 3)) * -0.1
    vars_ = net.init(jax.random.PRNGKey(0), d, s)
    out, mutated = net.apply(
        vars_, d, s, train=True, mutable=["batch_stats"]
    )
    hd = TINY_IMG // 4
    assert out["deformation"].shape == (2, hd, hd, 2)
    assert out["occlusion_map"].shape == (2, hd, hd, 1)
    assert out["sparse_motion"].shape == (2, 6, hd, hd, 2)
    assert out["kp_driving"]["value"].shape == (2, 5, 2)
    assert np.isfinite(np.asarray(out["deformation"])).all()
    assert "batch_stats" in mutated


@pytest.fixture(scope="module")
def former_setup():
    me = tiny_motion_estimator()
    net = tiny_former()
    d = jax.random.normal(jax.random.PRNGKey(1), (2, TINY_IMG, TINY_IMG, 3)) * 0.2
    s = jax.random.normal(jax.random.PRNGKey(2), (2, TINY_IMG, TINY_IMG, 3)) * 0.2
    me_vars = me.init(jax.random.PRNGKey(0), d, s)
    dense_motion = me.apply(me_vars, d, s)
    net_vars = net.init(jax.random.PRNGKey(3), s, dense_motion, gt=d)
    return net, net_vars, s, d, dense_motion


def test_former_train_forward(former_setup):
    net, net_vars, s, d, dense_motion = former_setup
    out = net.apply(net_vars, s, dense_motion, gt=d)
    assert out["out"].shape == (2, TINY_IMG, TINY_IMG, 3)
    assert np.isfinite(np.asarray(out["out"])).all()
    # 4 motion passes (base + 3 fuse scales), 4 app compensations
    assert len(out["res_deform_list"]) == 4
    assert len(out["deformation_list"]) == 5
    assert len(out["codebook_loss_motion_list"]) == 4
    assert len(out["motion_recon_list"]) == 4
    assert len(out["app_comp_list"]) == 4
    assert len(out["codebook_loss_app_list"]) == 4
    assert len(out["out_occ"]) == 4
    assert out["out_lr"][0].shape == (2, TINY_IMG, TINY_IMG, 3)
    for occ in out["out_occ"]:
        v = np.asarray(occ)
        assert (v >= 0).all() and (v <= 1).all()


def test_former_inference_forward(former_setup):
    net, net_vars, s, d, dense_motion = former_setup
    out = net.apply(net_vars, s, dense_motion, inference=True)
    assert out["out"].shape == (2, TINY_IMG, TINY_IMG, 3)
    assert "out_lr" not in out
    assert "codebook_loss_motion_list" not in out
    assert np.isfinite(np.asarray(out["out"])).all()


def test_former_multimask_list_consumption():
    """multi_mask mode: the generator consumes the occlusion LIST
    positionally (appmotioncodebook_arch.py:606-610, :702-706) and skips
    the MRFA occlusion accumulation (out_occ stays empty, :598)."""
    me = MotionEstimator(
        common_params=dict(num_kp=5, num_channels=3),
        dense_motion_params=dict(
            block_expansion=8, max_features=32, num_blocks=2,
            scale_factor=0.25, estimate_occlusion_map=True,
            multi_mask=True, occlusion_num=4,
        ),
        kp_detector_params=dict(
            temperature=0.1, block_expansion=8, max_features=32,
            scale_factor=0.25, num_blocks=2, estimate_jacobian=True,
        ),
    )
    net = tiny_former()
    d = jax.random.normal(jax.random.PRNGKey(1),
                          (1, TINY_IMG, TINY_IMG, 3)) * 0.2
    s = jax.random.normal(jax.random.PRNGKey(2),
                          (1, TINY_IMG, TINY_IMG, 3)) * 0.2
    me_vars = me.init(jax.random.PRNGKey(0), d, s)
    dense_motion = me.apply(me_vars, d, s)
    assert isinstance(dense_motion["occlusion_map"], list)
    assert len(dense_motion["occlusion_map"]) == 4
    # heads sit on the LAST (occlusion_num - up_nums) decoder stages,
    # then the up tail doubles past the hourglass resolution (16² here)
    hd = TINY_IMG // 4
    assert [o.shape[1] for o in dense_motion["occlusion_map"]] == \
        [hd // 2, hd, 2 * hd, 4 * hd]

    net_vars = net.init(jax.random.PRNGKey(3), s, dense_motion, gt=d)
    out = net.apply(net_vars, s, dense_motion, gt=d)
    assert out["out"].shape == (1, TINY_IMG, TINY_IMG, 3)
    assert np.isfinite(np.asarray(out["out"])).all()
    assert out["out_occ"] == []  # list mode: no MRFA occlusion residuals
    out_inf = net.apply(net_vars, s, dense_motion, inference=True)
    assert np.isfinite(np.asarray(out_inf["out"])).all()


def test_discriminator_shapes():
    net = VQGANDiscriminator(nc=3, ndf=8, n_layers=2)
    x = jnp.zeros((2, TINY_IMG, TINY_IMG, 3))
    vars_ = net.init(jax.random.PRNGKey(0), x)
    out, _ = net.apply(vars_, x, train=True, mutable=["batch_stats"])
    assert out.shape[0] == 2 and out.shape[-1] == 1
    assert np.isfinite(np.asarray(out)).all()


def test_build_network_registry():
    net = build_network(dict(
        type="AppMotionCompFormer", img_size=64, nf=8,
        ch_mult=[1, 2, 2, 4], attn_resolutions=[8],
        codebook_size_motion=64, embed_dim_motion=8, codebook_size_app=64,
        embed_dim_app=32, n_head=4, dim_embd_motion=8, dim_embd_app=32,
        num_kp=5,
    ))
    assert isinstance(net, AppMotionCompFormer)
