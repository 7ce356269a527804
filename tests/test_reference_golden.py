"""Golden-activation parity: our flax modules vs the upstream torch
reference, with weights transported by the checkpoint converter
(SURVEY.md section 4 item (d)). Runs the actual reference code on CPU as
the oracle — skipped when /root/reference is not mounted."""
import sys
from os import path as osp

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "tools"))

from _reference_oracle import import_reference  # noqa: E402

basicsr = import_reference()
pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    basicsr is None, reason="/root/reference not available")]


@pytest.fixture(autouse=True, scope="module")
def _highest_matmul_precision():
    """This JAX build's default matmul/conv precision is reduced
    (bf16-like) even on CPU; pin HIGHEST so golden comparisons measure
    math parity, then restore."""
    import jax

    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)

COMMON = dict(num_kp=5, num_channels=3)
KP_PARAMS = dict(temperature=0.1, block_expansion=8, max_features=32,
                 scale_factor=0.25, num_blocks=2, estimate_jacobian=True)
DM_PARAMS = dict(block_expansion=8, max_features=32, num_blocks=2,
                 scale_factor=0.25, estimate_occlusion_map=True)


def _np(t):
    return t.detach().cpu().numpy()


@pytest.fixture(scope="module")
def torch_me():
    import torch

    from basicsr.archs.motion_estimator_arch import (
        Motion_Estimator_keypoint_aware,
    )

    torch.manual_seed(0)
    net = Motion_Estimator_keypoint_aware(
        common_params=COMMON, dense_motion_params=DM_PARAMS,
        kp_detector_params=KP_PARAMS,
    )
    net.eval()
    return net


@pytest.fixture(scope="module")
def flax_me(torch_me):
    from convert_reference_checkpoint import convert_motion_estimator

    from synergize_motion_appearance_tpu.models import MotionEstimator

    sd = {k: _np(v) for k, v in torch_me.state_dict().items()}
    variables, unused = convert_motion_estimator(
        sd, num_blocks_kp=KP_PARAMS["num_blocks"],
        num_blocks_dm=DM_PARAMS["num_blocks"],
    )
    assert unused == [], f"unconverted reference keys: {unused[:10]}"
    net = MotionEstimator(common_params=COMMON,
                          dense_motion_params=DM_PARAMS,
                          kp_detector_params=KP_PARAMS)
    return net, variables


def test_kp_detector_golden(torch_me, flax_me):
    """Soft-argmax keypoints + heatmap-weighted jacobians match the
    reference bit-close (keypoint_detector_arch.py:13-87)."""
    import torch

    net, variables = flax_me
    rng = np.random.RandomState(0)
    img = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1

    with torch.no_grad():
        ref = torch_me.estimate_kp(
            torch.from_numpy(img.transpose(0, 3, 1, 2)))

    out = net.apply(variables, img, method="estimate_kp", train=False)
    np.testing.assert_allclose(np.asarray(out["value"]), _np(ref["value"]),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["jacobian"]),
                               _np(ref["jacobian"]), atol=2e-5, rtol=1e-4)


def test_dense_motion_golden(torch_me, flax_me):
    """Full motion-estimator forward: deformation field, occlusion map,
    and mask match the reference (dense_motion_arch.py:118-161)."""
    import torch

    net, variables = flax_me
    rng = np.random.RandomState(1)
    src = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    drv = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1

    with torch.no_grad():
        ref = torch_me(torch.from_numpy(drv.transpose(0, 3, 1, 2)),
                       torch.from_numpy(src.transpose(0, 3, 1, 2)))

    out = net.apply(variables, drv, src, train=False)
    np.testing.assert_allclose(
        np.asarray(out["deformation"]), _np(ref["deformation"]),
        atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["occlusion_map"]),
        _np(ref["occlusion_map"]).transpose(0, 2, 3, 1),
        atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["kp_driving"]["value"]),
        _np(ref["kp_driving"]["value"]), atol=2e-5, rtol=1e-4)


def test_dense_motion_multimask_golden():
    """multi_mask multi-scale occlusion heads match the reference
    (dense_motion_arch.py:34-54, :148-156): occlusion_num=5 sigmoid maps,
    the last up_nums from the extra UpBlock2d tail. num_blocks=3 so the
    three direct heads cover decoder stages -3..-1."""
    import torch

    from basicsr.archs.motion_estimator_arch import (
        Motion_Estimator_keypoint_aware,
    )
    from convert_reference_checkpoint import convert_motion_estimator

    from synergize_motion_appearance_tpu.models import MotionEstimator

    dm_mm = dict(block_expansion=8, max_features=32, num_blocks=3,
                 scale_factor=0.25, estimate_occlusion_map=True,
                 multi_mask=True, occlusion_num=5)
    torch.manual_seed(3)
    t_net = Motion_Estimator_keypoint_aware(
        common_params=COMMON, dense_motion_params=dm_mm,
        kp_detector_params=KP_PARAMS,
    )
    t_net.eval()

    sd = {k: _np(v) for k, v in t_net.state_dict().items()}
    variables, unused = convert_motion_estimator(
        sd, num_blocks_kp=KP_PARAMS["num_blocks"], num_blocks_dm=3,
        multi_mask=True, occlusion_num=5, scale_factor=0.25)
    assert unused == [], f"unconverted reference keys: {unused[:10]}"

    net = MotionEstimator(common_params=COMMON,
                          dense_motion_params=dm_mm,
                          kp_detector_params=KP_PARAMS)

    rng = np.random.RandomState(4)
    src = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    drv = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1

    with torch.no_grad():
        ref = t_net(torch.from_numpy(drv.transpose(0, 3, 1, 2)),
                    torch.from_numpy(src.transpose(0, 3, 1, 2)))

    out = net.apply(variables, drv, src, train=False)
    assert isinstance(out["occlusion_map"], list)
    assert len(out["occlusion_map"]) == 5
    # coarse->fine: 4², 8², 16² (decoder stages), 32², 64² (up tail)
    assert [o.shape[1] for o in out["occlusion_map"]] == [4, 8, 16, 32, 64]
    np.testing.assert_allclose(
        np.asarray(out["deformation"]), _np(ref["deformation"]),
        atol=5e-5, rtol=1e-3)
    for i, (got, want) in enumerate(zip(out["occlusion_map"],
                                        ref["occlusion_map"])):
        np.testing.assert_allclose(
            np.asarray(got), _np(want).transpose(0, 2, 3, 1),
            atol=1e-4, rtol=1e-3, err_msg=f"occlusion_map[{i}]")


def test_transformer_layer_golden():
    """TransformerLayer (self-attn + codebook cross-attn + conv FFN)
    matches torch (appmotioncodebook_arch.py:65-126)."""
    import torch

    import jax.numpy as jnp
    from basicsr.archs.appmotioncodebook_arch import (
        TransformerLayer as TorchTL,
    )
    from convert_reference_checkpoint import Converter, map_transformer_layer

    from synergize_motion_appearance_tpu.models.transformer import (
        TransformerLayer,
    )

    E, heads, t = 16, 4, 4
    torch.manual_seed(0)
    ttl = TorchTL(embed_dim=E, nhead=heads, dim_conv=2 * E)
    ttl.eval()

    sd = {f"blk.{k}": v.detach().numpy()
          for k, v in ttl.state_dict().items()}
    c = Converter(sd=sd)
    map_transformer_layer(c, "blk", "blk")
    variables, unused = c.result()
    assert unused == []
    params = variables["params"]["blk"]

    rng = np.random.RandomState(2)
    tgt = rng.rand(2, t * t, E).astype(np.float32)
    ctx = rng.rand(2, 8, E).astype(np.float32)
    pos = rng.rand(1, t * t, E).astype(np.float32)

    with torch.no_grad():
        # torch MHA is seq-first: (L, B, E); shape=(b, _, h, w)
        ref = ttl(
            torch.from_numpy(tgt.transpose(1, 0, 2)),
            torch.from_numpy(ctx.transpose(1, 0, 2)),
            shape=(2, None, t, t),
            query_pos=torch.from_numpy(pos.transpose(1, 0, 2)),
        )
    ours = TransformerLayer(E, heads, 2 * E).apply(
        {"params": params}, jnp.asarray(tgt), jnp.asarray(ctx), (t, t),
        query_pos=jnp.asarray(pos[0]),
    )
    np.testing.assert_allclose(np.asarray(ours),
                               _np(ref).transpose(1, 0, 2),
                               atol=2e-5, rtol=1e-4)


def test_vector_quantizer_golden():
    """VQ nearest lookup with prefix sub-codebook slicing matches torch
    (vqgan_arch.py:24-111), including argmin tie-breaking."""
    import torch

    import jax.numpy as jnp
    from basicsr.archs.vqgan_arch import VectorQuantizer as TorchVQ

    from synergize_motion_appearance_tpu.models.vqgan import VectorQuantizer

    K, D = 32, 8
    torch.manual_seed(0)
    tvq = TorchVQ(codebook_size=K, emb_dim=D, beta=0.25)
    tvq.eval()
    emb = tvq.embedding.weight.detach().numpy()

    rng = np.random.RandomState(3)
    z = rng.rand(2, 4, 4, D).astype(np.float32)

    fvq = VectorQuantizer(K, D, 0.25)
    variables = {"params": {"embedding": jnp.asarray(emb)}}

    with torch.no_grad():
        # torch layout: (B, C, H, W)
        zq_t, loss_t, stats_t = tvq(
            torch.from_numpy(z.transpose(0, 3, 1, 2)))
    zq, loss, stats = fvq.apply(variables, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(zq),
                               _np(zq_t).transpose(0, 2, 3, 1),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(float(loss), float(loss_t), rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(stats["min_encoding_indices"]).reshape(-1),
        _np(stats_t["min_encoding_indices"]).reshape(-1))

    # prefix slicing: scale is a FRACTION of the codebook
    # (vqgan_arch.py:43-50: num = int(scale * codebook_size))
    with torch.no_grad():
        zq_t2, _, stats_t2 = tvq(
            torch.from_numpy(z.transpose(0, 3, 1, 2)), scale=0.25)
    zq2, _, stats2 = fvq.apply(variables, jnp.asarray(z), num=K // 4)
    np.testing.assert_allclose(np.asarray(zq2),
                               _np(zq_t2).transpose(0, 2, 3, 1),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(stats2["min_encoding_indices"]).reshape(-1),
        _np(stats_t2["min_encoding_indices"]).reshape(-1))
