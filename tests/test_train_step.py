"""End-to-end train step on a tiny config + 8-device virtual mesh test.

Covers SURVEY.md section 4 item (c): multi-device behavior without a
cluster, via xla_force_host_platform_device_count=8 (set in conftest).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synergize_motion_appearance_tpu.training import Trainer
from synergize_motion_appearance_tpu.parallel import (
    create_mesh, shard_batch, replicate,
)

pytestmark = pytest.mark.slow  # heavy tier

IMG = 64


def tiny_opt(with_gan=True):
    return {
        "network_g": dict(
            type="AppMotionCompFormer", img_size=IMG, nf=8,
            ch_mult=[1, 2, 2, 4], attn_resolutions=[8],
            codebook_size_motion=64, embed_dim_motion=8,
            codebook_size_app=64, embed_dim_app=32, n_head=4,
            dim_embd_motion=8, dim_embd_app=32, num_kp=5,
        ),
        "network_motion_estimator": dict(
            type="Motion_Estimator_keypoint_aware",
            common_params=dict(num_kp=5, num_channels=3),
            dense_motion_params=dict(
                block_expansion=8, max_features=32, num_blocks=2,
                scale_factor=0.25, estimate_occlusion_map=True,
            ),
            kp_detector_params=dict(
                temperature=0.1, block_expansion=8, max_features=32,
                scale_factor=0.25, num_blocks=2, estimate_jacobian=True,
            ),
        ),
        "network_d": dict(type="VQGANDiscriminator", nc=3, ndf=8,
                          n_layers=2),
        "train": {
            "optim_g": dict(type="Adam", lr=8e-5, betas=[0.9, 0.99]),
            "optim_motion": dict(type="Adam", lr=8e-5, betas=[0.9, 0.99]),
            "optim_d": dict(type="Adam", lr=8e-5, betas=[0.9, 0.99]),
            "scheduler": dict(type="MultiStepLR", milestones=[4, 6],
                              gamma=0.5),
            "total_iter": 10,
            "ema_decay": 0.995,
            "pixel_opt": dict(type="L1Loss", loss_weight=1.0),
            "perceptual_opt": dict(
                type="MultiScalePyramidPerceptualLoss",
                scales=[1, 0.5], loss_weights=[1.0] * 5,
            ),
            **({"gan_opt": dict(type="GANLoss", gan_type="hinge",
                                loss_weight=1.0)} if with_gan else {}),
            "motion_codebook_code_opt": dict(loss_weight=1.0),
            "motion_codebook_recon_opt": dict(type="L1Loss",
                                              loss_weight=32.0),
            "app_codebook_code_opt": dict(loss_weight=1.0),
            "lr_pixel_perceptual_opt": dict(loss_weight=[0.5]),
            "equivariance_opt": dict(
                type="EquivarianceLoss", use_value=True, use_jacobian=True,
                loss_weight_value=1.0, loss_weight_jacobian=1.0,
                transform_params=dict(sigma_affine=0.05, sigma_tps=0.005,
                                      points_tps=5),
            ),
            "kp_distance_opt": dict(type="KPDistanceLoss", loss_weight=1.0),
            "net_d_start_iter": 1,
            "scale_adaptive_gan_weight": 0.8,
        },
    }


def make_batch(batch_size):
    rng = np.random.RandomState(0)
    return {
        "source": jnp.asarray(
            rng.randn(batch_size, IMG, IMG, 3).astype(np.float32) * 0.3
        ),
        "driving": jnp.asarray(
            rng.randn(batch_size, IMG, IMG, 3).astype(np.float32) * 0.3
        ),
    }


@pytest.fixture(scope="module")
def trainer_and_state():
    trainer = Trainer(tiny_opt())
    batch = make_batch(2)
    state, vgg_params = trainer.init_state(jax.random.PRNGKey(0), batch)
    return trainer, state, vgg_params


def test_single_device_train_step(trainer_and_state):
    trainer, state, vgg_params = trainer_and_state
    batch = make_batch(2)
    step_fn = jax.jit(trainer.make_train_step())

    state1, logs1 = step_fn(state, batch, jax.random.PRNGKey(1), vgg_params)
    assert int(state1.step) == 1
    for k, v in logs1.items():
        assert np.isfinite(float(v)), f"non-finite log {k}"
    # step 0: D gated off (net_d_start_iter=1) -> d params unchanged
    d_leaf0 = jax.tree_util.tree_leaves(state.params_d)[0]
    d_leaf1 = jax.tree_util.tree_leaves(state1.params_d)[0]
    np.testing.assert_array_equal(np.asarray(d_leaf0), np.asarray(d_leaf1))
    assert float(logs1["d_weight"]) == 0.0
    # G params must have moved
    g_leaf0 = jax.tree_util.tree_leaves(state.params_g)[0]
    g_leaf1 = jax.tree_util.tree_leaves(state1.params_g)[0]
    assert not np.allclose(np.asarray(g_leaf0), np.asarray(g_leaf1))

    # step 2: D active now
    state2, logs2 = step_fn(state1, batch, jax.random.PRNGKey(2), vgg_params)
    state3, logs3 = step_fn(state2, batch, jax.random.PRNGKey(3), vgg_params)
    assert float(logs3["d_weight"]) > 0.0
    d_leaf3 = jax.tree_util.tree_leaves(state3.params_d)[0]
    assert not np.allclose(np.asarray(d_leaf1), np.asarray(d_leaf3))
    # EMA drifts toward params
    e0 = jax.tree_util.tree_leaves(state.ema_g)[0]
    e3 = jax.tree_util.tree_leaves(state3.ema_g)[0]
    assert not np.allclose(np.asarray(e0), np.asarray(e3))


def test_multichip_data_parallel(trainer_and_state):
    """The dryrun_multichip contract: jit the FULL train step over an
    8-device mesh with the batch sharded on 'data'."""
    trainer, state, vgg_params = trainer_and_state
    assert jax.device_count() >= 8, "conftest must fake 8 devices"
    mesh = create_mesh(("data",))
    state_r = replicate(state, mesh)
    vgg_r = replicate(vgg_params, mesh)
    batch = shard_batch(make_batch(8), mesh)

    step_fn = jax.jit(trainer.make_train_step())
    new_state, logs = step_fn(state_r, batch, jax.random.PRNGKey(9), vgg_r)
    assert int(new_state.step) == int(state.step) + 1
    assert np.isfinite(float(logs["l_g_total"]))
    # params remain replicated (fully addressable on every device)
    leaf = jax.tree_util.tree_leaves(new_state.params_g)[0]
    assert leaf.sharding.is_fully_replicated


def test_bf16_mixed_precision_step():
    """train.compute_dtype=bfloat16: generator fwd + VGG pyramid in bf16,
    f32 master params/losses. Step runs, losses finite and close to the
    f32 step's, params move."""
    opt = tiny_opt()
    opt["train"]["compute_dtype"] = "bfloat16"
    trainer = Trainer(opt)
    batch = make_batch(2)
    state, vgg_params = trainer.init_state(jax.random.PRNGKey(0), batch)
    step_fn = jax.jit(trainer.make_train_step())
    state1, logs1 = step_fn(state, batch, jax.random.PRNGKey(1),
                            vgg_params)
    for k, v in logs1.items():
        assert np.isfinite(float(v)), f"non-finite log {k}"
    g0 = jax.tree_util.tree_leaves(state.params_g)[0]
    g1 = jax.tree_util.tree_leaves(state1.params_g)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
    # master params stay f32
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(state1.params_g))

    f32 = Trainer(tiny_opt())
    s32, vp32 = f32.init_state(jax.random.PRNGKey(0), batch)
    _, logs32 = jax.jit(f32.make_train_step())(
        s32, batch, jax.random.PRNGKey(1), vp32)
    # bf16 losses track f32 within mixed-precision noise
    a = float(logs1["l_g_total"])
    b = float(logs32["l_g_total"])
    assert abs(a - b) / max(abs(b), 1e-6) < 0.05, (a, b)


def test_remat_modes_agree():
    """remat: false / 'selective' / true produce the same step logs —
    selective keeps conv/matmul outputs resident (checkpoint_name
    anchors in layers.Conv2d/Dense) and recomputes only elementwise ops,
    so numerics must be identical (docs/PERF.md §10)."""
    batch = make_batch(2)
    logs = {}
    for remat in (False, "selective", True):
        opt = tiny_opt()
        opt["train"]["remat"] = remat
        tr = Trainer(opt)
        state, vgg_params = tr.init_state(jax.random.PRNGKey(0), batch)
        fn = jax.jit(tr.make_train_step())
        state, lg = fn(state, batch, jax.random.PRNGKey(1), vgg_params)
        logs[remat] = {k: float(v) for k, v in lg.items()}
        assert np.isfinite(logs[remat]["l_g_total"])
    for k, base in logs[False].items():
        for mode in ("selective", True):
            assert abs(logs[mode][k] - base) <= 1e-4 * max(1.0, abs(base)) \
                + 1e-5, (k, mode, logs[mode][k], base)
