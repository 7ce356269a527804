"""End-to-end tests of the native FID / LPIPS / AED directory pipelines
(metrics/external.py) with synthetic weights, exercising weight discovery
(.npz), batching with last-batch padding, the pairing protocols, and the
Frechet / mean-distance math."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # heavy tier


def _write_images(d, n, size=32, seed=0):
    import cv2

    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n):
        cv2.imwrite(os.path.join(d, f"{i:03d}_g.png"),
                    (rng.rand(size, size, 3) * 255).astype(np.uint8))


def _save_npz(tree, path):
    from synergize_motion_appearance_tpu.metrics.external import (
        flatten_params)

    np.savez(path, **flatten_params(tree))


@pytest.fixture()
def weights_dir(tmp_path, monkeypatch):
    d = tmp_path / "weights"
    d.mkdir()
    monkeypatch.setenv("SAMT_WEIGHTS_DIR", str(d))
    monkeypatch.delenv("SAMT_INCEPTION_WEIGHTS", raising=False)
    monkeypatch.delenv("SAMT_LPIPS_WEIGHTS", raising=False)
    monkeypatch.delenv("SAMT_OPENFACE_WEIGHTS", raising=False)
    return d


def test_fid_pipeline(tmp_path, weights_dir):
    from synergize_motion_appearance_tpu.metrics.external import (
        calculate_fid)
    from synergize_motion_appearance_tpu.metrics.inception import (
        FIDInceptionV3)

    params = FIDInceptionV3().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))["params"]
    _save_npz(jax.tree_util.tree_map(np.asarray, params),
              weights_dir / "inception.npz")

    d1, d2 = tmp_path / "a", tmp_path / "b"
    _write_images(str(d1), 5, seed=1)
    _write_images(str(d2), 5, seed=2)
    # batch 3 forces a padded last batch
    fid_ab = calculate_fid([str(d1), str(d2)], batch_size=3)
    assert np.isfinite(fid_ab)
    fid_aa = calculate_fid([str(d1), str(d1)], batch_size=3)
    # identical dirs -> ~0; different dirs -> larger
    assert abs(fid_aa) < 1e-3
    assert fid_ab > fid_aa


def test_fid_missing_weights_message(tmp_path, weights_dir):
    from synergize_motion_appearance_tpu.metrics.external import (
        calculate_fid)

    d1 = tmp_path / "a"
    _write_images(str(d1), 1)
    with pytest.raises(RuntimeError, match="SAMT_INCEPTION_WEIGHTS"):
        calculate_fid([str(d1), str(d1)])


def test_lpips_pipeline(tmp_path, weights_dir):
    from synergize_motion_appearance_tpu.metrics.external import (
        calculate_lpips)
    from synergize_motion_appearance_tpu.metrics.lpips_jax import LPIPSVgg

    params = LPIPSVgg().init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 32, 32, 3)),
                             jnp.zeros((1, 32, 32, 3)))["params"]
    # lin weights must be positive for a meaningful distance
    params = {k: (jnp.abs(v) if k.startswith("lin") else v)
              for k, v in params.items()}
    _save_npz(jax.tree_util.tree_map(np.asarray, params),
              weights_dir / "lpips_vgg.npz")

    d1, d2 = tmp_path / "r", tmp_path / "d"
    _write_images(str(d1), 4, seed=3)
    _write_images(str(d2), 4, seed=4)
    v = calculate_lpips(str(d1), str(d2), batch_size=3)
    assert np.isfinite(v) and v > 0
    same = calculate_lpips(str(d1), str(d1), batch_size=3)
    assert same < 1e-6


def test_lpips_name_mapping(tmp_path, weights_dir):
    """path2 files named `<stem>_d.png` pair with path1 `<stem>_g.png`
    (cmp_lpips.py:34)."""
    from synergize_motion_appearance_tpu.metrics.external import (
        _lpips_pairs)

    import cv2

    d1, d2 = tmp_path / "r", tmp_path / "d"
    os.makedirs(d1), os.makedirs(d2)
    img = np.zeros((8, 8, 3), np.uint8)
    cv2.imwrite(str(d1 / "clip0_g.png"), img)
    cv2.imwrite(str(d2 / "clip0_d.png"), img)
    pairs = _lpips_pairs(str(d1), str(d2))
    assert pairs == [(str(d1 / "clip0_g.png"), str(d2 / "clip0_d.png"))]


def test_aed_pipeline(tmp_path, weights_dir):
    from synergize_motion_appearance_tpu.metrics.external import (
        calculate_aed)
    from synergize_motion_appearance_tpu.metrics.openface import OpenFaceNet

    params = OpenFaceNet().init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 96, 96, 3)))["params"]
    _save_npz(jax.tree_util.tree_map(np.asarray, params),
              weights_dir / "openface.npz")

    d1, d2 = tmp_path / "gt", tmp_path / "gen"
    _write_images(str(d1), 3, size=64, seed=5)
    _write_images(str(d2), 3, size=64, seed=6)
    v = calculate_aed(str(d1), str(d2))
    assert np.isfinite(v) and v >= 0
    # embeddings are l2-normalized -> squared distance <= 4
    assert v <= 4.0
    assert calculate_aed(str(d1), str(d1)) < 1e-8


def test_lpips_training_loss(weights_dir):
    """LPIPSLoss (losses.py LPIPSLoss, reference losses.py:389-415) loads
    the same discovered weights and is differentiable."""
    from synergize_motion_appearance_tpu.losses import build_loss
    from synergize_motion_appearance_tpu.metrics.lpips_jax import LPIPSVgg

    with pytest.raises(RuntimeError, match="lpips"):
        build_loss({"type": "LPIPSLoss", "loss_weight": 1.0})

    params = LPIPSVgg().init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 32, 32, 3)),
                             jnp.zeros((1, 32, 32, 3)))["params"]
    params = {k: (jnp.abs(v) if k.startswith("lin") else v)
              for k, v in params.items()}
    _save_npz(jax.tree_util.tree_map(np.asarray, params),
              weights_dir / "lpips_vgg.npz")

    loss = build_loss({"type": "LPIPSLoss", "loss_weight": 2.0,
                       "range_norm": True})
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 32, 3) * 2 - 1, jnp.float32)
    gt = jnp.asarray(rng.rand(2, 32, 32, 3) * 2 - 1, jnp.float32)
    v = loss(x, gt)
    assert np.isfinite(float(v)) and float(v) > 0
    assert float(loss(gt, gt)) < 1e-6
    g = jax.grad(lambda a: loss(a, gt))(x)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0
