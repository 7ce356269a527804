"""Released-weights ingest path (docs/RELEASE_WEIGHTS.md) — fast pieces.

The full drill (fabricated reference-format bundle -> convert ->
round-trip-verify every tensor -> demo load -> non-degenerate metric
battery) is tools/drill_release_ingest.py (flagship shapes, minutes).
These tests pin the fast-tier invariants the drill depends on:
converted metric-backbone trees structurally match the flax models
(via eval_shape, no compute), the .npz load path in
training/checkpoint.py, and the antialias buffer emitted by the
reverse exporter (vs the live torch reference construction,
motion_estimator_util.py:599-632).
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from drill_release_ingest import (  # noqa: E402
    _fabricate_inception_sd,
    _fabricate_vgg16_lpips,
)


def _tree_shapes(tree):
    return jax.tree_util.tree_map(lambda x: tuple(x.shape), tree)


def test_fabricated_inception_sd_converts_to_model_structure():
    """pt_inception-format keys (incl. the fc/AuxLogits entries the
    converter must drop) -> exactly FIDInceptionV3's param tree."""
    from synergize_motion_appearance_tpu.metrics.inception import (
        FIDInceptionV3, convert_torch_inception)

    sd = {k: v.numpy() for k, v in _fabricate_inception_sd().items()}
    tree = convert_torch_inception(sd)
    expected = jax.eval_shape(
        FIDInceptionV3().init, jax.random.PRNGKey(0),
        jnp.zeros((1, 299, 299, 3)))["params"]
    assert _tree_shapes(tree) == _tree_shapes(expected)


def test_fabricated_vgg16_lpips_converts_to_model_structure():
    from synergize_motion_appearance_tpu.metrics.lpips_jax import (
        LPIPSVgg, convert_lpips_weights)

    vgg_sd, lin_sd = _fabricate_vgg16_lpips()
    tree = convert_lpips_weights(
        {k: v.numpy() for k, v in vgg_sd.items()},
        {k: v.numpy() for k, v in lin_sd.items()})
    x = jnp.zeros((1, 64, 64, 3))
    expected = jax.eval_shape(
        LPIPSVgg().init, jax.random.PRNGKey(0), x, x)["params"]
    assert _tree_shapes(tree) == _tree_shapes(expected)


def test_load_variables_npz_roundtrip(tmp_path):
    """checkpoint.load_variables reads converter-written .npz files:
    param_key selection, params fallback, and batch_stats ride-along."""
    from synergize_motion_appearance_tpu.training.checkpoint import (
        load_variables)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from convert_vgg_weights import flatten

    tree = {
        "params": {"block": {"kernel": np.ones((3, 3, 2, 4),
                                                np.float32)}},
        "batch_stats": {"block": {"mean": np.zeros((4,), np.float32)}},
    }
    p = str(tmp_path / "net.npz")
    np.savez(p, **flatten(tree))

    out = load_variables(p, "params")
    np.testing.assert_array_equal(out["params"]["block"]["kernel"],
                                  tree["params"]["block"]["kernel"])
    np.testing.assert_array_equal(
        out["batch_stats"]["block"]["mean"],
        tree["batch_stats"]["block"]["mean"])
    # params_ema missing -> falls back to params (base_model.py:247-252)
    out2 = load_variables(p, "params_ema")
    np.testing.assert_array_equal(out2["params"]["block"]["kernel"],
                                  tree["params"]["block"]["kernel"])
    # a bare tree (no 'params' level, e.g. vgg19_flax.npz) loads whole
    p3 = str(tmp_path / "bare.npz")
    np.savez(p3, **flatten(tree["params"]))
    out3 = load_variables(p3)
    np.testing.assert_array_equal(out3["params"]["block"]["kernel"],
                                  tree["params"]["block"]["kernel"])


def test_antialias_buffer_matches_reference():
    """The reverse exporter's emitted AntiAliasInterpolation2d buffer
    equals the live torch reference's (so exported state_dicts load
    strict=True in the reference)."""
    from _reference_oracle import import_reference
    from convert_reference_checkpoint import _antialias_weight

    if import_reference() is None:
        pytest.skip("reference checkout unavailable")
    from basicsr.utils.motion_estimator_util import (
        AntiAliasInterpolation2d)

    for scale in (0.25, 0.5):
        ref = AntiAliasInterpolation2d(3, scale).weight.numpy()
        got = _antialias_weight(3, scale)
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-7)
