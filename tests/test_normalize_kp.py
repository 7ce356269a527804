"""normalize_kp golden parity vs the reference demo loop's kp math.

The reference's relative-motion transfer (demo.py:24-44) is the heart of
the animation loop: ConvexHull-area adapt scale, relative value diff, and
jacobian-ratio composition (J_d · J_i⁻¹ · J_s). `normalize_kp_jnp`
(inference.py:30-59) reimplements it batched over frames in jnp; this
test feeds both sides identical injected kp dicts and compares value and
jacobian outputs frame-for-frame. Full-pipeline stitched-video parity is
the slow-tier tool `tools/validate_reference_parity.py --demo`.
"""
import sys
from os import path as osp

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from _reference_oracle import import_reference  # noqa: E402

basicsr = import_reference()
pytestmark = pytest.mark.skipif(
    basicsr is None, reason="/root/reference not available")


def _inject_kps(n_frames=5, seed=0):
    """kp dicts in the detector's output format: value (B,15,2) in [-1,1],
    jacobian (B,15,2,2) well-conditioned (I + small perturbation, like the
    near-identity jacobians a trained detector emits)."""
    rng = np.random.RandomState(seed)

    def kp(batch, jac_scale=0.35):
        return {
            "value": (rng.rand(batch, 15, 2).astype(np.float32) * 1.6 - 0.8),
            "jacobian": (
                np.eye(2, dtype=np.float32)[None, None]
                + jac_scale * (rng.rand(batch, 15, 2, 2).astype(np.float32)
                               - 0.5)
            ),
        }

    return kp(1), kp(n_frames), kp(1)


@pytest.mark.parametrize(
    "relative,adapt",
    [(True, True), (True, False), (False, True), (False, False)],
)
def test_normalize_kp_matches_reference(relative, adapt):
    import torch

    import basicsr.demo as ref_demo

    from synergize_motion_appearance_tpu.inference import normalize_kp_jnp

    kp_s, kp_d, kp_i = _inject_kps()
    n = kp_d["value"].shape[0]

    # reference: per-frame batch-1 calls, exactly like demo.py:117-125
    ref_vals, ref_jacs = [], []
    for f in range(n):
        kp_df = {k: torch.from_numpy(v[f:f + 1]) for k, v in kp_d.items()}
        out = ref_demo.normalize_kp(
            kp_source={k: torch.from_numpy(v) for k, v in kp_s.items()},
            kp_driving=kp_df,
            kp_driving_initial={
                k: torch.from_numpy(v) for k, v in kp_i.items()
            },
            use_relative_movement=relative,
            use_relative_jacobian=relative,
            adapt_movement_scale=adapt,
        )
        ref_vals.append(out["value"].numpy()[0])
        ref_jacs.append(out["jacobian"].numpy()[0])

    got = normalize_kp_jnp(
        {k: np.asarray(v) for k, v in kp_s.items()},
        {k: np.asarray(v) for k, v in kp_d.items()},
        {k: np.asarray(v) for k, v in kp_i.items()},
        adapt_movement_scale=adapt,
        use_relative_movement=relative,
        use_relative_jacobian=relative,
    )

    np.testing.assert_allclose(
        np.asarray(got["value"]), np.stack(ref_vals), atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got["jacobian"]), np.stack(ref_jacs),
        atol=5e-6, rtol=1e-5)


def test_normalize_kp_hull_scale_value():
    """The adapt scale must be sqrt(hull(source))/sqrt(hull(initial)) —
    checked against scipy directly so a hull regression can't hide behind
    a relative-off path (demo.py:26-29)."""
    from scipy.spatial import ConvexHull

    from synergize_motion_appearance_tpu.inference import normalize_kp_jnp

    kp_s, kp_d, kp_i = _inject_kps(seed=3)
    got = normalize_kp_jnp(
        kp_s, kp_d, kp_i, adapt_movement_scale=True,
        use_relative_movement=True, use_relative_jacobian=False)
    scale = np.sqrt(ConvexHull(kp_s["value"][0]).volume) / np.sqrt(
        ConvexHull(kp_i["value"][0]).volume)
    expect = (kp_d["value"] - kp_i["value"]) * scale + kp_s["value"]
    np.testing.assert_allclose(np.asarray(got["value"]), expect,
                               atol=2e-6, rtol=1e-5)
