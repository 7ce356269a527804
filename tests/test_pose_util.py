"""Pose-math parity: euler<->matrix vs scipy's Rotation (the reference's
backend, norm_pose/utils/pose_util.py) + projection round-trips."""
import numpy as np
import pytest

from synergize_motion_appearance_tpu.metrics import pose_util as pu


def test_euler_matrix_roundtrip_vs_scipy():
    scipy_tf = pytest.importorskip("scipy.spatial.transform")
    R = scipy_tf.Rotation
    rng = np.random.RandomState(0)
    for _ in range(20):
        euler = rng.uniform(-80, 80, 3)
        t = rng.randn(3)
        m = pu.euler_and_translation_to_matrix(euler, t)
        m_ref = np.eye(4)
        m_ref[:3, :3] = R.from_euler("xyz", euler, degrees=True).as_matrix()
        m_ref[:3, 3] = t
        np.testing.assert_allclose(m, m_ref, atol=1e-12)

        e2, t2 = pu.matrix_to_euler_and_translation(m)
        np.testing.assert_allclose(e2, euler, atol=1e-9)
        np.testing.assert_allclose(t2, t, atol=1e-12)


def test_perspective_matrix_constants():
    p = pu.create_perspective_matrix(1.0)
    assert p.shape == (16,)
    f = 1.0 / np.tan(np.deg2rad(63.0) / 2.0)
    assert np.isclose(p[0], f)
    assert np.isclose(p[5], -f)  # Y-flip for top-left origin
    assert np.isclose(p[11], -1.0)


def test_project_invert_roundtrip():
    rng = np.random.RandomState(1)
    L, N = 3, 17
    pts = rng.randn(L, N, 3) * 2.0
    pts[..., 2] -= 30.0  # in front of the camera
    pose = np.concatenate(
        [rng.uniform(-20, 20, (L, 3)), rng.randn(L, 3)], axis=1)
    T = pu.euler_and_translation_to_matrix([5.0, -3.0, 2.0], [0, 0, -1])
    proj = pu.project_points(pts, T, pose, (256, 256))
    assert proj.shape == (L, N, 2)
    # invert_projection lifts screen points at the z=1 homogeneous plane
    # (matching the reference), so a full 3D round-trip only recovers the
    # ray; check the re-projection instead.
    back = pu.invert_projection(proj.copy(), T, pose, (256, 256))
    reproj = pu.project_points(back, T, pose, (256, 256))
    np.testing.assert_allclose(reproj, proj, atol=1e-4)


def test_project_with_trans_matches_per_frame_pose_at_identity():
    rng = np.random.RandomState(2)
    pts = rng.randn(2, 9, 3) - np.array([0, 0, 25.0])
    T = pu.euler_and_translation_to_matrix([1.0, 2.0, 3.0], [0.1, 0, -2])
    a = pu.project_points_with_trans(pts, T, (128, 128))
    b = pu.project_points(pts, T, np.zeros((2, 6)), (128, 128))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_smooth_pose_seq_edges():
    seq = np.arange(10, dtype=np.float64)[:, None]
    sm = pu.smooth_pose_seq(seq, window_size=5)
    assert np.isclose(sm[0, 0], np.mean([0, 1, 2]))
    assert np.isclose(sm[5, 0], np.mean([3, 4, 5, 6, 7]))
    assert np.isclose(sm[-1, 0], np.mean([7, 8, 9]))
