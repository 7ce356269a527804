"""find_best_frame parity vs the reference oracle with INJECTED landmarks.

The reference criterion (demo.py:74-101) runs face_alignment per frame and
picks the driving frame whose hull-normalized 68-landmark set is closest
(squared L2) to the source's. face_alignment isn't installed in this
image, so both sides get the same deterministic fake — landmarks derived
from image content — which exercises the full criterion (centering, hull
area scaling, per-frame failure skip) without the heavy model.
"""
import sys
import types
from os import path as osp

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from _reference_oracle import import_reference  # noqa: E402

basicsr = import_reference()
pytestmark = pytest.mark.skipif(
    basicsr is None, reason="/root/reference not available")


def _install_fake_face_alignment(fail_first_pixels=()):
    """Deterministic landmarks as a SMOOTH function of image content (so
    float32-vs-float64 plumbing differences of ~1e-7 can't flip the
    argmin); frames whose first pixel matches `fail_first_pixels` return
    None (detection failure)."""

    def landmarks_for(img):
        img = np.asarray(img, np.float64)  # 0..255 domain
        p0 = float(img.reshape(-1)[0])
        for fv in fail_first_pixels:
            if abs(p0 - fv) < 1e-3:
                return None
        base = np.random.RandomState(1234).rand(68, 2) * 200.0 + 28.0
        vals = img.reshape(-1)[:136].reshape(68, 2) / 255.0
        return [base + vals * 40.0]

    mod = types.ModuleType("face_alignment")

    class LandmarksType:
        TWO_D = "2d"
        # older face_alignment spells it _2D; the reference uses TWO_D
        _2D = "2d"

    class FaceAlignment:
        def __init__(self, *a, **k):
            pass

        def get_landmarks(self, img):
            return landmarks_for(img)

    mod.LandmarksType = LandmarksType
    mod.FaceAlignment = FaceAlignment
    mod._landmarks_for = landmarks_for
    return mod


@pytest.fixture()
def fake_fa(monkeypatch):
    mod = _install_fake_face_alignment()
    monkeypatch.setitem(sys.modules, "face_alignment", mod)
    return mod


def _inputs(n_frames=9, seed=0):
    rng = np.random.RandomState(seed)
    source01 = rng.rand(64, 64, 3).astype(np.float32)
    driving01 = rng.rand(n_frames, 64, 64, 3).astype(np.float32)
    return source01, driving01


def test_find_best_frame_matches_reference_oracle(fake_fa):
    import importlib

    ref_demo = importlib.import_module("basicsr.demo")
    from synergize_motion_appearance_tpu.inference import find_best_frame

    source01, driving01 = _inputs()
    want = ref_demo.find_best_frame(source01, driving01, cpu=True)

    # ours takes model-domain [-1,1] frames (the demo CLI's working
    # domain) and maps back to the reference's [0,1] protocol internally
    got = find_best_frame(source01 * 2 - 1, driving01 * 2 - 1)
    assert got == want


def test_find_best_frame_uint8_domain(fake_fa):
    import importlib

    ref_demo = importlib.import_module("basicsr.demo")
    from synergize_motion_appearance_tpu.inference import find_best_frame

    source01, driving01 = _inputs(seed=3)
    # quantize so the uint8 path sees bit-identical content
    src_u8 = (source01 * 255).astype(np.uint8)
    drv_u8 = (driving01 * 255).astype(np.uint8)
    want = ref_demo.find_best_frame(src_u8 / 255.0, drv_u8 / 255.0,
                                    cpu=True)
    got = find_best_frame(src_u8, drv_u8)
    assert got == want


def test_find_best_frame_skips_failed_detection(monkeypatch):
    """A frame where detection fails must be skipped, not crash, and not
    be selected (reference's per-frame try/except, demo.py:92-100)."""
    from synergize_motion_appearance_tpu.inference import find_best_frame

    source01, driving01 = _inputs(seed=5)
    mod = _install_fake_face_alignment()
    # compute the honest winner, then make that frame "fail"
    monkeypatch.setitem(sys.modules, "face_alignment", mod)
    honest = find_best_frame(source01 * 2 - 1, driving01 * 2 - 1)

    fail_px = float(driving01[honest].reshape(-1)[0]) * 255.0
    failing = _install_fake_face_alignment(fail_first_pixels=(fail_px,))
    monkeypatch.setitem(sys.modules, "face_alignment", failing)
    got = find_best_frame(source01 * 2 - 1, driving01 * 2 - 1)
    assert got != honest
    assert 0 <= got < driving01.shape[0]


def test_find_best_frame_falls_back_to_pipeline_kp(monkeypatch):
    """Without face_alignment, find_best_frame must route to the
    unsupervised-keypoint fallback (and only then)."""
    import builtins

    from synergize_motion_appearance_tpu import inference

    real_import = builtins.__import__

    def no_fa(name, *a, **k):
        if name == "face_alignment":
            raise ImportError("not installed")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_fa)
    monkeypatch.setitem(sys.modules, "face_alignment", None)
    sys.modules.pop("face_alignment", None)

    calls = {}

    def fake_kp(pipeline, s, d):
        calls["hit"] = True
        return 4

    monkeypatch.setattr(inference, "find_best_frame_kp", fake_kp)
    source01, driving01 = _inputs(seed=7)
    got = inference.find_best_frame(source01, driving01,
                                    pipeline=object())
    assert got == 4 and calls.get("hit")
