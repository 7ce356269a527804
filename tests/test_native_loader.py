"""Native C++ frame-cache loader: build, pack, sample, validate."""
import numpy as np
import pytest


def test_native_framecache_roundtrip(tmp_path):
    try:
        from synergize_motion_appearance_tpu.data.native_loader import (
            NativeFrameCacheLoader, load_library, write_cache,
        )
        load_library()
    except Exception as e:
        pytest.skip(f"native toolchain unavailable: {e}")

    rng = np.random.RandomState(0)
    h = w = 16
    frames_per_video = [3, 5, 2]
    all_frames = []

    def videos():
        for nf in frames_per_video:
            vid = [
                (rng.rand(h, w, 3) * 255).astype(np.uint8)
                for _ in range(nf)
            ]
            all_frames.append(vid)

            def gen(vid=vid):
                yield from vid

            yield nf, gen()

    cache = str(tmp_path / "tiny.fc")
    write_cache(cache, videos(), h, w, 3)

    loader = NativeFrameCacheLoader(cache, batch_size=4, num_workers=2,
                                    seed=7)
    assert loader.num_videos == 3

    # raw frame round-trip
    got = loader.get_frame(1, 2)
    np.testing.assert_array_equal(got, all_frames[1][2])

    # sampled batches: right shape, normalized range, values drawn from
    # the normalized frame set
    for _ in range(3):
        batch = loader.next()
        assert batch["source"].shape == (4, h, w, 3)
        assert batch["driving"].shape == (4, h, w, 3)
        assert batch["source"].min() >= -1.0 - 1e-5
        assert batch["source"].max() <= 1.0 + 1e-5
        # each sample must match some normalized (possibly flipped) frame
        norm = [
            (f.astype(np.float32) / 255.0 - 0.5) / 0.5
            for vid in all_frames for f in vid
        ]
        for b in range(4):
            s = batch["source"][b]
            ok = any(
                np.allclose(s, f, atol=1e-5)
                or np.allclose(s, f[:, ::-1], atol=1e-5)
                for f in norm
            )
            assert ok, "sampled frame not found in source set"
    loader.close()
