"""Native fused normalize+patchify (C, OpenMP) == numpy pipeline."""

import numpy as np
import pytest

from visionselector_tpu.native import (
    fused_normalize_patchify,
    native_available,
)
from visionselector_tpu.preprocess.image import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    normalize_image,
    patchify,
)

needs_cc = pytest.mark.skipif(not native_available(),
                              reason="no C compiler available")


def numpy_path(frames):
    normed = normalize_image(np.asarray(frames, np.float64))
    if normed.ndim == 3:
        normed = normed[None]
    return patchify(normed.transpose(0, 3, 1, 2))[0]


class TestFusedPreprocess:
    @needs_cc
    @pytest.mark.parametrize("dtype", [np.uint8, np.float64])
    def test_matches_numpy_single_image(self, dtype):
        rng = np.random.RandomState(0)
        img = (rng.rand(1, 56, 84, 3) * 255).astype(dtype)
        got = fused_normalize_patchify(
            img, 14, 2, 2, OPENAI_CLIP_MEAN, OPENAI_CLIP_STD)
        want = numpy_path(img)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-5)

    @needs_cc
    def test_matches_numpy_video_odd_frames(self):
        """Odd frame count exercises the temporal last-frame repeat."""
        rng = np.random.RandomState(1)
        frames = (rng.rand(5, 28, 56, 3) * 255).astype(np.uint8)
        got = fused_normalize_patchify(
            frames, 14, 2, 2, OPENAI_CLIP_MEAN, OPENAI_CLIP_STD)
        want = numpy_path(frames)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_preprocess_image_end_to_end_consistent(self, monkeypatch):
        """preprocess_image must give (near-)identical patches with the
        native path on and off."""
        from visionselector_tpu.preprocess.image import preprocess_image

        rng = np.random.RandomState(2)
        img = (rng.rand(56, 84, 3) * 255).astype(np.uint8)
        px_on, g_on = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        import visionselector_tpu.native as nat

        monkeypatch.setattr(nat, "_LIB", None)
        monkeypatch.setattr(nat, "_TRIED", True)  # force numpy fallback
        px_off, g_off = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        np.testing.assert_array_equal(g_on, g_off)
        np.testing.assert_allclose(px_on, px_off, atol=2e-5)
