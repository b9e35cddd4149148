"""Video-path tests: varlen prefill over compressed frame-token sequences."""

import jax
import numpy as np
import pytest

from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.models.qwen25vl.model import QwenVLEngine, init_params
from visionselector_tpu.preprocess.image import preprocess_video_frames
from visionselector_tpu.preprocess.rope import expand_vision_tokens, get_rope_index

CFG = qwen25vl_tiny()


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


def make_video(t=8, h=56, w=56, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(t, h, w, 3) * 255).astype(np.uint8)


class TestVideoPreprocess:
    def test_temporal_grid(self):
        frames = make_video(t=8)
        pixels, grid = preprocess_video_frames(
            frames, min_pixels=1, max_pixels=10**9
        )
        t, h, w = grid[0]
        assert t == 4  # 8 frames / temporal_patch 2
        assert pixels.shape == (t * h * w, 1176)


class TestVideoGeneration:
    def test_selector_video_10pct(self, params):
        """Config-4 shape: video at 10% retention."""
        frames = make_video(t=8)
        pixels, grid = preprocess_video_frames(
            frames, min_pixels=1, max_pixels=10**9
        )
        n = pixels.shape[0] // 4
        ids = expand_vision_tokens(
            [100, 200], [300], grid,
            image_token_id=CFG.video_token_id,
        )
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.1)
        res = eng.generate(
            ids,
            pixel_values_videos=pixels,
            video_grid_thw=grid,
            second_per_grid_ts=np.array([1.0]),
            max_new_tokens=3,
        )
        k = max(1, int(n * 0.1))
        assert len(res.selected_indices) == k
        assert res.num_vision_tokens == n
        assert res.prefill_len == (len(ids) - n) + k
        assert len(res.tokens) >= 1

    def test_video_rope_temporal_axis(self, params):
        """Selected video tokens must keep their ORIGINAL temporal rope ids
        (position ids computed pre-compaction then gathered)."""
        frames = make_video(t=4)
        pixels, grid = preprocess_video_frames(
            frames, min_pixels=1, max_pixels=10**9
        )
        ids = expand_vision_tokens(
            [7], [9], grid, image_token_id=CFG.video_token_id
        )
        pos, delta = get_rope_index(
            ids, video_grid_thw=grid, second_per_grid_ts=np.array([2.0]),
            tokens_per_second=CFG.vision.tokens_per_second,
        )
        # temporal ids inside the video run step by 2.0 * tokens_per_second
        video_pos = np.where(ids == CFG.video_token_id)[0]
        t_ids = pos[0, video_pos]
        per_frame = len(video_pos) // int(grid[0][0])
        step = t_ids[per_frame] - t_ids[0]
        assert step == 2.0 * CFG.vision.tokens_per_second

    def test_video_without_selector(self, params):
        frames = make_video(t=4)
        pixels, grid = preprocess_video_frames(
            frames, min_pixels=1, max_pixels=10**9
        )
        ids = expand_vision_tokens(
            [100], [300], grid, image_token_id=CFG.video_token_id
        )
        eng = QwenVLEngine(CFG, params, use_selector=False)
        res = eng.generate(
            ids, pixel_values_videos=pixels, video_grid_thw=grid,
            max_new_tokens=2,
        )
        assert res.prefill_len == len(ids)
