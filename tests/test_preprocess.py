"""Unit tests for host-side preprocessing: smart_resize, patchify, indices."""

import numpy as np
import pytest

from visionselector_tpu.preprocess.image import (
    normalize_image,
    patchify,
    preprocess_image,
    smart_resize,
)
from visionselector_tpu.preprocess.indices import (
    build_vision_batch,
    cu_seqlens_to_segment_ids,
    full_attn_cu_seqlens,
    get_window_index,
    vision_rot_pos_ids,
)


class TestSmartResize:
    def test_divisible_by_factor(self):
        for h, w in [(100, 200), (1080, 1920), (28, 28), (333, 777)]:
            hb, wb = smart_resize(h, w)
            assert hb % 28 == 0 and wb % 28 == 0

    def test_pixel_bounds(self):
        hb, wb = smart_resize(10000, 10000)
        assert hb * wb <= 16384 * 28 * 28
        hb, wb = smart_resize(30, 30)
        assert hb * wb >= 4 * 28 * 28

    def test_golden_values(self):
        # round_by_factor path: 640x480 -> nearest multiples of 28.
        assert smart_resize(480, 640) == (476, 644)
        # exact multiples stay put.
        assert smart_resize(560, 840) == (560, 840)
        # max_pixels clamp with processor bounds (1003520 px budget).
        hb, wb = smart_resize(2000, 3000, min_pixels=56 * 56, max_pixels=28 * 28 * 1280)
        assert hb * wb <= 28 * 28 * 1280
        assert hb % 28 == 0 and wb % 28 == 0

    def test_aspect_ratio_guard(self):
        with pytest.raises(ValueError):
            smart_resize(10, 10000)


class TestPatchify:
    def test_shapes(self):
        frames = np.random.rand(1, 3, 56, 84).astype(np.float32)
        flat, (t, h, w) = patchify(frames)
        assert (t, h, w) == (1, 4, 6)
        assert flat.shape == (24, 3 * 2 * 14 * 14)

    def test_temporal_repeat_single_image(self):
        """A single frame is repeated across the temporal patch, so both
        temporal slices of each flattened patch are identical."""
        frames = np.random.rand(1, 3, 28, 28).astype(np.float32)
        flat, _ = patchify(frames)
        per = flat.reshape(-1, 3, 2, 14, 14)
        np.testing.assert_array_equal(per[:, :, 0], per[:, :, 1])

    def test_block_order(self):
        """Rows are ordered by (merge-block row, merge-block col, then 2x2
        within-block row-major) — the order the ViT merger assumes."""
        h_pix, w_pix = 56, 56  # 4x4 patches, 2x2 merge blocks
        img = np.zeros((1, 3, h_pix, w_pix), np.float32)
        # Tag each 14x14 patch with a unique constant = row*4 + col.
        for r in range(4):
            for c in range(4):
                img[0, :, r * 14 : (r + 1) * 14, c * 14 : (c + 1) * 14] = r * 4 + c
        flat, _ = patchify(img)
        tags = flat[:, 0]  # first element identifies the patch
        expected = [0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15]
        np.testing.assert_array_equal(tags, expected)

    def test_video_grid_t(self):
        frames = np.random.rand(4, 3, 28, 28).astype(np.float32)
        flat, (t, h, w) = patchify(frames)
        assert t == 2 and flat.shape[0] == t * h * w

    def test_preprocess_image_end_to_end(self):
        img = (np.random.rand(100, 150, 3) * 255).astype(np.uint8)
        flat, grid = preprocess_image(img)
        t, h, w = grid[0]
        assert flat.shape == (t * h * w, 1176)
        assert h % 2 == 0 and w % 2 == 0

    def test_uint8_array_resize_matches_pil_input(self):
        """A uint8 numpy image that NEEDS resizing routes through PIL
        BICUBIC (the HF processor converts numpy to PIL before its
        BICUBIC resample), so the array-input and PIL-input paths must be
        bit-identical. The float-array fallback stays bilinear."""
        from PIL import Image

        img = (np.random.RandomState(3).rand(1036, 1456, 3) * 255).astype(
            np.uint8)
        flat_arr, grid_arr = preprocess_image(img)
        flat_pil, grid_pil = preprocess_image(Image.fromarray(img))
        np.testing.assert_array_equal(grid_arr, grid_pil)
        np.testing.assert_array_equal(flat_arr, flat_pil)

    def test_uint8_video_frames_resize_matches_image_path(self):
        """Video frames (uint8, needing resize) use the same PIL BICUBIC
        per frame: one repeated frame must patchify to the image path's
        rows (temporal repeat aside)."""
        from visionselector_tpu.preprocess.image import (
            preprocess_video_frames,
        )

        rng = np.random.RandomState(4)
        frame = (rng.rand(480, 854, 3) * 255).astype(np.uint8)
        flat_img, grid_img = preprocess_image(
            frame, min_pixels=128 * 28 * 28, max_pixels=768 * 28 * 28)
        flat_vid, grid_vid = preprocess_video_frames(
            np.stack([frame, frame]))
        np.testing.assert_array_equal(grid_img[0][1:], grid_vid[0][1:])
        np.testing.assert_array_equal(flat_img, flat_vid)


class TestNormalize:
    def test_range(self):
        img = np.full((4, 4, 3), 255.0)
        out = normalize_image(img)
        # (1 - mean) / std for channel 0
        np.testing.assert_allclose(out[0, 0, 0], (1 - 0.48145466) / 0.26862954)


class TestWindowIndex:
    def test_permutation(self):
        grid = np.array([[1, 16, 20]])  # 8x10 merged
        wi, cu = get_window_index(grid)
        n = 8 * 10
        assert sorted(wi.tolist()) == list(range(n))
        assert cu[0] == 0 and cu[-1] == 16 * 20  # patch-level total

    def test_small_exact(self):
        """2x2 merged grid with window covering 4x4 merged positions: single
        window, identity permutation."""
        grid = np.array([[1, 4, 4]])
        wi, cu = get_window_index(grid)
        np.testing.assert_array_equal(wi, [0, 1, 2, 3])
        np.testing.assert_array_equal(cu, [0, 16])

    def test_ragged_windows(self):
        """6x6 merged grid, 4x4 windows -> 2x2 windows of sizes 16/8/8/4."""
        grid = np.array([[1, 12, 12]])
        wi, cu = get_window_index(grid)
        assert sorted(wi.tolist()) == list(range(36))
        seqlens = np.diff(cu) // 4  # merged tokens per window
        np.testing.assert_array_equal(seqlens, [16, 8, 8, 4])
        # First window = top-left 4x4 block of the 6x6 merged grid.
        first = set(wi[:16].tolist())
        expected = {r * 6 + c for r in range(4) for c in range(4)}
        assert first == expected

    def test_multi_image(self):
        grid = np.array([[1, 8, 8], [1, 4, 4]])
        wi, cu = get_window_index(grid)
        assert sorted(wi.tolist()) == list(range(16 + 4))
        assert cu[-1] == (64 + 16)
        # second image's indices are offset past the first image's.
        assert set(wi.tolist()[-4:]) == {16, 17, 18, 19}


class TestRotPosIds:
    def test_block_order(self):
        grid = np.array([[1, 4, 4]])
        ids = vision_rot_pos_ids(grid)
        # merge-block order: block (0,0) rows (0,0),(0,1),(1,0),(1,1) ...
        expected_first8 = [
            (0, 0), (0, 1), (1, 0), (1, 1),
            (0, 2), (0, 3), (1, 2), (1, 3),
        ]
        np.testing.assert_array_equal(ids[:8], expected_first8)

    def test_temporal_tile(self):
        grid = np.array([[2, 2, 2]])
        ids = vision_rot_pos_ids(grid)
        assert ids.shape == (8, 2)
        np.testing.assert_array_equal(ids[:4], ids[4:])


class TestSegments:
    def test_cu_to_seg(self):
        seg = cu_seqlens_to_segment_ids(np.array([0, 3, 5]), 7)
        np.testing.assert_array_equal(seg, [1, 1, 1, 2, 2, 0, 0])

    def test_full_attn_boundaries(self):
        cu = full_attn_cu_seqlens(np.array([[2, 4, 6], [1, 2, 2]]))
        np.testing.assert_array_equal(cu, [0, 24, 48, 52])


class TestVisionBatch:
    def test_build_and_pad(self):
        grid = np.array([[1, 8, 8]])
        pixels = np.random.randn(64, 1176).astype(np.float32)
        vb = build_vision_batch(pixels, grid, pad_to=128)
        assert vb.pixel_values.shape == (128, 1176)
        assert vb.num_patches == 64 and vb.num_merged == 16
        assert vb.window_seg_ids.shape == (128,)
        # padding rows have segment id 0
        assert (vb.window_seg_ids[64:] == 0).all()
        assert (vb.full_seg_ids[64:] == 0).all()
        assert (vb.window_seg_ids[:64] > 0).all()
        # reverse_index inverts window_index
        perm = vb.window_index
        inv = vb.reverse_index
        np.testing.assert_array_equal(perm[inv], np.arange(32))

    def test_window_permutation_applied(self):
        """Patch rows are permuted in merge-unit groups of the window index."""
        grid = np.array([[1, 12, 12]])
        pixels = np.arange(144, dtype=np.float32)[:, None].repeat(4, 1)
        vb = build_vision_batch(pixels, grid)
        wi, _ = get_window_index(grid)
        expected = (wi[:, None] * 4 + np.arange(4)[None, :]).reshape(-1)
        np.testing.assert_array_equal(vb.pixel_values[:, 0], expected)


class TestAlignedWindows:
    """Window-aligned ViT layout (align_windows=True): every window gets its
    own 64-patch slot so window attention is block-diagonal."""

    def _build_pair(self, grid, pad_to_aligned=None):
        from visionselector_tpu.preprocess.indices import aligned_window_len

        n_patches = int((grid[:, 0] * grid[:, 1] * grid[:, 2]).sum())
        pixels = np.arange(n_patches, dtype=np.float32)[:, None].repeat(4, 1)
        need = aligned_window_len(grid)
        pad = pad_to_aligned or need
        vb_a = build_vision_batch(pixels, grid, pad_to=pad, align_windows=True)
        vb_u = build_vision_batch(pixels, grid, pad_to=pad)
        return pixels, vb_a, vb_u, need

    def test_ragged_image_layout(self):
        grid = np.array([[1, 20, 12]])  # llm grid 10x6: ragged 4-wide windows
        pixels, vb, _, need = self._build_pair(grid)
        slot = 64
        assert need % slot == 0
        # every window's rows live inside one aligned slot
        seg = vb.window_seg_ids
        for sid in range(1, seg.max() + 1):
            rows = np.where(seg == sid)[0]
            assert len(rows) > 0
            assert rows[0] // slot == rows[-1] // slot, sid
            np.testing.assert_array_equal(rows, np.arange(rows[0], rows[-1] + 1))
        # reverse_index restores the original merged order: merged token j's
        # 4 patch rows carry values 4j..4j+3
        l = vb.num_merged
        merged_slot_first_patch = vb.reverse_index[:l] * 4
        vals = vb.pixel_values[np.asarray(merged_slot_first_patch), 0]
        np.testing.assert_array_equal(vals, np.arange(l) * 4)

    def test_full_segments_preserved(self):
        grid = np.array([[1, 8, 8], [1, 12, 8]])
        pixels, vb_a, vb_u, _ = self._build_pair(grid)
        # per-image token counts identical in both layouts
        for sid in (1, 2):
            assert (vb_a.full_seg_ids == sid).sum() == (
                vb_u.full_seg_ids == sid
            ).sum()
        # full kv bounds cover every row of each segment
        from visionselector_tpu.kernels.attention import VIT_BLOCK

        fblock = min(VIT_BLOCK, len(vb_a.full_seg_ids))
        rows = np.where(vb_a.full_seg_ids > 0)[0]
        bounds = vb_a.full_kv_bounds
        for r in rows:
            lo, hi = bounds[r // fblock]
            assert lo * fblock <= r < hi * fblock

    def test_window_diag_flag(self):
        grid = np.array([[1, 16, 16]])
        n = 256
        pixels = np.random.randn(n, 4).astype(np.float32)
        vb = build_vision_batch(pixels, grid, pad_to=256, align_windows=True)
        assert vb.window_diag  # 256-slot layout, wblock==s_pad or %64==0

    def test_vit_forward_equal_aligned_vs_not(self):
        """The aligned layout is a pure re-packing: ViT outputs (original
        order, real rows) must match the classic layout bit-for-bit in f32."""
        import jax
        from visionselector_tpu.core.config import qwen25vl_tiny
        from visionselector_tpu.models.qwen25vl import vit as vit_mod
        from visionselector_tpu.models.qwen25vl.model import init_params

        cfg = qwen25vl_tiny()
        grid = np.array([[1, 10, 6]])  # ragged windows for the tiny config
        n_patches = 60
        rng = np.random.RandomState(0)
        pixels = rng.randn(n_patches, cfg.vision.patch_dim).astype(np.float32)
        from visionselector_tpu.preprocess.indices import aligned_window_len

        need = aligned_window_len(
            grid, window_size=cfg.vision.window_size,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            patch_size=cfg.vision.patch_size,
        )
        pad = max(need, 128)
        kw = dict(
            window_size=cfg.vision.window_size,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            patch_size=cfg.vision.patch_size, pad_to=pad,
        )
        vb_a = build_vision_batch(pixels, grid, align_windows=True, **kw)
        vb_u = build_vision_batch(pixels, grid, **kw)
        params = init_params(jax.random.PRNGKey(0), cfg, with_selector=False)

        def run(vb):
            out = vit_mod.vit_forward(
                params["visual"], vb.pixel_values, vb.rot_pos_ids,
                vb.window_seg_ids, vb.full_seg_ids, vb.reverse_index,
                cfg.vision,
            )
            return np.asarray(out)[: vb.num_merged]

        np.testing.assert_allclose(run(vb_a), run(vb_u), atol=1e-5)

    def test_vit_forward_diag_kernel_matches_xla(self, monkeypatch):
        """window_diag=True routes window layers through attention_diag
        (pallas interpret on CPU); outputs must match the XLA masked path."""
        import jax
        from visionselector_tpu.core.config import qwen25vl_tiny
        from visionselector_tpu.models.qwen25vl import vit as vit_mod
        from visionselector_tpu.models.qwen25vl.model import init_params
        from visionselector_tpu.preprocess.indices import aligned_window_len

        cfg = qwen25vl_tiny()
        grid = np.array([[1, 10, 6]])
        rng = np.random.RandomState(0)
        pixels = rng.randn(60, cfg.vision.patch_dim).astype(np.float32)
        need = aligned_window_len(
            grid, window_size=cfg.vision.window_size,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            patch_size=cfg.vision.patch_size,
        )
        vb = build_vision_batch(
            pixels, grid, window_size=cfg.vision.window_size,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            patch_size=cfg.vision.patch_size, pad_to=max(need, 128),
            align_windows=True,
        )
        params = init_params(jax.random.PRNGKey(0), cfg, with_selector=False)

        def run(impl, diag):
            monkeypatch.setenv("VST_ATTN_IMPL", impl)
            out = vit_mod.vit_forward(
                params["visual"], vb.pixel_values, vb.rot_pos_ids,
                vb.window_seg_ids, vb.full_seg_ids, vb.reverse_index,
                cfg.vision,
                window_kv_bounds=vb.window_kv_bounds,
                full_kv_bounds=vb.full_kv_bounds,
                window_diag=diag,
            )
            return np.asarray(out)[: vb.num_merged]

        got = run("pallas_interpret", vb.window_diag)
        want = run("xla", False)
        np.testing.assert_allclose(got, want, atol=1e-5)
