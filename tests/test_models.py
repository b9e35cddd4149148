"""Model-stack tests on the tiny CPU config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.models.qwen25vl import lm as lm_mod
from visionselector_tpu.models.qwen25vl import vit as vit_mod
from visionselector_tpu.models.qwen25vl.model import QwenVLEngine, init_params
from visionselector_tpu.preprocess.image import preprocess_image
from visionselector_tpu.preprocess.indices import build_vision_batch
from visionselector_tpu.preprocess.rope import expand_vision_tokens, get_rope_index

CFG = qwen25vl_tiny()


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


def make_image(h=64, w=96, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(h, w, 3) * 255).astype(np.uint8)


def vit_run(params, pixels, grid, pad_to):
    vb = build_vision_batch(
        pixels, grid,
        window_size=CFG.vision.window_size,
        spatial_merge_size=CFG.vision.spatial_merge_size,
        patch_size=CFG.vision.patch_size,
        pad_to=pad_to,
    )
    out = vit_mod.vit_forward(
        params["visual"],
        jnp.asarray(vb.pixel_values),
        jnp.asarray(vb.rot_pos_ids),
        jnp.asarray(vb.window_seg_ids),
        jnp.asarray(vb.full_seg_ids),
        jnp.asarray(vb.reverse_index),
        CFG.vision,
    )
    return np.asarray(out), vb


class TestViT:
    def test_padding_invariance(self, params):
        """Same image through two bucket sizes -> identical valid outputs.

        This is the key correctness property of segment-masked attention +
        host padding: padding must not perturb real tokens."""
        img = make_image()
        pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        out1, vb1 = vit_run(params, pixels, grid, pad_to=pixels.shape[0])
        out2, vb2 = vit_run(params, pixels, grid, pad_to=pixels.shape[0] * 2)
        n = vb1.num_merged
        np.testing.assert_allclose(out1[:n], out2[:n], atol=1e-5, rtol=1e-5)

    def test_multi_image_batch(self, params):
        imgs = [make_image(64, 96, 1), make_image(96, 64, 2)]
        parts = [preprocess_image(i, min_pixels=1, max_pixels=10**9) for i in imgs]
        pixels = np.concatenate([p[0] for p in parts])
        grid = np.concatenate([p[1] for p in parts])
        out, vb = vit_run(params, pixels, grid, pad_to=pixels.shape[0])
        assert out.shape[0] == vb.num_merged
        assert np.isfinite(out[: vb.num_merged]).all()

    def test_image_independence(self, params):
        """Full-attention segments: image 1's output must not depend on
        image 2 being present in the same packed batch."""
        img1 = make_image(64, 96, 3)
        p1, g1 = preprocess_image(img1, min_pixels=1, max_pixels=10**9)
        solo, vb_solo = vit_run(params, p1, g1, pad_to=p1.shape[0] * 2)

        img2 = make_image(64, 64, 4)
        p2, g2 = preprocess_image(img2, min_pixels=1, max_pixels=10**9)
        packed_pixels = np.concatenate([p1, p2])
        packed_grid = np.concatenate([g1, g2])
        packed, vb_packed = vit_run(
            params, packed_pixels, packed_grid, pad_to=packed_pixels.shape[0]
        )
        n1 = vb_solo.num_merged
        np.testing.assert_allclose(
            solo[:n1], packed[:n1], atol=1e-5, rtol=1e-5
        )


class TestLM:
    def test_prefill_decode_consistency(self, params):
        """hidden[t] from decode-with-cache == hidden[t] from full prefill."""
        rng = np.random.RandomState(0)
        t = 8
        embeds = jnp.asarray(rng.randn(1, t, CFG.text.hidden_size), jnp.float32)
        pos = jnp.broadcast_to(jnp.arange(t), (3, 1, t))
        seg = jnp.ones((1, t), jnp.int32)

        full_hidden, _ = lm_mod.lm_prefill(params["lm"], embeds, pos, seg, CFG.text)

        # prefill first t-1, decode the last token
        h7, (k_l, v_l) = lm_mod.lm_prefill(
            params["lm"], embeds[:, : t - 1], pos[:, :, : t - 1],
            seg[:, : t - 1], CFG.text,
        )
        cache = lm_mod.KVCache(
            k=jnp.pad(k_l, ((0, 0), (0, 0), (0, 4), (0, 0), (0, 0))),
            v=jnp.pad(v_l, ((0, 0), (0, 0), (0, 4), (0, 0), (0, 0))),
            length=jnp.full(
                (CFG.text.num_hidden_layers, 1), t - 1, jnp.int32
            ),
        )
        h_dec, _ = lm_mod.lm_decode_step(
            params["lm"], cache, embeds[:, t - 1 :],
            jnp.broadcast_to(jnp.asarray(t - 1), (3, 1, 1)), CFG.text,
        )
        np.testing.assert_allclose(
            np.asarray(h_dec[0, 0]), np.asarray(full_hidden[0, -1]),
            atol=1e-5, rtol=1e-4,
        )

    def test_padding_invariance(self, params):
        rng = np.random.RandomState(1)
        t, pad = 6, 4
        e = jnp.asarray(rng.randn(1, t, CFG.text.hidden_size), jnp.float32)
        e_pad = jnp.pad(e, ((0, 0), (0, pad), (0, 0)))
        pos = jnp.broadcast_to(jnp.arange(t + pad), (3, 1, t + pad))
        seg = jnp.asarray([[1] * t + [0] * pad], jnp.int32)
        h_pad, _ = lm_mod.lm_prefill(params["lm"], e_pad, pos, seg, CFG.text)
        h, _ = lm_mod.lm_prefill(
            params["lm"], e, pos[:, :, :t], seg[:, :t], CFG.text
        )
        np.testing.assert_allclose(
            np.asarray(h_pad[0, :t]), np.asarray(h[0]), atol=1e-5, rtol=1e-4
        )

    def test_mrope_sections(self):
        """Text positions (t==h==w) must reduce M-RoPE to standard 1D RoPE."""
        pos_same = jnp.broadcast_to(jnp.arange(5), (3, 1, 5))
        cos, sin = lm_mod.mrope_cos_sin(pos_same, CFG.text)
        # 1D rope with the same positions:
        dh = CFG.text.head_dim
        inv = 1.0 / (CFG.text.rope_theta ** (np.arange(0, dh, 2) / dh))
        freqs = np.arange(5)[:, None] * inv[None, :]
        emb = np.concatenate([freqs, freqs], -1)
        np.testing.assert_allclose(np.asarray(cos[0]), np.cos(emb), atol=1e-5)
        np.testing.assert_allclose(np.asarray(sin[0]), np.sin(emb), atol=1e-5)


class TestRopeIndex:
    def test_text_only(self):
        ids = np.array([5, 6, 7, 8])
        pos, delta = get_rope_index(ids)
        np.testing.assert_array_equal(pos, np.tile(np.arange(4), (3, 1)))
        assert delta == 0

    def test_single_image(self):
        # text(2) + vision_start + 4 image tokens (grid 1x4x4 merged 2x2) + end + text(1)
        grid = np.array([[1, 4, 4]])
        ids = expand_vision_tokens([1, 2], [9], grid)
        pos, delta = get_rope_index(ids, image_grid_thw=grid)
        # text prefix: 0,1 ; vision_start: 2 ; image tokens: t=3, h/w vary
        np.testing.assert_array_equal(pos[:, :3], np.tile([0, 1, 2], (3, 1)))
        np.testing.assert_array_equal(pos[0, 3:7], [3, 3, 3, 3])  # temporal
        np.testing.assert_array_equal(pos[1, 3:7], [3, 3, 4, 4])  # height
        np.testing.assert_array_equal(pos[2, 3:7], [3, 4, 3, 4])  # width
        # vision_end after image: max so far (4) + 1 = 5, then text 6
        np.testing.assert_array_equal(pos[:, 7], [5, 5, 5])
        np.testing.assert_array_equal(pos[:, 8], [6, 6, 6])
        assert delta == 7 - len(ids)

    def test_video_temporal_scaling(self):
        grid = np.array([[2, 2, 2]])
        ids = expand_vision_tokens(
            [1], [9], grid, image_token_id=151656
        )  # video tokens
        pos, _ = get_rope_index(
            ids, video_grid_thw=grid, second_per_grid_ts=np.array([2.0]),
            tokens_per_second=2,
        )
        # 2 temporal patches x 1 merged pos: temporal ids step by 2*2=4
        np.testing.assert_array_equal(pos[0, 2:4], [2, 6])


class TestEngine:
    def test_generate_with_selector(self, params):
        img = make_image()
        pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        n = pixels.shape[0] // 4
        ids = expand_vision_tokens([100, 200], [300, 400], grid)
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.25)
        res = eng.generate(ids, pixels, grid, max_new_tokens=4)
        k = max(1, int(n * 0.25))
        assert len(res.selected_indices) == k
        assert (np.diff(res.selected_indices) > 0).all()
        assert res.selected_indices.max() < n
        assert res.num_vision_tokens == n
        # prefill length = text tokens + kept vision tokens
        num_text = len(ids) - n
        assert res.prefill_len == num_text + k
        assert 1 <= len(res.tokens) <= 4

    def test_generate_without_selector(self, params):
        img = make_image()
        pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        n = pixels.shape[0] // 4
        ids = expand_vision_tokens([100, 200], [300, 400], grid)
        eng = QwenVLEngine(CFG, params, use_selector=False)
        res = eng.generate(ids, pixels, grid, max_new_tokens=3)
        assert res.prefill_len == len(ids)
        assert res.selected_indices is None

    def test_selector_indices_match_scores(self, params):
        """Golden check: engine's kept indices == top-k of the scorer output
        computed independently."""
        from visionselector_tpu.selector.scorer import score_tokens

        img = make_image(seed=7)
        pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        ids = expand_vision_tokens([100], [400], grid)
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.3)
        res = eng.generate(ids, pixels, grid, max_new_tokens=1)

        vb = build_vision_batch(
            pixels, grid, window_size=CFG.vision.window_size,
            spatial_merge_size=CFG.vision.spatial_merge_size,
            patch_size=CFG.vision.patch_size, pad_to=pixels.shape[0],
        )
        merged = vit_mod.vit_forward(
            params["visual"], jnp.asarray(vb.pixel_values),
            jnp.asarray(vb.rot_pos_ids), jnp.asarray(vb.window_seg_ids),
            jnp.asarray(vb.full_seg_ids), jnp.asarray(vb.reverse_index),
            CFG.vision,
        )
        scores = np.asarray(score_tokens(params["scorer"], merged))
        n = vb.num_merged
        k = max(1, int(n * 0.3))
        want = np.sort(np.argsort(-scores[:n], kind="stable")[:k])
        np.testing.assert_array_equal(res.selected_indices, want)


class TestMultiImage:
    def test_two_images_one_prompt(self, params):
        """Multiple image runs in one sequence (reference masked_scatter path:
        selector handles all images' tokens jointly)."""
        p1, g1 = preprocess_image(make_image(56, 56, 11), min_pixels=1,
                                  max_pixels=10**9)
        p2, g2 = preprocess_image(make_image(56, 84, 12), min_pixels=1,
                                  max_pixels=10**9)
        pixels = np.concatenate([p1, p2])
        grid = np.concatenate([g1, g2])
        ids = expand_vision_tokens([100, 200], [300], grid)
        n = pixels.shape[0] // 4
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.3)
        res = eng.generate(ids, pixels, grid, max_new_tokens=2)
        assert res.num_vision_tokens == n
        k = max(1, int(n * 0.3))
        assert len(res.selected_indices) == k
        # joint top-k may select from either image
        assert res.selected_indices.max() < n


class TestPaddedHeads:
    def test_padded_vit_equivalence(self, params):
        """head-dim padding in the weights must not change ViT outputs."""
        from visionselector_tpu.models.qwen25vl.weights import pad_vit_head_dim

        img = make_image(seed=21)
        pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        out_ref, vb = vit_run(params, pixels, grid, pad_to=pixels.shape[0])

        padded = dict(params)
        padded["visual"] = pad_vit_head_dim(params["visual"], CFG.vision, dp=32)
        out_pad, _ = vit_run(padded, pixels, grid, pad_to=pixels.shape[0])
        n = vb.num_merged
        np.testing.assert_allclose(out_ref[:n], out_pad[:n], atol=2e-5,
                                   rtol=1e-4)

    def test_padded_rotary_matches(self):
        from visionselector_tpu.models.qwen25vl.vit import (
            apply_rotary,
            apply_rotary_padded,
            vision_rotary_cos_sin,
        )

        rng = np.random.RandomState(0)
        s, h, d, dp = 8, 2, 16, 32
        q = rng.randn(s, h, d).astype(np.float32)
        k = rng.randn(s, h, d).astype(np.float32)
        pos = rng.randint(0, 10, (s, 2))
        cos, sin = vision_rotary_cos_sin(jnp.asarray(pos), d)
        want_q, want_k = apply_rotary(jnp.asarray(q), jnp.asarray(k), cos, sin)

        qp = np.pad(q, ((0, 0), (0, 0), (0, dp - d)))
        kp = np.pad(k, ((0, 0), (0, 0), (0, dp - d)))
        got_q, got_k = apply_rotary_padded(
            jnp.asarray(qp), jnp.asarray(kp), cos, sin, d
        )
        np.testing.assert_allclose(np.asarray(got_q[..., :d]),
                                   np.asarray(want_q), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_q[..., d:]), 0.0)
        np.testing.assert_allclose(np.asarray(got_k[..., :d]),
                                   np.asarray(want_k), atol=1e-5)


class TestSampling:
    def test_temperature_zero_matches_greedy(self, params):
        img = make_image(seed=31)
        pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        ids = expand_vision_tokens([100, 200], [300], grid)
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.5)
        r1 = eng.generate(ids, pixels, grid, max_new_tokens=4)
        r2 = eng.generate(ids, pixels, grid, max_new_tokens=4,
                          temperature=0.0)
        assert r1.tokens == r2.tokens

    def test_sampling_valid_and_seeded(self, params):
        img = make_image(seed=32)
        pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        ids = expand_vision_tokens([100, 200], [300], grid)
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.5)
        ra = eng.generate(ids, pixels, grid, max_new_tokens=6,
                          temperature=1.5, top_p=0.95, seed=7)
        rb = eng.generate(ids, pixels, grid, max_new_tokens=6,
                          temperature=1.5, top_p=0.95, seed=7)
        assert ra.tokens == rb.tokens  # deterministic for fixed seed
        assert all(0 <= t < CFG.text.vocab_size for t in ra.tokens)


class TestBucketInvariance:
    def test_generation_identical_across_vision_buckets(self, params):
        """End-to-end: the generated tokens and selected indices must not
        depend on the padding bucket the image lands in."""
        img = make_image(seed=41)
        pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        ids = expand_vision_tokens([100, 200], [300], grid)
        s = pixels.shape[0]

        res = []
        for buckets in ([s], [s * 2], [s * 4]):
            eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.3,
                               vision_buckets=tuple(buckets))
            res.append(eng.generate(ids, pixels, grid, max_new_tokens=4))
        for r in res[1:]:
            assert r.tokens == res[0].tokens
            np.testing.assert_array_equal(
                r.selected_indices, res[0].selected_indices
            )


class TestTextOnly:
    def test_generate_text_only(self, params):
        """No vision branch: plain causal prefill + decode (reference stock
        LM path for imageless mme/scienceqa docs)."""
        ids = np.asarray([100, 200, 300, 400, 500], np.int64)
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.25)
        res = eng.generate(ids, max_new_tokens=4)
        assert res.num_vision_tokens == 0
        assert res.selected_indices is None
        assert res.prefill_len == len(ids)
        assert 1 <= len(res.tokens) <= 4
        # deterministic greedy
        res2 = eng.generate(ids, max_new_tokens=4)
        assert res.tokens == res2.tokens


class TestMixedBlockAttention:
    def test_vit_bounds_path_matches_xla(self, params, monkeypatch):
        """vit_forward's per-layer-type block dispatch (window=128 / full=512
        with kv-block skipping) must equal the XLA reference path."""
        monkeypatch.setenv("VST_ATTN_IMPL", "pallas_interpret")
        img = make_image(seed=33)
        pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        vb = build_vision_batch(
            pixels, grid, window_size=CFG.vision.window_size,
            spatial_merge_size=CFG.vision.spatial_merge_size,
            patch_size=CFG.vision.patch_size, pad_to=512,
        )
        got = vit_mod.vit_forward(
            params["visual"], jnp.asarray(vb.pixel_values),
            jnp.asarray(vb.rot_pos_ids), jnp.asarray(vb.window_seg_ids),
            jnp.asarray(vb.full_seg_ids), jnp.asarray(vb.reverse_index),
            CFG.vision,
            window_kv_bounds=jnp.asarray(vb.window_kv_bounds),
            full_kv_bounds=jnp.asarray(vb.full_kv_bounds),
        )
        monkeypatch.setenv("VST_ATTN_IMPL", "xla")
        want = vit_mod.vit_forward(
            params["visual"], jnp.asarray(vb.pixel_values),
            jnp.asarray(vb.rot_pos_ids), jnp.asarray(vb.window_seg_ids),
            jnp.asarray(vb.full_seg_ids), jnp.asarray(vb.reverse_index),
            CFG.vision,
        )
        n = vb.num_merged
        np.testing.assert_allclose(
            np.asarray(got)[:n], np.asarray(want)[:n], atol=2e-4, rtol=1e-3
        )


class TestFusedViTPath:
    def test_fused_forward_matches_xla(self, params, monkeypatch):
        """VST_FUSED_ATTN=1 (fused rotary+attention kernel, interpret mode on
        CPU) must match the XLA reference forward."""
        monkeypatch.setenv("VST_FUSED_ATTN", "1")
        img = make_image(seed=44)
        pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        vb = build_vision_batch(
            pixels, grid, window_size=CFG.vision.window_size,
            spatial_merge_size=CFG.vision.spatial_merge_size,
            patch_size=CFG.vision.patch_size, pad_to=512,
        )
        got = vit_mod.vit_forward(
            params["visual"], jnp.asarray(vb.pixel_values),
            jnp.asarray(vb.rot_pos_ids), jnp.asarray(vb.window_seg_ids),
            jnp.asarray(vb.full_seg_ids), jnp.asarray(vb.reverse_index),
            CFG.vision,
            window_kv_bounds=jnp.asarray(vb.window_kv_bounds),
            full_kv_bounds=jnp.asarray(vb.full_kv_bounds),
        )
        monkeypatch.delenv("VST_FUSED_ATTN")
        want = vit_mod.vit_forward(
            params["visual"], jnp.asarray(vb.pixel_values),
            jnp.asarray(vb.rot_pos_ids), jnp.asarray(vb.window_seg_ids),
            jnp.asarray(vb.full_seg_ids), jnp.asarray(vb.reverse_index),
            CFG.vision,
        )
        n = vb.num_merged
        np.testing.assert_allclose(
            np.asarray(got)[:n], np.asarray(want)[:n], atol=2e-4, rtol=1e-3
        )
