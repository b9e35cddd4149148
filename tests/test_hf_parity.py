"""Cross-implementation parity: our JAX model vs the REAL HF Qwen2.5-VL.

The accuracy north star is matching HF-reference behavior (BASELINE); no
real weights exist in this environment, but transformers + torch(cpu) do —
so a tiny randomly-initialized HF Qwen2_5_VLForConditionalGeneration is
saved with save_pretrained and loaded through OUR checkpoint loader, then
both implementations must produce the same logits on the same inputs
(text-only and image prefill). This pins the full interop chain: config
parsing (nested text_config), weight-name mapping (model.visual./
model.language_model. prefixes), patchify layout, window indices, M-RoPE,
and the attention/MLP math.
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_checkpoint(tmp_path_factory):
    from transformers import (
        Qwen2_5_VLConfig,
        Qwen2_5_VLForConditionalGeneration,
    )

    cfg = Qwen2_5_VLConfig(
        vision_config=dict(
            depth=4, hidden_size=64, intermediate_size=128, num_heads=4,
            in_channels=3, patch_size=14, spatial_merge_size=2,
            temporal_patch_size=2, tokens_per_second=2, window_size=56,
            out_hidden_size=96, fullatt_block_indexes=[1, 3],
            hidden_act="silu",
        ),
        text_config=dict(
            vocab_size=151936, hidden_size=96, intermediate_size=192,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2,
            rope_scaling={"type": "mrope", "mrope_section": [4, 4, 4]},
            tie_word_embeddings=True, rms_norm_eps=1e-6, rope_theta=1e6,
        ),
        image_token_id=151655, video_token_id=151656,
        vision_start_token_id=151652, vision_end_token_id=151653,
    )
    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    d = str(tmp_path_factory.mktemp("hf_ckpt"))
    model.save_pretrained(d)
    return d, model


@pytest.fixture(scope="module")
def jax_side(hf_checkpoint):
    from visionselector_tpu.models.qwen25vl.weights import (
        config_from_hf,
        load_hf_checkpoint,
    )

    path, _ = hf_checkpoint
    cfg = config_from_hf(path)
    cfg = dataclasses.replace(cfg, dtype="float32")
    params = load_hf_checkpoint(path, cfg)
    return cfg, params


class TestHFParity:
    def test_config_parsed_from_nested_layout(self, jax_side):
        cfg, _ = jax_side
        assert cfg.text.hidden_size == 96
        assert cfg.text.mrope_section == (4, 4, 4)
        assert cfg.vision.fullatt_block_indexes == (1, 3)
        assert cfg.text.tie_word_embeddings is True

    def test_text_only_logits_match(self, hf_checkpoint, jax_side):
        import jax.numpy as jnp

        from visionselector_tpu.models.qwen25vl.model import _prefill_text

        _, hf_model = hf_checkpoint
        cfg, params = jax_side
        rng = np.random.RandomState(0)
        t = 12
        ids = rng.randint(10, 5000, t)

        with torch.no_grad():
            out = hf_model(
                input_ids=torch.tensor(ids[None]),
                attention_mask=torch.ones(1, t, dtype=torch.long),
            )
        hf_logits = out.logits[0, -1].numpy()

        t_pad = 16
        ids_p = np.zeros(t_pad, np.int64)
        ids_p[:t] = ids
        pos = np.zeros((3, t_pad), np.int64)
        pos[:, :t] = np.tile(np.arange(t), (3, 1))
        seg = (np.arange(t_pad) < t).astype(np.int32)
        _, _, logits = _prefill_text(
            params, cfg, jnp.asarray(ids_p), jnp.asarray(pos),
            jnp.asarray(seg), jnp.asarray(t),
        )
        ours = np.asarray(logits)
        np.testing.assert_allclose(ours, hf_logits, atol=2e-3, rtol=2e-3)
        assert int(ours.argmax()) == int(hf_logits.argmax())

    def test_image_prefill_logits_match(self, hf_checkpoint, jax_side):
        import jax.numpy as jnp

        from visionselector_tpu.models.qwen25vl.model import _prefill
        from visionselector_tpu.preprocess.image import preprocess_image
        from visionselector_tpu.preprocess.indices import build_vision_batch
        from visionselector_tpu.preprocess.rope import (
            expand_vision_tokens,
            get_rope_index,
        )

        _, hf_model = hf_checkpoint
        cfg, params = jax_side
        rng = np.random.RandomState(1)
        img = (rng.rand(112, 140, 3) * 255).astype(np.uint8)
        pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        before, after = [100, 200, 300], [400, 500]
        input_ids = expand_vision_tokens(before, after, grid)
        t_orig = len(input_ids)

        with torch.no_grad():
            out = hf_model(
                input_ids=torch.tensor(np.asarray(input_ids)[None]),
                attention_mask=torch.ones(1, t_orig, dtype=torch.long),
                pixel_values=torch.tensor(pixels, dtype=torch.float32),
                image_grid_thw=torch.tensor(np.asarray(grid)),
            )
        hf_logits = out.logits[0, -1].numpy()

        s_bucket = pixels.shape[0]
        vb = build_vision_batch(
            pixels, grid, window_size=cfg.vision.window_size,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            patch_size=cfg.vision.patch_size, pad_to=s_bucket,
        )
        n = vb.num_merged
        l_pad = s_bucket // cfg.vision.spatial_merge_unit
        image_pos = np.where(np.asarray(input_ids) == cfg.image_token_id)[0]
        text_pos = np.where(np.asarray(input_ids) != cfg.image_token_id)[0]
        image_pos_p = np.full(l_pad, t_orig, np.int64)
        image_pos_p[:n] = image_pos
        text_pos_p = np.full(8, t_orig, np.int64)
        text_pos_p[: len(text_pos)] = text_pos
        position_ids, _ = get_rope_index(
            input_ids, image_grid_thw=grid,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            tokens_per_second=cfg.vision.tokens_per_second,
            image_token_id=cfg.image_token_id,
            video_token_id=cfg.video_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
        )
        outs = _prefill(
            params, cfg, l_pad, False,
            jnp.asarray(vb.pixel_values), jnp.asarray(vb.rot_pos_ids),
            jnp.asarray(vb.window_seg_ids), jnp.asarray(vb.full_seg_ids),
            jnp.asarray(vb.reverse_index), jnp.asarray(n), jnp.asarray(n),
            jnp.asarray(input_ids), jnp.asarray(image_pos_p),
            jnp.asarray(text_pos_p), jnp.asarray(len(text_pos)),
            jnp.asarray(position_ids),
        )
        ours = np.asarray(outs[6])
        np.testing.assert_allclose(ours, hf_logits, atol=5e-3, rtol=5e-3)
        assert int(ours.argmax()) == int(hf_logits.argmax())

    def test_greedy_generation_matches_hf(self, hf_checkpoint, jax_side):
        """Full decode path: 6 greedy tokens equal HF generate()'s."""
        from visionselector_tpu.models.qwen25vl.model import QwenVLEngine
        from visionselector_tpu.preprocess.image import preprocess_image
        from visionselector_tpu.preprocess.rope import expand_vision_tokens

        _, hf_model = hf_checkpoint
        cfg, params = jax_side
        rng = np.random.RandomState(2)
        img = (rng.rand(56, 84, 3) * 255).astype(np.uint8)
        pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        input_ids = expand_vision_tokens([100, 200], [300, 400, 500], grid)
        t_orig = len(input_ids)

        with torch.no_grad():
            out = hf_model.generate(
                input_ids=torch.tensor(np.asarray(input_ids)[None]),
                attention_mask=torch.ones(1, t_orig, dtype=torch.long),
                pixel_values=torch.tensor(pixels, dtype=torch.float32),
                image_grid_thw=torch.tensor(np.asarray(grid)),
                max_new_tokens=6, do_sample=False,
            )
        hf_tokens = out[0, t_orig:].tolist()

        eng = QwenVLEngine(cfg, params, use_selector=False)
        res = eng.generate(input_ids, pixels, grid, max_new_tokens=6,
                           eos_token_ids=(-1,))  # no early EOS
        assert res.tokens == hf_tokens, (res.tokens, hf_tokens)

    def test_greedy_generation_matches_hf_with_rep_penalty(
            self, hf_checkpoint, jax_side):
        """repetition_penalty parity: HF's RepetitionPenaltyLogitsProcessor
        penalizes every id in input_ids (prompt + generated) at EVERY step,
        including the prefill's last-row logits — our presence-mask decode
        must reproduce the exact greedy rollout (the reference's serving
        surface exposes this knob, llava-ov-15/src/serve/app.py:111)."""
        from visionselector_tpu.models.qwen25vl.model import QwenVLEngine
        from visionselector_tpu.preprocess.image import preprocess_image
        from visionselector_tpu.preprocess.rope import expand_vision_tokens

        _, hf_model = hf_checkpoint
        cfg, params = jax_side
        rng = np.random.RandomState(5)
        img = (rng.rand(56, 84, 3) * 255).astype(np.uint8)
        pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        input_ids = expand_vision_tokens([100, 200], [300, 400, 500], grid)
        t_orig = len(input_ids)

        for rp in (1.3, 0.8):  # >1 discourages AND <1 encourages repeats
            with torch.no_grad():
                out = hf_model.generate(
                    input_ids=torch.tensor(np.asarray(input_ids)[None]),
                    attention_mask=torch.ones(1, t_orig, dtype=torch.long),
                    pixel_values=torch.tensor(pixels, dtype=torch.float32),
                    image_grid_thw=torch.tensor(np.asarray(grid)),
                    max_new_tokens=6, do_sample=False,
                    repetition_penalty=rp,
                )
            hf_tokens = out[0, t_orig:].tolist()

            eng = QwenVLEngine(cfg, params, use_selector=False)
            res = eng.generate(input_ids, pixels, grid, max_new_tokens=6,
                               eos_token_ids=(-1,), repetition_penalty=rp)
            assert res.tokens == hf_tokens, (rp, res.tokens, hf_tokens)

    def test_text_greedy_matches_hf_with_rep_penalty(self, hf_checkpoint,
                                                     jax_side):
        """Text-only decode path under repetition_penalty == HF generate."""
        from visionselector_tpu.models.qwen25vl.model import QwenVLEngine

        _, hf_model = hf_checkpoint
        cfg, params = jax_side
        rng = np.random.RandomState(7)
        ids = rng.randint(10, 5000, 9)

        with torch.no_grad():
            out = hf_model.generate(
                input_ids=torch.tensor(ids[None]),
                attention_mask=torch.ones(1, len(ids), dtype=torch.long),
                max_new_tokens=7, do_sample=False, repetition_penalty=1.25,
            )
        hf_tokens = out[0, len(ids):].tolist()

        eng = QwenVLEngine(cfg, params, use_selector=False)
        res = eng.generate(np.asarray(ids), max_new_tokens=7,
                           eos_token_ids=(-1,), repetition_penalty=1.25)
        assert res.tokens == hf_tokens, (res.tokens, hf_tokens)

    def test_multi_image_logits_match(self, hf_checkpoint, jax_side):
        """Two images in one prompt: joint grid/M-RoPE parity with HF."""
        import jax.numpy as jnp

        from visionselector_tpu.models.qwen25vl.model import _prefill
        from visionselector_tpu.preprocess.image import preprocess_image
        from visionselector_tpu.preprocess.indices import build_vision_batch
        from visionselector_tpu.preprocess.rope import (
            expand_vision_tokens,
            get_rope_index,
        )

        _, hf_model = hf_checkpoint
        cfg, params = jax_side
        rng = np.random.RandomState(3)
        p1, g1 = preprocess_image((rng.rand(56, 56, 3) * 255).astype(np.uint8),
                                  min_pixels=1, max_pixels=10**9)
        p2, g2 = preprocess_image((rng.rand(56, 84, 3) * 255).astype(np.uint8),
                                  min_pixels=1, max_pixels=10**9)
        pixels = np.concatenate([p1, p2])
        grid = np.concatenate([g1, g2])
        input_ids = expand_vision_tokens([100, 200], [300], grid)
        t_orig = len(input_ids)

        with torch.no_grad():
            out = hf_model(
                input_ids=torch.tensor(np.asarray(input_ids)[None]),
                attention_mask=torch.ones(1, t_orig, dtype=torch.long),
                pixel_values=torch.tensor(pixels, dtype=torch.float32),
                image_grid_thw=torch.tensor(np.asarray(grid)),
            )
        hf_logits = out.logits[0, -1].numpy()

        s_bucket = pixels.shape[0]
        vb = build_vision_batch(
            pixels, grid, window_size=cfg.vision.window_size,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            patch_size=cfg.vision.patch_size, pad_to=s_bucket,
        )
        n = vb.num_merged
        l_pad = s_bucket // cfg.vision.spatial_merge_unit
        image_pos = np.where(np.asarray(input_ids) == cfg.image_token_id)[0]
        text_pos = np.where(np.asarray(input_ids) != cfg.image_token_id)[0]
        image_pos_p = np.full(l_pad, t_orig, np.int64)
        image_pos_p[:n] = image_pos
        text_pos_p = np.full(8, t_orig, np.int64)
        text_pos_p[: len(text_pos)] = text_pos
        position_ids, _ = get_rope_index(
            input_ids, image_grid_thw=grid,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            tokens_per_second=cfg.vision.tokens_per_second,
            image_token_id=cfg.image_token_id,
            video_token_id=cfg.video_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
        )
        outs = _prefill(
            params, cfg, l_pad, False,
            jnp.asarray(vb.pixel_values), jnp.asarray(vb.rot_pos_ids),
            jnp.asarray(vb.window_seg_ids), jnp.asarray(vb.full_seg_ids),
            jnp.asarray(vb.reverse_index), jnp.asarray(n), jnp.asarray(n),
            jnp.asarray(input_ids), jnp.asarray(image_pos_p),
            jnp.asarray(text_pos_p), jnp.asarray(len(text_pos)),
            jnp.asarray(position_ids),
        )
        ours = np.asarray(outs[6])
        np.testing.assert_allclose(ours, hf_logits, atol=5e-3, rtol=5e-3)
        assert int(ours.argmax()) == int(hf_logits.argmax())

    def test_video_generation_matches_hf(self, hf_checkpoint, jax_side):
        """Video path: temporal M-RoPE + video-token splice parity with HF
        greedy generate."""
        from visionselector_tpu.models.qwen25vl.model import QwenVLEngine
        from visionselector_tpu.preprocess.rope import expand_vision_tokens
        from visionselector_tpu.preprocess.video import process_video

        _, hf_model = hf_checkpoint
        cfg, params = jax_side
        rng = np.random.RandomState(4)
        frames = (rng.rand(4, 56, 56, 3) * 255).astype(np.uint8)
        pixels, grid, spg = process_video(
            frames, ele={"min_pixels": 1, "max_pixels": 10**9, "nframes": 4},
        )
        input_ids = expand_vision_tokens(
            [100, 200], [300, 400], grid,
            image_token_id=cfg.video_token_id,
        )
        t_orig = len(input_ids)

        with torch.no_grad():
            out = hf_model.generate(
                input_ids=torch.tensor(np.asarray(input_ids)[None]),
                attention_mask=torch.ones(1, t_orig, dtype=torch.long),
                pixel_values_videos=torch.tensor(pixels, dtype=torch.float32),
                video_grid_thw=torch.tensor(np.asarray(grid)),
                second_per_grid_ts=torch.tensor([spg]),
                max_new_tokens=5, do_sample=False,
            )
        hf_tokens = out[0, t_orig:].tolist()

        eng = QwenVLEngine(cfg, params, use_selector=False)
        res = eng.generate(
            input_ids, pixel_values_videos=pixels, video_grid_thw=grid,
            second_per_grid_ts=np.array([spg]), max_new_tokens=5,
            eos_token_ids=(-1,),
        )
        assert res.tokens == hf_tokens, (res.tokens, hf_tokens)

    def test_mixed_image_video_generation_matches_hf(self, hf_checkpoint,
                                                     jax_side):
        """ONE prompt containing an image run AND a video run: the pixel
        concat / merged-order map / interleaved M-RoPE must all agree with
        HF greedy generate."""
        from visionselector_tpu.models.qwen25vl.model import QwenVLEngine
        from visionselector_tpu.preprocess.image import preprocess_image
        from visionselector_tpu.preprocess.video import process_video

        _, hf_model = hf_checkpoint
        cfg, params = jax_side
        rng = np.random.RandomState(7)
        img = (rng.rand(56, 84, 3) * 255).astype(np.uint8)
        px_img, grid_img = preprocess_image(img, min_pixels=1,
                                            max_pixels=10**9)
        frames = (rng.rand(4, 56, 56, 3) * 255).astype(np.uint8)
        px_vid, grid_vid, spg = process_video(
            frames, ele={"min_pixels": 1, "max_pixels": 10**9, "nframes": 4},
        )

        n_img = int(np.prod(grid_img[0]) // 4)
        n_vid = int(np.prod(grid_vid[0]) // 4)
        ids = np.asarray(
            [100, 200]
            + [cfg.vision_start_token_id] + [cfg.image_token_id] * n_img
            + [cfg.vision_end_token_id] + [250]
            + [cfg.vision_start_token_id] + [cfg.video_token_id] * n_vid
            + [cfg.vision_end_token_id] + [300, 400],
            np.int64,
        )
        t_orig = len(ids)

        with torch.no_grad():
            out = hf_model.generate(
                input_ids=torch.tensor(ids[None]),
                attention_mask=torch.ones(1, t_orig, dtype=torch.long),
                pixel_values=torch.tensor(px_img, dtype=torch.float32),
                image_grid_thw=torch.tensor(np.asarray(grid_img)),
                pixel_values_videos=torch.tensor(px_vid, dtype=torch.float32),
                video_grid_thw=torch.tensor(np.asarray(grid_vid)),
                second_per_grid_ts=torch.tensor([spg]),
                max_new_tokens=5, do_sample=False,
            )
        hf_tokens = out[0, t_orig:].tolist()

        eng = QwenVLEngine(cfg, params, use_selector=False)
        res = eng.generate(
            ids, pixel_values=px_img, grid_thw=grid_img,
            pixel_values_videos=px_vid, video_grid_thw=grid_vid,
            second_per_grid_ts=np.array([spg]), max_new_tokens=5,
            eos_token_ids=(-1,),
        )
        assert res.tokens == hf_tokens, (res.tokens, hf_tokens)

    def test_sft_loss_matches_hf(self, hf_checkpoint, jax_side):
        """Plain CE training forward (no selector) equals HF's loss on the
        same image+labels batch — pins the supervised path."""
        import jax
        import jax.numpy as jnp

        from visionselector_tpu.preprocess.image import preprocess_image
        from visionselector_tpu.preprocess.indices import build_vision_batch
        from visionselector_tpu.preprocess.rope import (
            expand_vision_tokens,
            get_rope_index,
        )
        from visionselector_tpu.train.loss import (
            IGNORE_INDEX,
            TrainBatchSample,
        )
        from visionselector_tpu.train.sft import sft_train_forward

        _, hf_model = hf_checkpoint
        cfg, params = jax_side
        rng = np.random.RandomState(5)
        img = (rng.rand(56, 56, 3) * 255).astype(np.uint8)
        pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        prompt, answer = [100, 200], [300, 400, 500]
        input_ids = expand_vision_tokens(prompt, answer, grid)
        t = len(input_ids)
        labels = np.full(t, IGNORE_INDEX, np.int64)
        labels[-len(answer):] = answer

        with torch.no_grad():
            out = hf_model(
                input_ids=torch.tensor(np.asarray(input_ids)[None]),
                attention_mask=torch.ones(1, t, dtype=torch.long),
                pixel_values=torch.tensor(pixels, dtype=torch.float32),
                image_grid_thw=torch.tensor(np.asarray(grid)),
                labels=torch.tensor(labels[None]),
            )
        hf_loss = float(out.loss)

        vb = build_vision_batch(
            pixels, grid, window_size=cfg.vision.window_size,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            patch_size=cfg.vision.patch_size, pad_to=pixels.shape[0],
        )
        n = vb.num_merged
        l_pad = pixels.shape[0] // cfg.vision.spatial_merge_unit
        t_bucket = 32
        ids_p = np.zeros(t_bucket, np.int64)
        ids_p[:t] = input_ids
        lab_p = np.full(t_bucket, IGNORE_INDEX, np.int64)
        lab_p[:t] = labels
        position_ids, _ = get_rope_index(
            input_ids, image_grid_thw=grid,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            tokens_per_second=cfg.vision.tokens_per_second,
            image_token_id=cfg.image_token_id,
            video_token_id=cfg.video_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
        )
        pos_p = np.zeros((3, t_bucket), np.int64)
        pos_p[:, :t] = position_ids
        seg = (np.arange(t_bucket) < t).astype(np.int32)
        image_pos = np.where(ids_p == cfg.image_token_id)[0][:n]
        image_pos_p = np.full(l_pad, t_bucket, np.int64)
        image_pos_p[:n] = image_pos

        sample = TrainBatchSample(
            pixel_values=jnp.asarray(vb.pixel_values),
            rot_pos_ids=jnp.asarray(vb.rot_pos_ids),
            window_seg_ids=jnp.asarray(vb.window_seg_ids),
            full_seg_ids=jnp.asarray(vb.full_seg_ids),
            reverse_index=jnp.asarray(vb.reverse_index),
            num_merged=jnp.asarray(n, jnp.int32),
            k=jnp.asarray(n, jnp.int32),
            input_ids=jnp.asarray(ids_p),
            labels=jnp.asarray(lab_p),
            position_ids=jnp.asarray(pos_p),
            seg_ids=jnp.asarray(seg),
            image_positions=jnp.asarray(image_pos_p),
            window_kv_bounds=jnp.asarray(vb.window_kv_bounds),
            full_kv_bounds=jnp.asarray(vb.full_kv_bounds),
        )
        loss, _ = sft_train_forward(params, sample, cfg)
        assert abs(float(loss) - hf_loss) < 2e-3, (float(loss), hf_loss)


class TestLoglikelihoodParity:
    """engine.loglikelihood vs HF teacher forcing: the summed continuation
    log-prob and the is_greedy flag must match transformers' own logits on
    the identical (image context, continuation) input."""

    def _hf_ll(self, hf_model, input_ids, cont, pixels=None, grid=None):
        import torch.nn.functional as F

        full = np.concatenate([np.asarray(input_ids), np.asarray(cont)])
        kwargs = dict(
            input_ids=torch.tensor(full[None]),
            attention_mask=torch.ones(1, len(full), dtype=torch.long),
        )
        if pixels is not None:
            kwargs.update(
                pixel_values=torch.tensor(pixels, dtype=torch.float32),
                image_grid_thw=torch.tensor(np.asarray(grid)),
            )
        with torch.no_grad():
            logits = hf_model(**kwargs).logits[0]
        logp = F.log_softmax(logits.float(), dim=-1)
        t0 = len(input_ids)
        ll = sum(
            float(logp[t0 - 1 + i, int(cont[i])]) for i in range(len(cont))
        )
        greedy = all(
            int(logits[t0 - 1 + i].argmax()) == int(cont[i])
            for i in range(len(cont))
        )
        return ll, greedy

    def test_image_ll_matches_hf(self, hf_checkpoint, jax_side):
        from visionselector_tpu.models.qwen25vl.model import QwenVLEngine
        from visionselector_tpu.preprocess.image import preprocess_image
        from visionselector_tpu.preprocess.rope import expand_vision_tokens

        _, hf_model = hf_checkpoint
        cfg, params = jax_side
        rng = np.random.RandomState(7)
        img = (rng.rand(56, 84, 3) * 255).astype(np.uint8)
        pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        input_ids = expand_vision_tokens([100, 200, 300], [400, 500], grid)
        cont = np.asarray(rng.randint(10, 5000, 4))

        # uncompressed path: identical visible context as HF
        eng = QwenVLEngine(cfg, params, use_selector=False)
        ll, greedy = eng.loglikelihood(
            input_ids, cont, pixel_values=pixels, grid_thw=grid)
        hf_ll, hf_greedy = self._hf_ll(hf_model, input_ids, cont, pixels,
                                       grid)
        assert abs(ll - hf_ll) < 5e-3, (ll, hf_ll)
        assert greedy == hf_greedy

    def test_text_ll_matches_hf(self, hf_checkpoint, jax_side):
        from visionselector_tpu.models.qwen25vl.model import QwenVLEngine

        _, hf_model = hf_checkpoint
        cfg, params = jax_side
        rng = np.random.RandomState(8)
        ctx = rng.randint(10, 5000, 9)
        cont = rng.randint(10, 5000, 3)
        eng = QwenVLEngine(cfg, params, use_selector=False)
        ll, greedy = eng.loglikelihood(ctx, cont)
        hf_ll, hf_greedy = self._hf_ll(hf_model, ctx, cont)
        assert abs(ll - hf_ll) < 2e-3, (ll, hf_ll)
        assert greedy == hf_greedy
