"""External-oracle parity for the LLaVA-OneVision-1.5 family.

The Qwen family is pinned against real HF transformers
(``test_hf_parity.py``); this does the same for OV against the reference's
OWN vendored PyTorch implementation
(``/root/reference/llava-ov-15/llavaonevision1_5/modeling_llavaonevision1_5.py``),
imported as an oracle (never copied): a tiny randomly-initialized
``LLaVAOneVision1_5_ForConditionalGeneration`` is saved with save_pretrained,
loaded through OUR OV loader, and both implementations must produce equal
RICE merged features, prefill logits and greedy generations. This pins the
per-image CLS insert/strip (reference :929-931, :1049-1088), class_pos_emb
rotary, the merger, and the Qwen3 (qk-norm) text stack.
"""

import dataclasses
import importlib
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_OV_DIR = "/root/reference/llava-ov-15"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_OV_DIR, "llavaonevision1_5")),
    reason="reference llava-ov-15 tree not available",
)


@pytest.fixture(scope="module")
def ov_oracle(tmp_path_factory):
    # The reference tree is read-only: block bytecode cache writes into it.
    sys.dont_write_bytecode = True
    sys.path.insert(0, REF_OV_DIR)
    try:
        conf = importlib.import_module(
            "llavaonevision1_5.configuration_llavaonevision1_5")
        mod = importlib.import_module(
            "llavaonevision1_5.modeling_llavaonevision1_5")

        cfg = conf.Llavaonevision1_5Config(
            vision_config=dict(
                depth=2, embed_dim=64, hidden_size=64, intermediate_size=128,
                num_heads=4, in_channels=3, patch_size=14,
                spatial_merge_size=2, temporal_patch_size=1,
                text_hidden_size=96,
            ),
            text_config=dict(
                vocab_size=151936, hidden_size=96, intermediate_size=192,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, head_dim=32,
                tie_word_embeddings=False, rms_norm_eps=1e-6,
                rope_theta=1e6,
            ),
            image_token_id=151655, video_token_id=151656,
        )
        # sdpa: the reference's eager RiceAttention.__init__ lacks the
        # layer_idx kwarg its own RiceBlock passes (latent upstream bug)
        cfg._attn_implementation = "sdpa"
        torch.manual_seed(0)
        model = mod.LLaVAOneVision1_5_ForConditionalGeneration(cfg)
        model = model.eval()
        d = str(tmp_path_factory.mktemp("ov_oracle_ckpt"))
        model.save_pretrained(d)
        yield d, model
    finally:
        sys.path.remove(REF_OV_DIR)


@pytest.fixture(scope="module")
def jax_ov(ov_oracle):
    from visionselector_tpu.models.llava_ov15.weights import (
        load_ov_checkpoint,
        ov_config_from_hf,
    )

    path, _ = ov_oracle
    cfg = ov_config_from_hf(path)
    cfg = dataclasses.replace(cfg, dtype="float32")
    params = load_ov_checkpoint(path, cfg)
    return cfg, params


def _image_inputs(cfg, seed=0, hw=(56, 84)):
    from visionselector_tpu.preprocess.image import preprocess_image

    rng = np.random.RandomState(seed)
    img = (rng.rand(*hw, 3) * 255).astype(np.uint8)
    return preprocess_image(
        img, min_pixels=1, max_pixels=10**9,
        patch_size=cfg.vision.patch_size,
        temporal_patch_size=cfg.vision.temporal_patch_size,
        merge_size=cfg.vision.spatial_merge_size,
    )


class TestOVOracleParity:
    def test_config_roundtrip(self, jax_ov):
        cfg, params = jax_ov
        assert cfg.vision.depth == 2
        assert cfg.text.head_dim == 32  # head_dim_override from config.json
        assert cfg.text.qk_norm is True
        assert cfg.text.tie_word_embeddings is False
        assert "lm_head_kernel" in params["lm"]

    def test_rice_merged_features_match(self, ov_oracle, jax_ov):
        """RICE tower incl. per-image CLS insert (reference :1049-1066) /
        strip (:1081-1088), class_pos_emb rotary and the merger."""
        import jax.numpy as jnp

        from visionselector_tpu.models.llava_ov15 import rice as rice_mod

        _, hf_model = ov_oracle
        cfg, params = jax_ov
        pixels, grid = _image_inputs(cfg)

        with torch.no_grad():
            ref = hf_model.model.visual(
                torch.tensor(pixels, dtype=torch.float32),
                torch.tensor(np.asarray(grid)),
            ).numpy()

        rb = rice_mod.build_rice_batch(
            pixels, grid, spatial_merge_size=cfg.vision.spatial_merge_size)
        ours = np.asarray(rice_mod.rice_forward(
            params["visual"], jnp.asarray(rb.pixel_values),
            jnp.asarray(rb.rot_pos_ids), jnp.asarray(rb.insert_map),
            jnp.asarray(rb.strip_map), jnp.asarray(rb.seg_ids), cfg.vision,
        ))[: rb.num_merged]
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)

    def test_multi_image_merged_features_match(self, ov_oracle, jax_ov):
        """Two images -> two CLS segments.

        The oracle here is the reference run PER IMAGE, not its joint
        multi-image call: the reference's CLS strip
        (``modeling_llavaonevision1_5.py:1081-1088``) indexes
        ``hidden[seg_start+1 : seg_end+1]`` with the WITHOUT-CLS offsets for
        every segment, so segment i>0 is shifted by its preceding i CLS
        tokens (grabs the CLS + drops the last patch) — a latent upstream
        bug that never fires in their single-image-per-sample pipeline. Our
        gather-map strip accounts for the i offset; joint == solo here, and
        we pin that the oracle's joint call indeed diverges from its own
        solo outputs so this analysis stays checked."""
        import jax.numpy as jnp

        from visionselector_tpu.models.llava_ov15 import rice as rice_mod

        _, hf_model = ov_oracle
        cfg, params = jax_ov
        p1, g1 = _image_inputs(cfg, seed=1, hw=(56, 84))
        p2, g2 = _image_inputs(cfg, seed=2, hw=(84, 56))
        pixels = np.concatenate([p1, p2])
        grid = np.concatenate([g1, g2])

        with torch.no_grad():
            ref1 = hf_model.model.visual(
                torch.tensor(p1, dtype=torch.float32),
                torch.tensor(np.asarray(g1))).numpy()
            ref2 = hf_model.model.visual(
                torch.tensor(p2, dtype=torch.float32),
                torch.tensor(np.asarray(g2))).numpy()
            ref_joint = hf_model.model.visual(
                torch.tensor(pixels, dtype=torch.float32),
                torch.tensor(np.asarray(grid))).numpy()
        ref = np.concatenate([ref1, ref2])

        rb = rice_mod.build_rice_batch(
            pixels, grid, spatial_merge_size=cfg.vision.spatial_merge_size)
        ours = np.asarray(rice_mod.rice_forward(
            params["visual"], jnp.asarray(rb.pixel_values),
            jnp.asarray(rb.rot_pos_ids), jnp.asarray(rb.insert_map),
            jnp.asarray(rb.strip_map), jnp.asarray(rb.seg_ids), cfg.vision,
        ))[: rb.num_merged]
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)
        # first image agrees between the oracle's joint and solo runs ...
        np.testing.assert_allclose(ref_joint[: len(ref1)], ref1, atol=1e-5)
        # ... while the second demonstrates the oracle's off-by-i strip
        assert np.abs(ref_joint[len(ref1):] - ref2).max() > 1e-2

    def test_image_prefill_logits_match(self, ov_oracle, jax_ov):
        """Full-model next-token logits (uncompressed path) vs the oracle."""
        from visionselector_tpu.models.llava_ov15.model import OVEngine
        from visionselector_tpu.preprocess.rope import expand_vision_tokens

        _, hf_model = ov_oracle
        cfg, params = jax_ov
        pixels, grid = _image_inputs(cfg)
        input_ids = expand_vision_tokens(
            [100, 200, 300], [400, 500], grid,
            image_token_id=cfg.image_token_id,
            vision_start_token_id=151652, vision_end_token_id=151653,
        )
        t_orig = len(input_ids)

        with torch.no_grad():
            out = hf_model(
                input_ids=torch.tensor(np.asarray(input_ids)[None]),
                attention_mask=torch.ones(1, t_orig, dtype=torch.long),
                pixel_values=torch.tensor(pixels, dtype=torch.float32),
                image_grid_thw=torch.tensor(np.asarray(grid)),
            )
        hf_next = int(out.logits[0, -1].argmax())

        eng = OVEngine(cfg, params, use_selector=False)
        res = eng.generate(input_ids, pixels, grid, max_new_tokens=1,
                           eos_token_ids=(-1,))
        assert res.tokens[0] == hf_next

    def test_greedy_generation_matches_oracle(self, ov_oracle, jax_ov):
        from visionselector_tpu.models.llava_ov15.model import OVEngine
        from visionselector_tpu.preprocess.rope import expand_vision_tokens

        _, hf_model = ov_oracle
        cfg, params = jax_ov
        pixels, grid = _image_inputs(cfg, seed=3)
        input_ids = expand_vision_tokens(
            [100, 200], [300, 400, 500], grid,
            image_token_id=cfg.image_token_id,
            vision_start_token_id=151652, vision_end_token_id=151653,
        )
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

        eng = OVEngine(cfg, params, use_selector=False)
        res = eng.generate(input_ids, pixels, grid, max_new_tokens=6,
                           eos_token_ids=(-1,))
        assert res.tokens == hf_tokens, (res.tokens, hf_tokens)
