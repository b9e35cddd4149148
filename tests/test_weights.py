"""Checkpoint interop tests with a synthetic HF-layout safetensors file."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest
from safetensors.numpy import save_file

from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.models.qwen25vl.weights import (
    config_from_hf,
    export_scorer_to_safetensors,
    load_hf_checkpoint,
    load_scorer_params,
    _open_checkpoint,
)

CFG = qwen25vl_tiny()


def make_hf_checkpoint(tmp_path, with_scorer=True):
    """Synthetic HF-layout checkpoint for the tiny config."""
    rng = np.random.RandomState(0)
    v, t = CFG.vision, CFG.text
    tensors = {}

    def add(name, shape):
        tensors[name] = rng.randn(*shape).astype(np.float32)

    add("visual.patch_embed.proj.weight", (v.hidden_size, 3, 2, 14, 14))
    for i in range(v.depth):
        p = f"visual.blocks.{i}."
        add(p + "norm1.weight", (v.hidden_size,))
        add(p + "norm2.weight", (v.hidden_size,))
        add(p + "attn.qkv.weight", (3 * v.hidden_size, v.hidden_size))
        add(p + "attn.qkv.bias", (3 * v.hidden_size,))
        add(p + "attn.proj.weight", (v.hidden_size, v.hidden_size))
        add(p + "attn.proj.bias", (v.hidden_size,))
        add(p + "mlp.gate_proj.weight", (v.intermediate_size, v.hidden_size))
        add(p + "mlp.gate_proj.bias", (v.intermediate_size,))
        add(p + "mlp.up_proj.weight", (v.intermediate_size, v.hidden_size))
        add(p + "mlp.up_proj.bias", (v.intermediate_size,))
        add(p + "mlp.down_proj.weight", (v.hidden_size, v.intermediate_size))
        add(p + "mlp.down_proj.bias", (v.hidden_size,))
    add("visual.merger.ln_q.weight", (v.hidden_size,))
    m = v.spatial_merge_unit * v.hidden_size
    add("visual.merger.mlp.0.weight", (m, m))
    add("visual.merger.mlp.0.bias", (m,))
    add("visual.merger.mlp.2.weight", (v.out_hidden_size, m))
    add("visual.merger.mlp.2.bias", (v.out_hidden_size,))

    add("model.embed_tokens.weight", (t.vocab_size, t.hidden_size))
    for i in range(t.num_hidden_layers):
        p = f"model.layers.{i}."
        add(p + "input_layernorm.weight", (t.hidden_size,))
        add(p + "post_attention_layernorm.weight", (t.hidden_size,))
        dh = t.head_dim
        add(p + "self_attn.q_proj.weight", (t.num_attention_heads * dh, t.hidden_size))
        add(p + "self_attn.q_proj.bias", (t.num_attention_heads * dh,))
        add(p + "self_attn.k_proj.weight", (t.num_key_value_heads * dh, t.hidden_size))
        add(p + "self_attn.k_proj.bias", (t.num_key_value_heads * dh,))
        add(p + "self_attn.v_proj.weight", (t.num_key_value_heads * dh, t.hidden_size))
        add(p + "self_attn.v_proj.bias", (t.num_key_value_heads * dh,))
        add(p + "self_attn.o_proj.weight", (t.hidden_size, t.num_attention_heads * dh))
        add(p + "mlp.gate_proj.weight", (t.intermediate_size, t.hidden_size))
        add(p + "mlp.up_proj.weight", (t.intermediate_size, t.hidden_size))
        add(p + "mlp.down_proj.weight", (t.hidden_size, t.intermediate_size))
    add("model.norm.weight", (t.hidden_size,))

    if with_scorer:
        sel = CFG.with_selector().selector
        add("visual.importance_scorer.k_proj.weight", (sel.hidden_dim, sel.in_features))
        add("visual.importance_scorer.k_proj.bias", (sel.hidden_dim,))
        add("visual.importance_scorer.q_proj.weight", (sel.hidden_dim, sel.in_features))
        add("visual.importance_scorer.q_proj.bias", (sel.hidden_dim,))

    save_file(tensors, os.path.join(tmp_path, "model.safetensors"))
    return tensors


class TestLoad:
    def test_full_load_and_layout(self, tmp_path):
        tensors = make_hf_checkpoint(str(tmp_path))
        params = load_hf_checkpoint(str(tmp_path), CFG)

        # linear transpose convention
        np.testing.assert_allclose(
            np.asarray(params["lm"]["layers"]["q_kernel"][1]),
            tensors["model.layers.1.self_attn.q_proj.weight"].T,
        )
        # conv3d flattening: [E, C, T, P, P] -> [C*T*P*P, E]
        pe = tensors["visual.patch_embed.proj.weight"]
        np.testing.assert_allclose(
            np.asarray(params["visual"]["patch_embed_kernel"]),
            pe.reshape(pe.shape[0], -1).T,
        )
        # stacked layers
        assert params["visual"]["blocks"]["qkv_kernel"].shape[0] == CFG.vision.depth
        # scorer picked up
        assert "scorer" in params
        np.testing.assert_allclose(
            np.asarray(params["scorer"]["q_kernel"]),
            tensors["visual.importance_scorer.q_proj.weight"].T,
        )

    def test_loaded_model_runs(self, tmp_path):
        make_hf_checkpoint(str(tmp_path))
        params = load_hf_checkpoint(str(tmp_path), CFG)
        from visionselector_tpu.models.qwen25vl.model import QwenVLEngine
        from visionselector_tpu.preprocess.image import preprocess_image
        from visionselector_tpu.preprocess.rope import expand_vision_tokens

        img = (np.random.RandomState(3).rand(56, 56, 3) * 255).astype(np.uint8)
        pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        ids = expand_vision_tokens([10], [20], grid)
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.5)
        res = eng.generate(ids, pixels, grid, max_new_tokens=2)
        assert len(res.tokens) >= 1

    def test_missing_checkpoint_dir(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_hf_checkpoint(str(tmp_path / "nope"), CFG)

    def test_scorer_export_roundtrip(self, tmp_path):
        import jax
        from visionselector_tpu.selector.scorer import init_scorer_params

        sel = CFG.with_selector().selector
        sp = init_scorer_params(jax.random.PRNGKey(1), sel)
        out = os.path.join(str(tmp_path), "scorer.safetensors")
        export_scorer_to_safetensors(sp, out)
        get = _open_checkpoint(str(tmp_path))
        sp2 = load_scorer_params(get)
        for k in sp:
            np.testing.assert_allclose(np.asarray(sp[k]), np.asarray(sp2[k]))


class TestConfigFromHF:
    def test_parses_config_json(self, tmp_path):
        raw = {
            "vocab_size": 151936,
            "hidden_size": 2048,
            "intermediate_size": 11008,
            "num_hidden_layers": 36,
            "num_attention_heads": 16,
            "num_key_value_heads": 2,
            "tie_word_embeddings": True,
            "rope_scaling": {"type": "mrope", "mrope_section": [16, 24, 24]},
            "vision_config": {"out_hidden_size": 2048, "tokens_per_second": 2},
            "image_token_id": 151655,
        }
        with open(tmp_path / "config.json", "w") as f:
            json.dump(raw, f)
        cfg = config_from_hf(str(tmp_path))
        assert cfg.text.hidden_size == 2048
        assert cfg.text.mrope_section == (16, 24, 24)
        assert cfg.vision.out_hidden_size == 2048
