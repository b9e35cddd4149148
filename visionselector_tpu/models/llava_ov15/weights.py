"""HF safetensors interop for LLaVA-OneVision-1.5 (RICE ViT + Qwen3 text).

Checkpoint layout per ``modeling_llavaonevision1_5.py:1395-1779``:
``model.visual.*`` (RICE), ``model.language_model.*`` (text), ``lm_head.weight``
— older exports use ``visual.*`` / ``model.*`` (the class's
``_checkpoint_conversion_mapping``), so both prefixes are probed. A trained
scorer rides in ``model.visual.importance_scorer.*``.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from visionselector_tpu.core.config import OVConfig, RiceVisionConfig, TextConfig
from visionselector_tpu.models.qwen25vl.weights import (
    _open_checkpoint,
    _to,
    load_scorer_params,
)


def _resolve_prefixes(get):
    names = get.names
    if any(n.startswith("model.visual.") for n in names):
        return "model.visual.", "model.language_model."
    return "visual.", "model."


def load_rice_params(get, cfg: RiceVisionConfig, dtype, prefix: str) -> dict:
    n = cfg.depth
    T = np.transpose
    p = prefix

    def stack(fmt, transform=None):
        ts = []
        for i in range(n):
            t = get(fmt.format(i=i))
            ts.append(transform(t) if transform else t)
        return _to(np.stack(ts), dtype)

    patch = get(f"{p}patch_embed.proj.weight")  # [E, C, P, P]
    patch = patch.reshape(patch.shape[0], -1).T
    return {
        "patch_embed_kernel": _to(patch, dtype),
        "class_embedding": _to(get(f"{p}class_embedding"), dtype),
        "class_pos_emb": _to(
            get(f"{p}class_pos_emb").reshape(-1), jnp.float32
        ),
        "pre_ln_scale": _to(get(f"{p}pre_layernorm.weight"), dtype),
        "pre_ln_bias": _to(get(f"{p}pre_layernorm.bias"), dtype),
        "blocks": {
            "norm1_scale": stack(p + "blocks.{i}.norm1.weight"),
            "norm1_bias": stack(p + "blocks.{i}.norm1.bias"),
            "norm2_scale": stack(p + "blocks.{i}.norm2.weight"),
            "norm2_bias": stack(p + "blocks.{i}.norm2.bias"),
            "qkv_kernel": stack(p + "blocks.{i}.attn.qkv.weight", T),
            "qkv_bias": stack(p + "blocks.{i}.attn.qkv.bias"),
            "proj_kernel": stack(p + "blocks.{i}.attn.proj.weight", T),
            "proj_bias": stack(p + "blocks.{i}.attn.proj.bias"),
            "fc1_kernel": stack(p + "blocks.{i}.mlp.fc1.weight", T),
            "fc1_bias": stack(p + "blocks.{i}.mlp.fc1.bias"),
            "fc2_kernel": stack(p + "blocks.{i}.mlp.fc2.weight", T),
            "fc2_bias": stack(p + "blocks.{i}.mlp.fc2.bias"),
        },
        "merger_ln_scale": _to(get(f"{p}merger.ln_q.weight"), dtype),
        "merger_ln_bias": _to(get(f"{p}merger.ln_q.bias"), dtype),
        "merger_fc1_kernel": _to(get(f"{p}merger.mlp.0.weight").T, dtype),
        "merger_fc1_bias": _to(get(f"{p}merger.mlp.0.bias"), dtype),
        "merger_fc2_kernel": _to(get(f"{p}merger.mlp.2.weight").T, dtype),
        "merger_fc2_bias": _to(get(f"{p}merger.mlp.2.bias"), dtype),
    }


def load_qwen3_lm_params(get, cfg: TextConfig, dtype, prefix: str) -> dict:
    n = cfg.num_hidden_layers
    T = np.transpose
    p = prefix

    def stack(fmt, transform=None):
        ts = []
        for i in range(n):
            t = get(fmt.format(i=i))
            ts.append(transform(t) if transform else t)
        return _to(np.stack(ts), dtype)

    layers = {
        "input_ln_scale": stack(p + "layers.{i}.input_layernorm.weight"),
        "post_ln_scale": stack(p + "layers.{i}.post_attention_layernorm.weight"),
        "q_kernel": stack(p + "layers.{i}.self_attn.q_proj.weight", T),
        "k_kernel": stack(p + "layers.{i}.self_attn.k_proj.weight", T),
        "v_kernel": stack(p + "layers.{i}.self_attn.v_proj.weight", T),
        "o_kernel": stack(p + "layers.{i}.self_attn.o_proj.weight", T),
    }
    if cfg.num_experts > 0:
        # Qwen3-MoE experts (``modeling_llavaonevision1_5_moe.py:658-707``):
        # router = mlp.gate, experts stacked [n_layers, E, ...].
        layers["router_kernel"] = stack(p + "layers.{i}.mlp.gate.weight", T)

        def stack_experts(fmt):
            ts = []
            for i in range(n):
                ts.append(np.stack([
                    np.transpose(get(fmt.format(i=i, j=j)))
                    for j in range(cfg.num_experts)
                ]))
            return _to(np.stack(ts), dtype)

        layers["expert_gate_kernel"] = stack_experts(
            p + "layers.{i}.mlp.experts.{j}.gate_proj.weight")
        layers["expert_up_kernel"] = stack_experts(
            p + "layers.{i}.mlp.experts.{j}.up_proj.weight")
        layers["expert_down_kernel"] = stack_experts(
            p + "layers.{i}.mlp.experts.{j}.down_proj.weight")
    else:
        layers["gate_kernel"] = stack(p + "layers.{i}.mlp.gate_proj.weight", T)
        layers["up_kernel"] = stack(p + "layers.{i}.mlp.up_proj.weight", T)
        layers["down_kernel"] = stack(p + "layers.{i}.mlp.down_proj.weight", T)
    if cfg.qk_norm:
        layers["q_norm_scale"] = stack(p + "layers.{i}.self_attn.q_norm.weight")
        layers["k_norm_scale"] = stack(p + "layers.{i}.self_attn.k_norm.weight")
    params = {
        "embed_tokens": _to(get(f"{p}embed_tokens.weight"), dtype),
        "layers": layers,
        "final_ln_scale": _to(get(f"{p}norm.weight"), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head_kernel"] = _to(get("lm_head.weight").T, dtype)
    return params


def load_ov_checkpoint(path: str, cfg: OVConfig) -> dict:
    get = _open_checkpoint(path)
    vis_prefix, lm_prefix = _resolve_prefixes(get)
    dtype = cfg.jax_dtype
    params = {
        "visual": load_rice_params(get, cfg.vision, dtype, vis_prefix),
        "lm": load_qwen3_lm_params(get, cfg.text, dtype, lm_prefix),
    }
    scorer = load_scorer_params(get, prefix=f"{vis_prefix}importance_scorer.")
    if scorer is not None:
        params["scorer"] = scorer
    return params


def ov_config_from_hf(path: str) -> OVConfig:
    with open(os.path.join(path, "config.json")) as f:
        raw = json.load(f)
    v = raw.get("vision_config", {})
    t = raw.get("text_config", raw)
    vision = RiceVisionConfig(
        depth=v.get("depth", 24),
        hidden_size=v.get("hidden_size", 1024),
        intermediate_size=v.get("intermediate_size", 4096),
        num_heads=v.get("num_heads", 16),
        patch_size=v.get("patch_size", 14),
        spatial_merge_size=v.get("spatial_merge_size", 2),
        temporal_patch_size=v.get("temporal_patch_size", 1),
        layer_norm_eps=v.get("layer_norm_eps", 1e-5),
        text_hidden_size=v.get("text_hidden_size", t.get("hidden_size", 4096)),
    )
    text = TextConfig(
        vocab_size=t.get("vocab_size", 151936),
        hidden_size=t.get("hidden_size", 4096),
        intermediate_size=t.get("intermediate_size", 12288),
        num_hidden_layers=t.get("num_hidden_layers", 36),
        num_attention_heads=t.get("num_attention_heads", 32),
        num_key_value_heads=t.get("num_key_value_heads", 8),
        head_dim_override=t.get("head_dim", 128),
        rms_norm_eps=t.get("rms_norm_eps", 1e-6),
        rope_theta=t.get("rope_theta", 1000000.0),
        qk_norm=True,
        attention_bias=t.get("attention_bias", False),
        mrope=False,
        tie_word_embeddings=raw.get("tie_word_embeddings", False),
        # MoE variant (configuration_llavaonevision1_5_moe.py:214-264)
        num_experts=t.get("num_experts", 0),
        num_experts_per_tok=t.get("num_experts_per_tok", 8),
        moe_intermediate_size=t.get("moe_intermediate_size", 768),
        norm_topk_prob=t.get("norm_topk_prob", True),
    )
    return OVConfig(
        vision=vision,
        text=text,
        image_token_id=raw.get("image_token_id", 151655),
        video_token_id=raw.get("video_token_id", 151656),
    )
