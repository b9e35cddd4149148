"""HF safetensors checkpoint interop for Qwen2.5-VL (+ selector scorer).

Maps Hugging Face parameter names (the layout of the reference's checkpoints,
incl. trained selector checkpoints whose scorer rides along as
``visual.importance_scorer.*`` — SURVEY.md §5.4) to this framework's stacked
functional parameter tree:

- torch ``nn.Linear`` stores [out, in]; we store [in, out] kernels (column-major
  matmul layout) -> transpose on load.
- the conv3d patch embed [E, C, T, P, P] flattens to a [C*T*P*P, E] matmul
  kernel (host patchify already emits rows in (C, T, P, P) order).
- per-layer tensors are stacked into [n_layers, ...] arrays for lax.scan.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from visionselector_tpu.core.config import TextConfig, VisionConfig, VLConfig


def _open_checkpoint(path: str) -> Callable[[str], np.ndarray]:
    """Returns get(name) -> np.ndarray over all *.safetensors in a dir."""
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors under {path}")
    index: Dict[str, str] = {}
    handles = {}
    for f in files:
        h = safe_open(f, framework="np")
        handles[f] = h
        for name in h.keys():
            index[name] = f

    def get(name: str) -> np.ndarray:
        f = index.get(name)
        if f is None:
            raise KeyError(name)
        t = handles[f].get_tensor(name)
        if t.dtype == np.dtype("V2"):  # bfloat16 raw view
            t = t.view(np.uint16).astype(np.uint32) << 16
            t = t.view(np.float32)
        return t

    get.names = set(index)  # type: ignore[attr-defined]
    return get


def _to(x: np.ndarray, dtype) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x), dtype=dtype)


def load_vit_params(get, cfg: VisionConfig, dtype, prefix: str = "visual.") -> dict:
    n = cfg.depth

    def stack(fmt, transform=None):
        ts = []
        for i in range(n):
            t = get(fmt.format(i=i))
            ts.append(transform(t) if transform else t)
        return _to(np.stack(ts), dtype)

    T = np.transpose
    p = prefix
    patch = get(f"{p}patch_embed.proj.weight")  # [E, C, T, P, P]
    patch = patch.reshape(patch.shape[0], -1).T  # [C*T*P*P, E]
    return {
        "patch_embed_kernel": _to(patch, dtype),
        "blocks": {
            "norm1_scale": stack(p + "blocks.{i}.norm1.weight"),
            "norm2_scale": stack(p + "blocks.{i}.norm2.weight"),
            "qkv_kernel": stack(p + "blocks.{i}.attn.qkv.weight", T),
            "qkv_bias": stack(p + "blocks.{i}.attn.qkv.bias"),
            "proj_kernel": stack(p + "blocks.{i}.attn.proj.weight", T),
            "proj_bias": stack(p + "blocks.{i}.attn.proj.bias"),
            "gate_kernel": stack(p + "blocks.{i}.mlp.gate_proj.weight", T),
            "gate_bias": stack(p + "blocks.{i}.mlp.gate_proj.bias"),
            "up_kernel": stack(p + "blocks.{i}.mlp.up_proj.weight", T),
            "up_bias": stack(p + "blocks.{i}.mlp.up_proj.bias"),
            "down_kernel": stack(p + "blocks.{i}.mlp.down_proj.weight", T),
            "down_bias": stack(p + "blocks.{i}.mlp.down_proj.bias"),
        },
        "merger_ln_scale": _to(get(f"{p}merger.ln_q.weight"), dtype),
        "merger_fc1_kernel": _to(get(f"{p}merger.mlp.0.weight").T, dtype),
        "merger_fc1_bias": _to(get(f"{p}merger.mlp.0.bias"), dtype),
        "merger_fc2_kernel": _to(get(f"{p}merger.mlp.2.weight").T, dtype),
        "merger_fc2_bias": _to(get(f"{p}merger.mlp.2.bias"), dtype),
    }


def load_lm_params(get, cfg: TextConfig, dtype, prefix: str = "model.") -> dict:
    n = cfg.num_hidden_layers
    T = np.transpose
    p = prefix

    def stack(fmt, transform=None):
        ts = []
        for i in range(n):
            t = get(fmt.format(i=i))
            ts.append(transform(t) if transform else t)
        return _to(np.stack(ts), dtype)

    params = {
        "embed_tokens": _to(get(f"{p}embed_tokens.weight"), dtype),
        "layers": {
            "input_ln_scale": stack(p + "layers.{i}.input_layernorm.weight"),
            "post_ln_scale": stack(p + "layers.{i}.post_attention_layernorm.weight"),
            "q_kernel": stack(p + "layers.{i}.self_attn.q_proj.weight", T),
            "q_bias": stack(p + "layers.{i}.self_attn.q_proj.bias"),
            "k_kernel": stack(p + "layers.{i}.self_attn.k_proj.weight", T),
            "k_bias": stack(p + "layers.{i}.self_attn.k_proj.bias"),
            "v_kernel": stack(p + "layers.{i}.self_attn.v_proj.weight", T),
            "v_bias": stack(p + "layers.{i}.self_attn.v_proj.bias"),
            "o_kernel": stack(p + "layers.{i}.self_attn.o_proj.weight", T),
            "gate_kernel": stack(p + "layers.{i}.mlp.gate_proj.weight", T),
            "up_kernel": stack(p + "layers.{i}.mlp.up_proj.weight", T),
            "down_kernel": stack(p + "layers.{i}.mlp.down_proj.weight", T),
        },
        "final_ln_scale": _to(get(f"{p}norm.weight"), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head_kernel"] = _to(get("lm_head.weight").T, dtype)
    return params


def load_scorer_params(get, dtype=jnp.float32,
                       prefix: str = "visual.importance_scorer.") -> Optional[dict]:
    try:
        return {
            "k_kernel": _to(get(f"{prefix}k_proj.weight").T, dtype),
            "k_bias": _to(get(f"{prefix}k_proj.bias"), dtype),
            "q_kernel": _to(get(f"{prefix}q_proj.weight").T, dtype),
            "q_bias": _to(get(f"{prefix}q_proj.bias"), dtype),
        }
    except KeyError:
        return None


def _resolve_qwen_prefixes(get):
    """Original releases use ``visual.`` / ``model.``; transformers >= 4.52
    exports use ``model.visual.`` / ``model.language_model.`` (the class's
    ``_checkpoint_conversion_mapping``). Probe which layout is present."""
    names = getattr(get, "names", set())
    if any(n.startswith("model.visual.") for n in names):
        return "model.visual.", "model.language_model."
    return "visual.", "model."


def load_hf_checkpoint(path: str, cfg: VLConfig) -> dict:
    """Load a full Qwen2.5-VL HF checkpoint dir (optionally with a trained
    ``visual.importance_scorer``) into the functional param tree."""
    get = _open_checkpoint(path)
    vis_prefix, lm_prefix = _resolve_qwen_prefixes(get)
    dtype = cfg.jax_dtype
    params = {
        "visual": load_vit_params(get, cfg.vision, dtype, prefix=vis_prefix),
        "lm": load_lm_params(get, cfg.text, dtype, prefix=lm_prefix),
    }
    scorer = load_scorer_params(
        get, prefix=f"{vis_prefix}importance_scorer."
    )
    if scorer is not None:
        params["scorer"] = scorer
    return params


def config_from_hf(path: str) -> VLConfig:
    """Build a VLConfig from an HF config.json (both the original flat layout
    and transformers >= 4.52 nested ``text_config`` exports)."""
    with open(os.path.join(path, "config.json")) as f:
        top = json.load(f)
    v = top.get("vision_config", {})
    # text fields live either at top level (original releases) or nested
    raw = dict(top.get("text_config", {}) or {})
    for k, val in top.items():
        raw.setdefault(k, val)
    vision = VisionConfig(
        depth=v.get("depth", 32),
        hidden_size=v.get("hidden_size", 1280),
        intermediate_size=v.get("intermediate_size", 3420),
        num_heads=v.get("num_heads", 16),
        in_channels=v.get("in_channels", 3),
        patch_size=v.get("patch_size", 14),
        spatial_merge_size=v.get("spatial_merge_size", 2),
        temporal_patch_size=v.get("temporal_patch_size", 2),
        tokens_per_second=v.get("tokens_per_second", 2),
        window_size=v.get("window_size", 112),
        out_hidden_size=v.get("out_hidden_size", 2048),
        fullatt_block_indexes=tuple(v.get("fullatt_block_indexes", (7, 15, 23, 31))),
    )
    text = TextConfig(
        vocab_size=raw.get("vocab_size", 151936),
        hidden_size=raw.get("hidden_size", 2048),
        intermediate_size=raw.get("intermediate_size", 11008),
        num_hidden_layers=raw.get("num_hidden_layers", 36),
        num_attention_heads=raw.get("num_attention_heads", 16),
        num_key_value_heads=raw.get("num_key_value_heads", 2),
        rms_norm_eps=raw.get("rms_norm_eps", 1e-6),
        rope_theta=raw.get("rope_theta", 1000000.0),
        mrope_section=tuple(
            (raw.get("rope_scaling") or {}).get("mrope_section", (16, 24, 24))
        ),
        tie_word_embeddings=raw.get("tie_word_embeddings", True),
        max_position_embeddings=raw.get("max_position_embeddings", 128000),
    )
    return VLConfig(
        vision=vision,
        text=text,
        image_token_id=raw.get("image_token_id", 151655),
        video_token_id=raw.get("video_token_id", 151656),
        vision_start_token_id=raw.get("vision_start_token_id", 151652),
        vision_end_token_id=raw.get("vision_end_token_id", 151653),
        eos_token_id=raw.get("eos_token_id", 151645),
    )


def pad_vit_head_dim(vit_params: dict, cfg: VisionConfig,
                     dp: int = 128) -> dict:
    """Zero-pad ViT attention heads to ``dp`` columns in the WEIGHTS.

    head_dim=80 forces HBM transposes for the Pallas kernel (Mosaic last-dim
    constraint); with heads padded to 128 the transpose-free packed layout
    applies and results are exactly equal (pad channels carry zeros end to
    end: qkv output columns zero, proj input rows zero).
    """
    import numpy as np

    d = cfg.head_dim
    if d == dp:
        return vit_params
    h = cfg.num_heads
    blocks = dict(vit_params["blocks"])
    n = blocks["qkv_kernel"].shape[0]

    qkv = np.asarray(blocks["qkv_kernel"])  # [n, D, 3*H*d]
    qkv = qkv.reshape(n, -1, 3, h, d)
    qkv = np.pad(qkv, ((0, 0), (0, 0), (0, 0), (0, 0), (0, dp - d)))
    blocks["qkv_kernel"] = jnp.asarray(
        qkv.reshape(n, -1, 3 * h * dp), vit_params["blocks"]["qkv_kernel"].dtype
    )
    qb = np.asarray(blocks["qkv_bias"]).reshape(n, 3, h, d)
    qb = np.pad(qb, ((0, 0), (0, 0), (0, 0), (0, dp - d)))
    blocks["qkv_bias"] = jnp.asarray(
        qb.reshape(n, 3 * h * dp), vit_params["blocks"]["qkv_bias"].dtype
    )
    proj = np.asarray(blocks["proj_kernel"]).reshape(n, h, d, -1)
    proj = np.pad(proj, ((0, 0), (0, 0), (0, dp - d), (0, 0)))
    blocks["proj_kernel"] = jnp.asarray(
        proj.reshape(n, h * dp, -1), vit_params["blocks"]["proj_kernel"].dtype
    )
    out = dict(vit_params)
    out["blocks"] = blocks
    return out


def export_scorer_to_safetensors(scorer_params: dict, path: str,
                                 prefix: str = "visual.importance_scorer.") -> None:
    """Save a trained scorer in the reference checkpoint layout so it can be
    merged into an HF dir (names per ``selector_scorer.py``)."""
    from safetensors.numpy import save_file

    # safetensors requires C-contiguous buffers; .T views are not.
    tensors = {
        f"{prefix}k_proj.weight": np.ascontiguousarray(
            np.asarray(scorer_params["k_kernel"]).T
        ),
        f"{prefix}k_proj.bias": np.asarray(scorer_params["k_bias"]),
        f"{prefix}q_proj.weight": np.ascontiguousarray(
            np.asarray(scorer_params["q_kernel"]).T
        ),
        f"{prefix}q_proj.bias": np.asarray(scorer_params["q_bias"]),
    }
    save_file(tensors, path)
