"""RICE ViT (LLaVA-OneVision-1.5 vision tower) as pure functions.

Functional re-design of ``RiceTransformerPretrainedModel``
(``llava-ov-15/llavaonevision1_5/modeling_llavaonevision1_5.py:912-1093``):

- conv2d patch embed (temporal_patch=1) -> matmul over flattened patches,
- a learned CLS token inserted at the START of every image segment, carrying a
  LEARNED rotary frequency row (``class_pos_emb``) instead of position-derived
  freqs; stripped after the blocks. The reference does this with a python
  write loop (:1049-1064, :1084-1088); here the host emits gather maps and the
  device does two gathers — O(S), jit-static.
- LayerNorm (with bias) everywhere the Qwen ViT used RMSNorm; plain-GELU
  fc1/fc2 MLP; pre-layernorm before the blocks; no windowing (full per-image
  segments, so the same segment-masked flash kernel applies).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from visionselector_tpu.core.config import RiceVisionConfig
from visionselector_tpu.kernels.attention import attention
from visionselector_tpu.models.qwen25vl.vit import apply_rotary
from visionselector_tpu.preprocess.indices import (
    full_attn_cu_seqlens,
    vision_rot_pos_ids,
)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * scale + bias).astype(x.dtype)


@dataclasses.dataclass
class RiceBatch:
    """Host-built statically-shaped inputs for one RICE forward.

    S = padded patch count; S' = S + n_seg_max padded CLS'd length.
    """

    pixel_values: np.ndarray  # [S_pad, patch_dim]
    rot_pos_ids: np.ndarray  # [S_pad, 2]
    insert_map: np.ndarray  # [S'_pad] int: patch idx, or S_pad (CLS), S_pad+1 (pad)
    strip_map: np.ndarray  # [S_pad] int: row of patch i in the CLS'd sequence
    seg_ids: np.ndarray  # [S'_pad] segments over the CLS'd sequence
    kv_bounds: np.ndarray  # [num_q_blocks, 2]
    grid_thw: np.ndarray
    num_patches: int
    num_merged: int


def build_rice_batch(
    pixel_values: np.ndarray,
    grid_thw: np.ndarray,
    spatial_merge_size: int = 2,
    pad_to: int | None = None,
    cls_slots: int | None = None,
) -> RiceBatch:
    """Assemble gather maps for CLS insertion/stripping + segments."""
    s_real = int(pixel_values.shape[0])
    g = np.asarray(grid_thw)
    cu = full_attn_cu_seqlens(g)  # per-image(-frame) patch boundaries
    n_seg = len(cu) - 1

    s_pad = pad_to if pad_to is not None else s_real
    assert s_pad >= s_real
    cls_slots = cls_slots if cls_slots is not None else n_seg
    assert cls_slots >= n_seg
    sp_pad = s_pad + cls_slots

    CLS = s_pad  # sentinel row for the class embedding
    PAD = s_pad + 1

    insert_map = np.full(sp_pad, PAD, np.int64)
    strip_map = np.zeros(s_pad, np.int64)
    seg = np.zeros(sp_pad, np.int32)
    w = 0
    for i in range(n_seg):
        a, b = int(cu[i]), int(cu[i + 1])
        insert_map[w] = CLS
        seg[w] = i + 1
        strip_map[a:b] = np.arange(w + 1, w + 1 + (b - a))
        insert_map[w + 1 : w + 1 + (b - a)] = np.arange(a, b)
        seg[w + 1 : w + 1 + (b - a)] = i + 1
        w += 1 + (b - a)
    # padding patches strip from a dead row (last, seg 0 -> zeros)
    strip_map[s_real:] = sp_pad - 1 if w < sp_pad else w - 1

    from visionselector_tpu.kernels.attention import (
        VIT_BLOCK,
        segment_block_bounds,
    )

    rot = vision_rot_pos_ids(g, spatial_merge_size)
    pad_rows = s_pad - s_real
    block = min(VIT_BLOCK, sp_pad)
    return RiceBatch(
        pixel_values=np.pad(pixel_values.astype(np.float32),
                            ((0, pad_rows), (0, 0))),
        rot_pos_ids=np.pad(rot, ((0, pad_rows), (0, 0))),
        insert_map=insert_map,
        strip_map=strip_map,
        seg_ids=seg,
        kv_bounds=segment_block_bounds(seg, block, block)
        if sp_pad % block == 0 else None,
        grid_thw=g,
        num_patches=s_real,
        num_merged=s_real // (spatial_merge_size**2),
    )


def _rice_block(x, p, seg_ids, cos, sin, cfg: RiceVisionConfig, kv_bounds=None):
    h = layer_norm(x, p["norm1_scale"], p["norm1_bias"], cfg.layer_norm_eps)
    s, d = h.shape[0], cfg.head_dim
    qkv = h @ p["qkv_kernel"] + p["qkv_bias"]
    q, k, v = jnp.split(qkv.reshape(s, 3, cfg.num_heads, d), 3, axis=1)
    q, k, v = q[:, 0], k[:, 0], v[:, 0]
    q, k = apply_rotary(q, k, cos, sin)
    from visionselector_tpu.kernels.attention import VIT_BLOCK

    attn = attention(
        q[None], k[None], v[None], seg_ids[None], seg_ids[None], causal=False,
        kv_bounds=kv_bounds, block_q=VIT_BLOCK, block_k=VIT_BLOCK,
    )[0]
    x = x + attn.reshape(s, -1) @ p["proj_kernel"] + p["proj_bias"]
    h = layer_norm(x, p["norm2_scale"], p["norm2_bias"], cfg.layer_norm_eps)
    h = jax.nn.gelu(h @ p["fc1_kernel"] + p["fc1_bias"], approximate=False)
    x = x + h @ p["fc2_kernel"] + p["fc2_bias"]
    return x


def rice_forward(
    params: dict,
    pixel_values: jax.Array,  # [S_pad, patch_dim]
    rot_pos_ids: jax.Array,  # [S_pad, 2]
    insert_map: jax.Array,  # [S'_pad]
    strip_map: jax.Array,  # [S_pad]
    seg_ids: jax.Array,  # [S'_pad]
    cfg: RiceVisionConfig,
    kv_bounds: jax.Array | None = None,
) -> jax.Array:
    """RICE tower forward -> merged tokens [L_pad, text_hidden] original order."""
    dtype = params["patch_embed_kernel"].dtype
    patches = pixel_values.astype(dtype) @ params["patch_embed_kernel"]  # [S, D]
    s_pad, d = patches.shape

    # rotary freqs per patch; CLS rows take the learned class_pos_emb freqs
    dim = cfg.head_dim // 2
    inv_freq = 1.0 / (
        10000.0 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    )
    freqs = rot_pos_ids.astype(jnp.float32)[:, :, None] * inv_freq[None, None, :]
    freqs = freqs.reshape(s_pad, -1)  # [S, dim]

    cls_row = params["class_embedding"].astype(dtype)[None]  # [1, D]
    patch_buf = jnp.concatenate(
        [patches, cls_row, jnp.zeros((1, d), dtype)]
    )  # [S+2, D]
    freq_buf = jnp.concatenate(
        [freqs,
         jnp.broadcast_to(params["class_pos_emb"].astype(jnp.float32), (1, dim)),
         jnp.zeros((1, dim), jnp.float32)]
    )
    x = patch_buf[insert_map]  # [S', D]
    f = freq_buf[insert_map]
    emb = jnp.concatenate([f, f], axis=-1)  # [S', head_dim]
    cos, sin = jnp.cos(emb), jnp.sin(emb)

    x = layer_norm(x, params["pre_ln_scale"], params["pre_ln_bias"],
                   cfg.layer_norm_eps)

    def layer(x, p):
        return _rice_block(x, p, seg_ids, cos, sin, cfg, kv_bounds), None

    x, _ = jax.lax.scan(layer, x, params["blocks"])

    x = x[strip_map]  # [S_pad, D] back to patch order (CLS dropped)

    m = cfg.spatial_merge_unit
    h = layer_norm(x, params["merger_ln_scale"], params["merger_ln_bias"],
                   cfg.layer_norm_eps)
    h = h.reshape(s_pad // m, m * cfg.hidden_size)
    h = h @ params["merger_fc1_kernel"] + params["merger_fc1_bias"]
    h = jax.nn.gelu(h, approximate=False)
    h = h @ params["merger_fc2_kernel"] + params["merger_fc2_bias"]
    return h  # [L_pad, text_hidden]


def rice_forward_stats(
    params: dict,
    pixel_values: jax.Array,
    rot_pos_ids: jax.Array,
    insert_map: jax.Array,
    strip_map: jax.Array,
    seg_ids: jax.Array,
    cfg: RiceVisionConfig,
):
    """RICE forward that also exposes last-block attention statistics.

    OV training-free baselines consume the last block's attention map and key
    states (reference captures them by patching the attention module:
    ``llava-ov-15/compression_method/visionzip.py``, ``divprune.py``). Mirrors
    ``qwen25vl.vit.vit_forward_stats``.

    Returns (merged [L_pad, text_hidden], attn_received [L_pad] fp32 pooled to
    merged tokens in patch order, pooled_keys [L_pad, H*d] fp32).
    """
    dtype = params["patch_embed_kernel"].dtype
    patches = pixel_values.astype(dtype) @ params["patch_embed_kernel"]
    s_pad, d_model = patches.shape

    dim = cfg.head_dim // 2
    inv_freq = 1.0 / (
        10000.0 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    )
    freqs = rot_pos_ids.astype(jnp.float32)[:, :, None] * inv_freq[None, None, :]
    freqs = freqs.reshape(s_pad, -1)
    cls_row = params["class_embedding"].astype(dtype)[None]
    patch_buf = jnp.concatenate(
        [patches, cls_row, jnp.zeros((1, d_model), dtype)]
    )
    freq_buf = jnp.concatenate(
        [freqs,
         jnp.broadcast_to(params["class_pos_emb"].astype(jnp.float32), (1, dim)),
         jnp.zeros((1, dim), jnp.float32)]
    )
    x = patch_buf[insert_map]
    f = freq_buf[insert_map]
    emb = jnp.concatenate([f, f], axis=-1)
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    x = layer_norm(x, params["pre_ln_scale"], params["pre_ln_bias"],
                   cfg.layer_norm_eps)

    blocks = params["blocks"]
    for i in range(cfg.depth - 1):
        p = jax.tree.map(lambda a: a[i], blocks)
        x = _rice_block(x, p, seg_ids, cos, sin, cfg)

    # Last block with explicit fp32 masked softmax for the stats.
    p = jax.tree.map(lambda a: a[cfg.depth - 1], blocks)
    h = layer_norm(x, p["norm1_scale"], p["norm1_bias"], cfg.layer_norm_eps)
    sp, d = h.shape[0], cfg.head_dim
    qkv = h @ p["qkv_kernel"] + p["qkv_bias"]
    q, k, v = jnp.split(qkv.reshape(sp, 3, cfg.num_heads, d), 3, axis=1)
    q, k, v = q[:, 0], k[:, 0], v[:, 0]
    q, k = apply_rotary(q, k, cos, sin)
    # Streamed masked softmax + per-key received mass (no [H, S, S] map).
    from visionselector_tpu.kernels.attention import attention_with_received

    attn_out, recv = attention_with_received(q, k, v, seg_ids, scale=d**-0.5)
    attn_out = attn_out.astype(v.dtype)

    x = x + attn_out.reshape(sp, -1) @ p["proj_kernel"] + p["proj_bias"]
    h2 = layer_norm(x, p["norm2_scale"], p["norm2_bias"], cfg.layer_norm_eps)
    h2 = jax.nn.gelu(h2 @ p["fc1_kernel"] + p["fc1_bias"], approximate=False)
    x = x + h2 @ p["fc2_kernel"] + p["fc2_bias"]

    # strip CLS rows back to patch order, pool 4->1 to merged granularity
    m = cfg.spatial_merge_unit
    recv_patch = recv[strip_map]  # [S_pad]
    recv_pooled = recv_patch.reshape(-1, m).mean(axis=1)  # [L_pad]
    keys_flat = k.reshape(sp, cfg.num_heads * d).astype(jnp.float32)
    keys_pooled = keys_flat[strip_map].reshape(s_pad // m, m, -1).mean(axis=1)

    x = x[strip_map]
    h = layer_norm(x, params["merger_ln_scale"], params["merger_ln_bias"],
                   cfg.layer_norm_eps)
    h = h.reshape(s_pad // m, m * cfg.hidden_size)
    h = h @ params["merger_fc1_kernel"] + params["merger_fc1_bias"]
    h = jax.nn.gelu(h, approximate=False)
    h = h @ params["merger_fc2_kernel"] + params["merger_fc2_bias"]
    return h, recv_pooled, keys_pooled


def init_rice_params(key: jax.Array, cfg: RiceVisionConfig,
                     dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 10)
    d, i, o = cfg.hidden_size, cfg.intermediate_size, cfg.text_hidden_size
    m = cfg.spatial_merge_unit
    n = cfg.depth

    def nrm(k, shape, std=0.02):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    blocks = {
        "norm1_scale": jnp.ones((n, d), dtype),
        "norm1_bias": jnp.zeros((n, d), dtype),
        "norm2_scale": jnp.ones((n, d), dtype),
        "norm2_bias": jnp.zeros((n, d), dtype),
        "qkv_kernel": nrm(ks[0], (n, d, 3 * d)),
        "qkv_bias": jnp.zeros((n, 3 * d), dtype),
        "proj_kernel": nrm(ks[1], (n, d, d)),
        "proj_bias": jnp.zeros((n, d), dtype),
        "fc1_kernel": nrm(ks[2], (n, d, i)),
        "fc1_bias": jnp.zeros((n, i), dtype),
        "fc2_kernel": nrm(ks[3], (n, i, d)),
        "fc2_bias": jnp.zeros((n, d), dtype),
    }
    return {
        "patch_embed_kernel": nrm(ks[4], (cfg.patch_dim, d)),
        "class_embedding": (jax.random.normal(ks[5], (d,)) * d**-0.5).astype(dtype),
        # learned rotary freq row for the CLS token: [head_dim // 2]
        "class_pos_emb": jax.random.normal(
            ks[6], (cfg.head_dim // 2,)
        ).astype(jnp.float32),
        "pre_ln_scale": jnp.ones((d,), dtype),
        "pre_ln_bias": jnp.zeros((d,), dtype),
        "blocks": blocks,
        "merger_ln_scale": jnp.ones((d,), dtype),
        "merger_ln_bias": jnp.zeros((d,), dtype),
        "merger_fc1_kernel": nrm(ks[7], (m * d, m * d)),
        "merger_fc1_bias": jnp.zeros((m * d,), dtype),
        "merger_fc2_kernel": nrm(ks[8], (m * d, o)),
        "merger_fc2_bias": jnp.zeros((o,), dtype),
    }
