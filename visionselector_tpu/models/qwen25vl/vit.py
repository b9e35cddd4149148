"""Qwen2.5-VL vision tower as pure functions over a parameter pytree.

Functional re-design of the reference ViT
(``qwen-evaluation/qwen25vl/modeling_qwen2_5_vl.py:409-568``):

- the conv3d patch embed is a single matmul over pre-flattened patches (the
  host already emits rows in conv-kernel order — MXU-friendly, no conv op),
- the window permutation is applied on the host; the device sees two segment-id
  arrays (window / per-image) and each block picks one — expressed as a
  ``lax.scan`` over stacked layer params with a per-layer selector flag, so 32
  blocks trace once,
- rotary embeddings are computed from (h, w) position ids in fp32 and applied
  with rotate-half (equivalent to the reference's flash-attn rotary; cos/sin
  duplication at ``modeling_qwen2_5_vl.py:539-540``),
- attention is the shared segment-masked flash kernel.

Shapes: S = padded patch count, L = S / merge_unit merged tokens.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from visionselector_tpu.core.config import VisionConfig
from visionselector_tpu.kernels.attention import attention


def rms_norm(x: jax.Array, scale: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (scale * (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)).astype(x.dtype)


def rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array):
    """q, k: [S, H, D]; cos/sin: [S, D] fp32 (precomputed).

    The rotation itself runs in the activation dtype — cos/sin are exact in
    fp32 and |cos|,|sin| <= 1, so a bf16 multiply loses <1 ulp of bf16; the
    reference's training path applies rotary in bf16 too
    (``qwen-vl-finetune/compression_method/selector_model.py:93-98``). Halves
    the HBM traffic of the rotary elementwise pass on TPU.
    """
    cos = cos[:, None, :].astype(q.dtype)
    sin = sin[:, None, :].astype(q.dtype)
    q_out = q * cos + rotate_half(q) * sin
    k_out = k * cos + rotate_half(k) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def vision_rotary_cos_sin(rot_pos_ids: jax.Array, head_dim: int) -> Tuple[jax.Array, jax.Array]:
    """(h, w) position ids [S, 2] -> cos/sin [S, head_dim] fp32.

    Per token: 1D rotary freqs of the h position (head_dim//4 channels) concat
    freqs of the w position, then duplicated (reference ``rot_pos_emb`` +
    ``emb = cat(rope, rope)``).
    """
    dim = head_dim // 2  # rotary channels before duplication
    inv_freq = 1.0 / (
        10000.0 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    )  # [dim//2]
    freqs = rot_pos_ids.astype(jnp.float32)[:, :, None] * inv_freq[None, None, :]
    freqs = freqs.reshape(rot_pos_ids.shape[0], -1)  # [S, dim] (h then w)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [S, head_dim]
    return jnp.cos(emb), jnp.sin(emb)


def apply_rotary_padded(q, k, cos, sin, real_d: int):
    """Rotary for zero-padded heads [S, H, dp] (dp > real_d).

    rotate_half pairs dim i with i±d/2 of the REAL d channels; expressed as a
    static lane permutation + signed sin so the padded tail stays zero:
      out[i] = q[i]*cos'[i] + q[perm[i]]*sin'[i],
      perm: swap halves of the first d dims, identity after; sin' negated on
      the first half, zero on the pad; cos' = 1 on the pad.
    """
    s, _, dp = q.shape
    d = real_d
    half = d // 2
    perm = jnp.concatenate([
        jnp.arange(half) + half, jnp.arange(half), jnp.arange(d, dp)
    ])
    cos_pad = jnp.pad(cos[:, :d], ((0, 0), (0, dp - d)), constant_values=1.0)
    sin_pad = jnp.concatenate(
        [-sin[:, :half], sin[:, half:d], jnp.zeros((s, dp - d), sin.dtype)],
        axis=-1,
    )
    cos_pad = cos_pad[:, None, :].astype(q.dtype)
    sin_pad = sin_pad[:, None, :].astype(q.dtype)

    def rot(x):
        return x * cos_pad + jnp.take(x, perm, axis=-1) * sin_pad

    return rot(q), rot(k)


VIT_QUANT_KERNELS = ("qkv_kernel", "proj_kernel", "gate_kernel",
                     "up_kernel", "down_kernel")


def quantize_vit_params(visual: dict) -> dict:
    """W8A8 ViT (opt-in experiment): per-output-channel symmetric int8
    weights for the block matmuls; activations are quantized per token at
    run time (``_vit_dense``), so the matmuls hit the MXU's 2x-rate int8
    path — unlike the LM's weight-only int8, which only halves weight HBM.
    patch_embed and the merger stay high precision (raw-pixel dynamic range /
    tiny cost). Accuracy-affecting: keep out of the default path.
    """
    blocks = dict(visual["blocks"])
    for name in VIT_QUANT_KERNELS:
        w = blocks[name]  # [n_layers, in, out]
        amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1)  # [n, out]
        scale = jnp.maximum(amax / 127.0, 1e-12)
        blocks[name] = jnp.clip(
            jnp.round(w.astype(jnp.float32) / scale[:, None, :]), -127, 127
        ).astype(jnp.int8)
        blocks[name + "_scale"] = scale
    out = dict(visual)
    out["blocks"] = blocks
    return out


def _vit_dense(x, p, name):
    """x @ kernel (+ W8A8 path when the kernel is int8-quantized)."""
    w = p[name]
    if w.dtype != jnp.int8:
        return x @ w + p[name.replace("_kernel", "_bias")]
    xf = x.astype(jnp.float32)
    x_scale = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12
    )
    xq = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * x_scale * p[name + "_scale"][None, :]
    return (y + p[name.replace("_kernel", "_bias")].astype(jnp.float32)
            ).astype(x.dtype)


def _block(
    x: jax.Array,
    p: dict,
    seg_ids: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    cfg: VisionConfig,
    kv_bounds: jax.Array | None = None,
    attn_fn=None,
    fused_fn=None,
) -> jax.Array:
    """One ViT block: pre-RMSNorm attn + pre-RMSNorm SwiGLU MLP, residuals.

    Supports zero-padded attention heads (dp=128 > head_dim=80, see
    ``weights.pad_vit_head_dim``): detected from the qkv kernel shape; enables
    the transpose-free packed Pallas layout. Results are exactly equal (pad
    columns are zero in the weights).

    ``attn_fn(q, k, v) -> attn`` overrides the attention call (used by
    vit_forward to dispatch window vs full layers with their own block
    sizes)."""
    h = rms_norm(x, p["norm1_scale"], cfg.rms_norm_eps)
    s, d = h.shape[0], cfg.head_dim
    dp = p["qkv_kernel"].shape[-1] // (3 * cfg.num_heads)
    qkv = _vit_dense(h, p, "qkv_kernel")  # [S, 3*H*dp]
    if fused_fn is not None:
        # fused rotary+attention kernel consumes the raw qkv slab — no
        # split / rotary / transpose HBM passes (kernels.fused_vit_attn)
        attn = fused_fn(qkv)
        x = x + attn @ p["proj_kernel"] + p["proj_bias"]
        h = rms_norm(x, p["norm2_scale"], cfg.rms_norm_eps)
        gate = h @ p["gate_kernel"] + p["gate_bias"]
        up = h @ p["up_kernel"] + p["up_bias"]
        return x + (jax.nn.silu(gate) * up) @ p["down_kernel"] + p["down_bias"]
    q, k, v = jnp.split(qkv.reshape(s, 3, cfg.num_heads, dp), 3, axis=1)
    q, k, v = q[:, 0], k[:, 0], v[:, 0]  # [S, H, dp]
    if dp == d:
        q, k = apply_rotary(q, k, cos, sin)
    else:
        q, k = apply_rotary_padded(q, k, cos, sin, d)
    if attn_fn is not None:
        attn = attn_fn(q, k, v)
    else:
        from visionselector_tpu.kernels.attention import VIT_BLOCK

        attn = attention(
            q[None], k[None], v[None], seg_ids[None], seg_ids[None],
            causal=False, scale=d**-0.5,
            kv_bounds=kv_bounds, block_q=VIT_BLOCK, block_k=VIT_BLOCK,
        )[0]
    x = x + _vit_dense(attn.reshape(s, -1), p, "proj_kernel")

    h = rms_norm(x, p["norm2_scale"], cfg.rms_norm_eps)
    gate = _vit_dense(h, p, "gate_kernel")
    up = _vit_dense(h, p, "up_kernel")
    x = x + _vit_dense(jax.nn.silu(gate) * up, p, "down_kernel")
    return x


def vit_forward(
    params: dict,
    pixel_values: jax.Array,
    rot_pos_ids: jax.Array,
    window_seg_ids: jax.Array,
    full_seg_ids: jax.Array,
    reverse_index: jax.Array,
    cfg: VisionConfig,
    window_kv_bounds: jax.Array | None = None,
    full_kv_bounds: jax.Array | None = None,
    window_diag: bool = False,
    window_kv_iters: int = 0,
    full_kv_iters: int = 0,
) -> jax.Array:
    """Vision tower forward.

    Args:
        pixel_values: [S, patch_dim] window-ordered, bucket-padded patches.
        rot_pos_ids: [S, 2] (h, w) ids in window order.
        window_seg_ids / full_seg_ids: [S] int32, 0 = padding.
        reverse_index: [L] permutation restoring original merged order.
        window_kv_bounds / full_kv_bounds: optional [num_q_blocks, 2] kv-block
            ranges (Pallas block skipping — O(S*window) window attention).
        window_diag: static; True when the batch uses the window-aligned
            layout (``VisionBatch.window_diag``) — window layers then run the
            all-heads block-diagonal kernel (no per-head grid dispatch).
    Returns:
        merged hidden states [L, out_hidden] in ORIGINAL (unpermuted) order.
    """
    x = vit_embed(params, pixel_values)  # [S, hidden]
    cos, sin = vision_rotary_cos_sin(rot_pos_ids, cfg.head_dim)
    use_full = jnp.asarray(
        [i in cfg.fullatt_block_indexes for i in range(cfg.depth)]
    )
    layer = _make_scan_layer(
        cfg, cos, sin, window_seg_ids, full_seg_ids,
        window_kv_bounds, full_kv_bounds, window_diag,
        window_kv_iters, full_kv_iters, pixel_values.shape[0],
    )
    x, _ = jax.lax.scan(layer, x, (params["blocks"], use_full))
    return vit_merge(params, x, reverse_index, cfg)


def vit_embed(params: dict, pixel_values: jax.Array) -> jax.Array:
    """Patch embedding: [S, patch_dim] -> [S, hidden]."""
    dtype = params["patch_embed_kernel"].dtype
    return pixel_values.astype(dtype) @ params["patch_embed_kernel"]


def vit_merge(params: dict, x: jax.Array, reverse_index: jax.Array,
              cfg: VisionConfig) -> jax.Array:
    """PatchMerger: RMSNorm -> group merge_unit -> 2-layer GELU MLP, then
    the permutation restoring original merged order."""
    m = cfg.spatial_merge_unit
    h = rms_norm(x, params["merger_ln_scale"], cfg.rms_norm_eps)
    h = h.reshape(x.shape[0] // m, m * cfg.hidden_size)
    h = h @ params["merger_fc1_kernel"] + params["merger_fc1_bias"]
    h = jax.nn.gelu(h, approximate=False)
    h = h @ params["merger_fc2_kernel"] + params["merger_fc2_bias"]
    return h[reverse_index]


def vit_forward_segment(
    params: dict,
    x: jax.Array,
    rot_pos_ids: jax.Array,
    window_seg_ids: jax.Array,
    full_seg_ids: jax.Array,
    cfg: VisionConfig,
    lo: int,
    hi: int,
    window_kv_bounds: jax.Array | None = None,
    full_kv_bounds: jax.Array | None = None,
    window_diag: bool = False,
    window_kv_iters: int = 0,
    full_kv_iters: int = 0,
) -> jax.Array:
    """Tower layers [lo, hi) on pre-embedded hidden states [S, hidden].

    Splitting one scan over 32 stacked layers into consecutive segment
    scans is mathematically identical; chunked admission prefills use this
    to interleave vision work with serving decode chunks (the full-image
    ViT is the largest un-chunkable dispatch otherwise)."""
    cos, sin = vision_rotary_cos_sin(rot_pos_ids, cfg.head_dim)
    use_full = jnp.asarray(
        [i in cfg.fullatt_block_indexes for i in range(cfg.depth)]
    )[lo:hi]
    blocks = jax.tree.map(lambda a: a[lo:hi], params["blocks"])
    layer = _make_scan_layer(
        cfg, cos, sin, window_seg_ids, full_seg_ids,
        window_kv_bounds, full_kv_bounds, window_diag,
        window_kv_iters, full_kv_iters, x.shape[0],
    )
    x, _ = jax.lax.scan(layer, x, (blocks, use_full))
    return x


def _make_scan_layer(
    cfg: VisionConfig,
    cos, sin,
    window_seg_ids, full_seg_ids,
    window_kv_bounds, full_kv_bounds,
    window_diag: bool,
    window_kv_iters: int,
    full_kv_iters: int,
    s_pad: int,
):
    """Build the per-layer scan body shared by ``vit_forward`` and
    ``vit_forward_segment``: picks the attention configuration (fused
    kernel / bounds-skipping Pallas / plain) from env + batch flags;
    window vs full dispatches per layer via ``lax.cond`` on the scanned
    flag."""
    have_bounds = window_kv_bounds is not None and full_kv_bounds is not None
    d = cfg.head_dim

    import os

    if have_bounds and os.environ.get("VST_FUSED_ATTN") == "1":
        # Fused rotary+multihead kernel (opt-in): qkv slab in, attention out.
        from visionselector_tpu.kernels.fused_vit_attn import (
            fused_vit_attention,
        )

        fused_block = min(256, s_pad)

        def _rescale(bounds):
            """Convert [lo, hi) kv-block bounds built at one block size to the
            fused kernel's block size (finer -> repeat+scale; coarser ->
            group-min/max; mismatched -> conservative full range)."""
            built = s_pad // bounds.shape[0]
            if built == fused_block:
                return bounds
            if built > fused_block and built % fused_block == 0:
                factor = built // fused_block
                return jnp.repeat(bounds * factor, factor, axis=0)
            if built < fused_block and fused_block % built == 0 \
                    and bounds.shape[0] % (fused_block // built) == 0:
                g = fused_block // built
                b = bounds.reshape(-1, g, 2)
                lo = (b[:, :, 0] * built) // fused_block
                hi = -(-(b[:, :, 1] * built) // fused_block)
                has = b[:, :, 1] > b[:, :, 0]
                lo_new = jnp.where(has, lo, 1 << 30).min(axis=1)
                hi_new = jnp.where(has, hi, 0).max(axis=1)
                any_has = has.any(axis=1)
                return jnp.stack(
                    [jnp.where(any_has, lo_new, 0),
                     jnp.where(any_has, hi_new, 0)], axis=1
                )
            # incompatible granularities: full range (correct, no skipping)
            nq = s_pad // fused_block
            return jnp.stack(
                [jnp.zeros(nq, jnp.int32),
                 jnp.full(nq, s_pad // fused_block, jnp.int32)], axis=1
            )

        wb = _rescale(window_kv_bounds)
        fb = _rescale(full_kv_bounds)
        interpret = jax.devices()[0].platform not in ("tpu", "axon")

        def layer(x, scanned):
            p, full = scanned

            def fused_fn(qkv):
                def window_branch(qkv):
                    return fused_vit_attention(
                        qkv, window_seg_ids, cos, sin, wb, cfg.num_heads, d,
                        block_q=fused_block, block_k=fused_block,
                        interpret=interpret,
                    )

                def full_branch(qkv):
                    return fused_vit_attention(
                        qkv, full_seg_ids, cos, sin, fb, cfg.num_heads, d,
                        block_q=fused_block, block_k=fused_block,
                        interpret=interpret,
                    )

                return jax.lax.cond(full, full_branch, window_branch, qkv)

            return _block(x, p, None, cos, sin, cfg, fused_fn=fused_fn), None

        return layer

    if have_bounds:
        # Window and full layers get their own attention configurations:
        # small blocks + kv-block skipping for the ~64-patch window segments,
        # large blocks for the per-image full-attention layers. lax.cond
        # runs exactly one branch per layer at runtime. Block sizes are
        # derived from the bounds arrays' (static) shapes so the kernel can
        # never read bounds at the wrong granularity, whatever combination of
        # layout/env the batch was built under.
        from visionselector_tpu.kernels.attention import (
            WINDOW_IMPL,
            attention_diag,
            default_impl,
            window_attention_slots,
        )

        impl = default_impl()
        use_diag = window_diag and impl in ("pallas", "pallas_interpret")
        # Window-batched XLA path (VST_WINDOW_IMPL=slots): needs only the
        # aligned layout, not Pallas.
        use_slots = window_diag and WINDOW_IMPL == "slots"
        win = cfg.window_size // cfg.spatial_merge_size // cfg.patch_size
        slot = win * win * cfg.spatial_merge_unit
        wblock = s_pad // window_kv_bounds.shape[0]
        fblock = s_pad // full_kv_bounds.shape[0]

        def layer(x, scanned):
            p, full = scanned

            def attn_fn(q, k, v):
                def window_branch(ops):
                    q, k, v = ops
                    if use_slots:
                        return window_attention_slots(
                            q[None], k[None], v[None], window_seg_ids[None],
                            slot=slot, scale=d**-0.5,
                        )[0]
                    if use_diag:
                        return attention_diag(
                            q[None], k[None], v[None], window_seg_ids[None],
                            scale=d**-0.5, block_q=wblock,
                            interpret=(impl == "pallas_interpret"),
                        )[0]
                    return attention(
                        q[None], k[None], v[None], window_seg_ids[None],
                        window_seg_ids[None], causal=False, scale=d**-0.5,
                        kv_bounds=window_kv_bounds,
                        block_q=wblock, block_k=wblock,
                        kv_iters=window_kv_iters or None,
                    )[0]

                def full_branch(ops):
                    q, k, v = ops
                    return attention(
                        q[None], k[None], v[None], full_seg_ids[None],
                        full_seg_ids[None], causal=False, scale=d**-0.5,
                        kv_bounds=full_kv_bounds,
                        block_q=fblock, block_k=fblock,
                        kv_iters=full_kv_iters or None,
                    )[0]

                return jax.lax.cond(full, full_branch, window_branch, (q, k, v))

            return _block(x, p, None, cos, sin, cfg, attn_fn=attn_fn), None
    else:
        def layer(x, scanned):
            p, full = scanned
            seg = jnp.where(full, full_seg_ids, window_seg_ids)
            return _block(x, p, seg, cos, sin, cfg), None

    return layer


def vit_forward_sp(
    params: dict,
    pixel_values: jax.Array,
    rot_pos_ids: jax.Array,
    window_seg_ids: jax.Array,
    full_seg_ids: jax.Array,
    reverse_index: jax.Array,
    cfg: VisionConfig,
    mesh,
    axis: str = "model",
) -> jax.Array:
    """Sequence-parallel vision tower: the patch axis sharded over ``axis``.

    For images/videos whose activations exceed one chip's HBM (SURVEY §5.7's
    sequence-parallel slot). The window-ALIGNED layout makes this natural on
    TPU: every window lives in a 64-patch slot, so as long as each shard is a
    whole number of slots, **28 of 32 layers (window attention) run with ZERO
    communication** — attention, norms and MLPs are all token-local. Only the
    4 full-attention layers all-gather k/v (+ their segment ids) over ICI;
    weights are replicated (they are small next to activations at these
    sequence lengths). The merger is token-local too; the final un-permute
    gathers across shards under jit.

    Requires: ``build_vision_batch(align_windows=True)`` arrays, and
    S_pad % (n_shards * 64-slot) == 0 (asserted).
    """
    try:
        from jax.experimental.shard_map import shard_map
        smap_kwargs = {"check_rep": False}
    except ImportError:  # newer jax: moved + check_rep removed
        from jax import shard_map
        smap_kwargs = {}
    from jax.sharding import PartitionSpec as P

    n_shards = mesh.shape[axis]
    s_pad = pixel_values.shape[0]
    win = cfg.window_size // cfg.spatial_merge_size // cfg.patch_size
    slot = win * win * cfg.spatial_merge_unit
    assert s_pad % (n_shards * slot) == 0, (s_pad, n_shards, slot)
    use_full = [i in cfg.fullatt_block_indexes for i in range(cfg.depth)]
    d = cfg.head_dim

    def local_tower(params, pixels, rot_ids, wseg, fseg):
        dtype = params["patch_embed_kernel"].dtype
        x = pixels.astype(dtype) @ params["patch_embed_kernel"]
        cos, sin = vision_rotary_cos_sin(rot_ids, d)

        local_s = pixels.shape[0]
        bq = slot
        while bq * 2 <= min(512, local_s) and local_s % (bq * 2) == 0:
            bq *= 2

        def window_attn(q, k, v):
            # windows are shard-local: block-diagonal diag kernel on TPU
            # (shards are whole slots), masked reference elsewhere
            from visionselector_tpu.kernels.attention import (
                attention_diag,
                default_impl,
            )

            impl = default_impl()
            if impl in ("pallas", "pallas_interpret"):
                return attention_diag(
                    q[None], k[None], v[None], wseg[None], scale=d**-0.5,
                    block_q=bq, interpret=(impl == "pallas_interpret"),
                )[0]
            return attention(
                q[None], k[None], v[None], wseg[None], wseg[None],
                causal=False, scale=d**-0.5,
            )[0]

        def full_attn(q, k, v):
            kg = jax.lax.all_gather(k, axis, axis=0, tiled=True)
            vg = jax.lax.all_gather(v, axis, axis=0, tiled=True)
            sg = jax.lax.all_gather(fseg, axis, axis=0, tiled=True)
            return attention(
                q[None], kg[None], vg[None], fseg[None], sg[None],
                causal=False, scale=d**-0.5,
            )[0]

        blocks = params["blocks"]
        for i in range(cfg.depth):
            p = jax.tree.map(lambda a: a[i], blocks)
            x = _block(
                x, p, None, cos, sin, cfg,
                attn_fn=full_attn if use_full[i] else window_attn,
            )

        m = cfg.spatial_merge_unit
        h = rms_norm(x, params["merger_ln_scale"], cfg.rms_norm_eps)
        h = h.reshape(x.shape[0] // m, m * cfg.hidden_size)
        h = h @ params["merger_fc1_kernel"] + params["merger_fc1_bias"]
        h = jax.nn.gelu(h, approximate=False)
        h = h @ params["merger_fc2_kernel"] + params["merger_fc2_bias"]
        return h

    h = shard_map(
        local_tower,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        **smap_kwargs,
    )(params, pixel_values, rot_pos_ids, window_seg_ids, full_seg_ids)
    return h[reverse_index]


def vit_forward_stats(
    params: dict,
    pixel_values: jax.Array,
    rot_pos_ids: jax.Array,
    window_seg_ids: jax.Array,
    full_seg_ids: jax.Array,
    reverse_index: jax.Array,
    cfg: VisionConfig,
    window_kv_bounds: jax.Array | None = None,
    full_kv_bounds: jax.Array | None = None,
    window_diag: bool = False,
    window_kv_iters: int = 0,
    full_kv_iters: int = 0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """ViT forward that also exposes last-block attention statistics.

    Training-free compression baselines (VisionZip ``visionzip.py:155-245``,
    PruMerge+ ``prumerge.py:195-310``, HoloV ``holov.py:410-498``) consume the
    last block's attention map and key states. The reference captures them by
    patching the attention module; here they are computed explicitly at the
    last layer (eval-only path; the segment-masked softmax is materialized in
    fp32 per query block).

    Returns:
        (merged_hidden [L, out] in original order,
         attn_received [L] fp32 — mean attention mass received per merged
             token (mean over heads and valid queries, 4->1 pooled, unpermuted),
         pooled_keys [L, hidden] — last-block post-rotary keys, heads
             concatenated, 4->1 pooled, unpermuted).
    """
    dtype = params["patch_embed_kernel"].dtype
    x = pixel_values.astype(dtype) @ params["patch_embed_kernel"]
    cos, sin = vision_rotary_cos_sin(rot_pos_ids, cfg.head_dim)
    use_full = [i in cfg.fullatt_block_indexes for i in range(cfg.depth)]
    d = cfg.head_dim

    attn_fns = [None, None]  # [window, full] overrides when bounds supplied
    if window_kv_bounds is not None and full_kv_bounds is not None:
        from visionselector_tpu.kernels.attention import (
            attention_diag,
            default_impl,
        )

        impl = default_impl()
        use_diag = window_diag and impl in ("pallas", "pallas_interpret")
        s_pad = pixel_values.shape[0]
        wblock = s_pad // window_kv_bounds.shape[0]
        fblock = s_pad // full_kv_bounds.shape[0]

        def window_attn(q, k, v):
            if use_diag:
                return attention_diag(
                    q[None], k[None], v[None], window_seg_ids[None],
                    scale=d**-0.5, block_q=wblock,
                    interpret=(impl == "pallas_interpret"),
                )[0]
            return attention(
                q[None], k[None], v[None], window_seg_ids[None],
                window_seg_ids[None], causal=False, scale=d**-0.5,
                kv_bounds=window_kv_bounds, block_q=wblock, block_k=wblock,
                kv_iters=window_kv_iters or None,
            )[0]

        def full_attn(q, k, v):
            return attention(
                q[None], k[None], v[None], full_seg_ids[None],
                full_seg_ids[None], causal=False, scale=d**-0.5,
                kv_bounds=full_kv_bounds, block_q=fblock, block_k=fblock,
                kv_iters=full_kv_iters or None,
            )[0]

        attn_fns = [window_attn, full_attn]

    blocks = params["blocks"]
    for i in range(cfg.depth - 1):
        p = jax.tree.map(lambda a: a[i], blocks)
        seg = full_seg_ids if use_full[i] else window_seg_ids
        x = _block(x, p, seg, cos, sin, cfg,
                   attn_fn=attn_fns[1] if use_full[i] else attn_fns[0])

    # Last block: capture stats.
    i = cfg.depth - 1
    p = jax.tree.map(lambda a: a[i], blocks)
    seg = full_seg_ids if use_full[i] else window_seg_ids
    h = rms_norm(x, p["norm1_scale"], cfg.rms_norm_eps)
    s, d = h.shape[0], cfg.head_dim
    dp = p["qkv_kernel"].shape[-1] // (3 * cfg.num_heads)
    qkv = _vit_dense(h, p, "qkv_kernel")
    q, k, v = jnp.split(qkv.reshape(s, 3, cfg.num_heads, dp), 3, axis=1)
    q, k, v = q[:, 0], k[:, 0], v[:, 0]
    if dp == d:
        q, k = apply_rotary(q, k, cos, sin)
    else:  # padded heads (weights.pad_vit_head_dim)
        q, k = apply_rotary_padded(q, k, cos, sin, d)

    # Streamed masked softmax + per-key received mass (kv-block scan): the
    # explicit [H, S, S] fp32 map would be ~17 GB at the 16384 vision bucket.
    from visionselector_tpu.kernels.attention import attention_with_received

    attn_out, recv = attention_with_received(q, k, v, seg, scale=d**-0.5)
    attn_out = attn_out.astype(v.dtype)

    m = cfg.spatial_merge_unit
    recv_pooled = recv.reshape(-1, m).mean(axis=1)  # [L] window order
    keys_pooled = (
        k.reshape(s // m, m, cfg.num_heads * dp).astype(jnp.float32).mean(axis=1)
    )  # [L, H*dp] (zero pad channels don't affect norms/similarities)

    x = x + _vit_dense(attn_out.reshape(s, -1), p, "proj_kernel")
    h2 = rms_norm(x, p["norm2_scale"], cfg.rms_norm_eps)
    gate = _vit_dense(h2, p, "gate_kernel")
    up = _vit_dense(h2, p, "up_kernel")
    x = x + _vit_dense(jax.nn.silu(gate) * up, p, "down_kernel")

    # merger + unpermute (shared tail)
    hm = rms_norm(x, params["merger_ln_scale"], cfg.rms_norm_eps)
    hm = hm.reshape(x.shape[0] // m, m * cfg.hidden_size)
    hm = hm @ params["merger_fc1_kernel"] + params["merger_fc1_bias"]
    hm = jax.nn.gelu(hm, approximate=False)
    hm = hm @ params["merger_fc2_kernel"] + params["merger_fc2_bias"]

    return (
        hm[reverse_index],
        recv_pooled[reverse_index],
        keys_pooled[reverse_index],
    )


def init_vit_params(key: jax.Array, cfg: VisionConfig, dtype=jnp.float32) -> dict:
    """Random init with the right tree structure (tests / from-scratch)."""
    ks = jax.random.split(key, 8)
    d, i, o = cfg.hidden_size, cfg.intermediate_size, cfg.out_hidden_size
    m = cfg.spatial_merge_unit
    n = cfg.depth

    def nrm(k, shape, std=0.02):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    blocks = {
        "norm1_scale": jnp.ones((n, d), dtype),
        "norm2_scale": jnp.ones((n, d), dtype),
        "qkv_kernel": nrm(ks[0], (n, d, 3 * d)),
        "qkv_bias": jnp.zeros((n, 3 * d), dtype),
        "proj_kernel": nrm(ks[1], (n, d, d)),
        "proj_bias": jnp.zeros((n, d), dtype),
        "gate_kernel": nrm(ks[2], (n, d, i)),
        "gate_bias": jnp.zeros((n, i), dtype),
        "up_kernel": nrm(ks[3], (n, d, i)),
        "up_bias": jnp.zeros((n, i), dtype),
        "down_kernel": nrm(ks[4], (n, i, d)),
        "down_bias": jnp.zeros((n, d), dtype),
    }
    return {
        "patch_embed_kernel": nrm(ks[5], (cfg.patch_dim, d)),
        "blocks": blocks,
        "merger_ln_scale": jnp.ones((d,), dtype),
        "merger_fc1_kernel": nrm(ks[6], (m * d, m * d)),
        "merger_fc1_bias": jnp.zeros((m * d,), dtype),
        "merger_fc2_kernel": nrm(ks[7], (m * d, o)),
        "merger_fc2_bias": jnp.zeros((o,), dtype),
    }
