"""Qwen2.5 decoder (GQA + M-RoPE) as pure functions over a parameter pytree.

Functional re-design of the reference LM
(``qwen-evaluation/qwen25vl/modeling_qwen2_5_vl.py:632-1400``):

- M-RoPE (multimodal 3D rotary): cos/sin computed from 3-axis position ids and
  channel-sliced by ``mrope_section`` (``apply_multimodal_rotary_pos_emb``
  :648-690) — implemented as a static per-channel axis-selector einsum instead
  of a split/cat python loop,
- prefill = segment-masked causal flash attention over the (compressed,
  valid-prefix) sequence; decode = XLA dot-attention against a static KV cache,
- layers scanned over stacked params (one trace for all layers).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visionselector_tpu.core.config import TextConfig
from visionselector_tpu.kernels.attention import (
    attention,
    chunk_decode_attention,
    decode_attention,
)
from visionselector_tpu.models.qwen25vl.vit import rms_norm, rotate_half


class KVCache(NamedTuple):
    k: jax.Array  # [n_layers, B, T_max, H_kv, Dh]
    v: jax.Array  # [n_layers, B, T_max, H_kv, Dh]
    # Per-layer valid lengths [n_layers, B]. Uniform for the standard path;
    # LLM-side compression (FastV/DART) leaves early layers with the full
    # sequence and later layers with the compacted one.
    length: jax.Array


class QuantKVCache(NamedTuple):
    """int8- or int4-quantized KV cache (serving slot pools).

    Per-row, per-head absmax quantization: entry [l, b, t, h] stores
    ``round(x / s)`` in int8 (or packed S4) with its scale
    ``s = absmax/qmax`` kept separately — int8 halves, int4 quarters, both
    the pool's HBM footprint (2x/4x slot capacity at the same t_max) and
    the decode step's KV read traffic. Decode paths dequantize on read;
    opt-in via ``ContinuousBatcher(kv_quant="int8"|"int4")`` — the
    accuracy cost (rounding on K/V: ~0.4% logit drift int8, coarser at
    4 bits — measure with the drift tests before serving int4) is a
    serving tradeoff the caller chooses, never silently applied to eval
    paths."""

    k: jax.Array  # int8/int4 [n_layers, B, T_max, H_kv, Dh]
    v: jax.Array  # int8/int4 [n_layers, B, T_max, H_kv, Dh]
    k_scale: jax.Array  # f32 [n_layers, B, T_max, H_kv]
    v_scale: jax.Array  # f32 [n_layers, B, T_max, H_kv]
    length: jax.Array  # [n_layers, B]


def quantize_kv(x: jax.Array, dtype=jnp.int8) -> Tuple[jax.Array, jax.Array]:
    """[..., Dh] -> (int8/int4 values, f32 scales over the last dim).

    ``dtype=jnp.int4`` stores packed S4 (2 elems/byte — quarter the bf16
    pool, at a coarser 4-bit rounding per row; scales stay foldable into
    the attention logits/probs because they are constant over Dh)."""
    qmax = 7.0 if dtype == jnp.int4 else 127.0
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / qmax + 1e-12
    q = jnp.round(x.astype(jnp.float32) / s[..., None])
    return q.astype(dtype), s


def dequantize_kv(q: jax.Array, s: jax.Array, dtype) -> jax.Array:
    return (q.astype(jnp.float32) * s[..., None].astype(jnp.float32)).astype(
        dtype)


def mrope_axis_selector(cfg: TextConfig) -> jax.Array:
    """[3, Dh] one-hot: which of (t, h, w) feeds each rotary channel.

    Channel d of the merged cos/sin comes from axis ``i % 3`` where i indexes
    the doubled mrope_section chunks (reference :680-686). With
    ``cfg.mrope=False`` (Qwen3 / LLaVA-OV-1.5 text model) every channel reads
    axis 0 — plain 1D rope over identical position axes.
    """
    if not cfg.mrope:
        axis = jnp.zeros((cfg.head_dim,), jnp.int32)
    else:
        sec = list(cfg.mrope_section) * 2
        lst = []
        for i, m in enumerate(sec):
            lst += [i % 3] * m
        axis = jnp.asarray(lst)  # [Dh]
    return jax.nn.one_hot(axis, 3, axis=0, dtype=jnp.float32)  # [3, Dh]


def mrope_cos_sin(
    position_ids: jax.Array, cfg: TextConfig
) -> Tuple[jax.Array, jax.Array]:
    """position_ids [3, B, T] -> merged (cos, sin) [B, T, Dh] fp32."""
    dh = cfg.head_dim
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, dh, 2, dtype=jnp.float32) / dh)
    )  # [Dh/2]
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq  # [3, B, T, Dh/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [3, B, T, Dh]
    sel = mrope_axis_selector(cfg)  # [3, Dh]
    cos = jnp.einsum("abtd,ad->btd", jnp.cos(emb), sel)
    sin = jnp.einsum("abtd,ad->btd", jnp.sin(emb), sel)
    return cos, sin


def _apply_mrope(q, k, cos, sin):
    """q: [B, T, H, Dh]; cos/sin: [B, T, Dh]."""
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = qf * cos + rotate_half(qf) * sin
    k_out = kf * cos + rotate_half(kf) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def _dense(x, p, name):
    """Matmul against a possibly int8/int4-quantized kernel.

    int8 weight-only quantization (per-output-channel symmetric scales): the
    weight stays int8 in HBM — the cast fuses into the matmul read — and the
    fp scale is applied to the [.., out] result. Halves 7B LM weight HBM so a
    7B fits one 16 GB v5e (the reference's 1.73x headline is a 7B figure).

    int4 (packed 2/byte in HBM, XLA S4) supports the same per-output-channel
    scales, or group-wise scales along the contraction axis (scale shape
    [G, out] per layer, AWQ-class granularity) — grouped scales cannot be
    hoisted past the matmul, so the weight dequantizes on read (convert +
    broadcast multiply fuse into the dot's operand load).
    """
    w = p[name]
    if w.dtype in (jnp.int8, jnp.int4):
        s = p[name + "_scale"]
        if s.ndim == w.ndim:  # grouped: w [in, out], s [G, out]
            g = s.shape[-2]
            gs = w.shape[-2] // g
            wd = (w.astype(x.dtype).reshape(g, gs, w.shape[-1])
                  * s[:, None, :].astype(x.dtype)).reshape(w.shape)
            y = x @ wd
        else:
            y = (x @ w.astype(x.dtype)) * s.astype(x.dtype)
    else:
        y = x @ w
    a = p.get(name + "_lora_a")
    if a is not None:
        # LoRA adapter (peft parity: out += x @ A @ B * alpha/rank); the
        # scalar is baked into the adapter tree at init (train.lora).
        y = y + ((x @ a.astype(x.dtype)) @ p[name + "_lora_b"].astype(x.dtype)
                 ) * p[name + "_lora_scale"]
    return y


QUANT_KERNELS = ("q_kernel", "k_kernel", "v_kernel", "o_kernel",
                 "gate_kernel", "up_kernel", "down_kernel")


def apply_weight_quantization(params: dict, spec: str) -> dict:
    """Apply a ``--quantize`` spec to a full engine param tree.

    Specs: ``int8`` (per-output-channel), ``int4`` (per-channel, coarse),
    ``int4:g<N>`` (group-wise along the contraction axis, e.g.
    ``int4:g128``). Returns a new tree with ``params['lm']`` quantized;
    ViT/scorer/merger stay in the compute dtype."""
    if not spec or spec == "none":
        return params
    import re

    m = re.fullmatch(r"int(8|4)(?::g(\d+))?", spec)
    if m is None:
        raise ValueError(
            f"bad --quantize spec {spec!r}: expected int8, int4 or int4:g<N>")
    bits = int(m.group(1))
    group = int(m.group(2) or 0)
    if bits == 8 and group:
        raise ValueError("grouped scales are an int4 feature (int4:g<N>)")
    out = dict(params)
    out["lm"] = quantize_lm_params(params["lm"], bits=bits, group_size=group)
    return out


_INT4_FMT_CACHE: dict = {}


def to_int4(wq: jax.Array) -> jax.Array:
    """int8-valued weights -> packed S4 device array, layout-normalized.

    On the axon TPU backend an S4 array produced with XLA's default output
    layout triggers unbounded relayout recursion when later passed as a jit
    argument (device_put -> _array_shard_arg -> device_put ...). Producing
    the array with out_shardings pinned to the consumer-preferred Format —
    probed ONCE per shape from a tiny dot program — sidesteps the relayout;
    measured on v5e, the probed layout (tiling ((64,128),(8,1)), sub-byte 4)
    is identical across every consumer program shape tried, so one probe
    serves all engine programs."""
    shape = tuple(wq.shape)
    key = (shape, jax.devices()[0].platform)
    fmt = _INT4_FMT_CACHE.get(key)
    if fmt is None:
        xa = jax.ShapeDtypeStruct((1, shape[-2]), jnp.bfloat16)
        wa = jax.ShapeDtypeStruct(shape, jnp.int4)
        if len(shape) == 3:
            probe = lambda x, w: x @ w[0].astype(x.dtype)  # noqa: E731
        else:
            probe = lambda x, w: x @ w.astype(x.dtype)  # noqa: E731
        fmt = jax.jit(probe).lower(xa, wa).compile().input_formats[0][1]
        _INT4_FMT_CACHE[key] = fmt
    return jax.jit(lambda w: w.astype(jnp.int4), out_shardings=fmt)(wq)


def quantize_lm_params(lm_params: dict, bits: int = 8,
                       group_size: int = 0) -> dict:
    """Symmetric weight-only quantization of all decoder matmul kernels
    (embeddings / lm_head / norms stay in the original dtype).

    bits=8: per-output-channel scales (range ±127).
    bits=4: packed S4 storage (2 weights/byte in HBM, range ±7); with
    ``group_size`` > 0 the contraction axis gets one scale per
    ``group_size`` inputs (AWQ-class granularity — per-channel int4 is
    usually too coarse for real checkpoints), scale shape [n, G, out]."""
    assert bits in (8, 4), bits
    qmax = 127.0 if bits == 8 else 7.0
    layers = dict(lm_params["layers"])
    for name in QUANT_KERNELS:
        if name not in layers:  # MoE trees have expert kernels instead
            continue
        w = layers[name]  # [n_layers, in, out]
        wf = w.astype(jnp.float32)
        n, din, dout = w.shape
        if bits == 4 and group_size > 0:
            assert din % group_size == 0, (name, din, group_size)
            g = din // group_size
            wg = wf.reshape(n, g, group_size, dout)
            amax = jnp.max(jnp.abs(wg), axis=2)  # [n, g, out]
            scale = jnp.maximum(amax / qmax, 1e-12)
            wq = jnp.clip(jnp.round(wg / scale[:, :, None, :]), -qmax, qmax
                          ).reshape(n, din, dout).astype(jnp.int8)
        else:
            amax = jnp.max(jnp.abs(wf), axis=1)  # [n, out]
            scale = jnp.maximum(amax / qmax, 1e-12)
            wq = jnp.clip(jnp.round(wf / scale[:, None, :]), -qmax, qmax
                          ).astype(jnp.int8)
        layers[name] = to_int4(wq) if bits == 4 else wq
        layers[name + "_scale"] = scale
    out = dict(lm_params)
    out["layers"] = layers
    return out


def _qkv(x, p, cfg: TextConfig):
    b, t, _ = x.shape
    dh = cfg.head_dim
    q = _dense(x, p, "q_kernel")
    k = _dense(x, p, "k_kernel")
    v = _dense(x, p, "v_kernel")
    if cfg.attention_bias:
        q = q + p["q_bias"]
        k = k + p["k_bias"]
        v = v + p["v_bias"]
    q = q.reshape(b, t, cfg.num_attention_heads, dh)
    k = k.reshape(b, t, cfg.num_key_value_heads, dh)
    v = v.reshape(b, t, cfg.num_key_value_heads, dh)
    if cfg.qk_norm:
        # Qwen3-style per-head-dim RMSNorm on q/k (OV modeling :534-535)
        q = rms_norm(q, p["q_norm_scale"], cfg.rms_norm_eps)
        k = rms_norm(k, p["k_norm_scale"], cfg.rms_norm_eps)
    return q, k, v


def _repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """[B, T, H_kv, D] -> [B, T, H_kv*n_rep, D] (GQA head expansion)."""
    if n_rep == 1:
        return x
    b, t, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, t, h, n_rep, d)).reshape(
        b, t, h * n_rep, d
    )


def _moe_mlp(x, p, cfg: TextConfig):
    """Qwen3-MoE sparse MLP (LLaVA-OV-1.5 MoE variant,
    ``modeling_llavaonevision1_5_moe.py:658-707``): softmax router over all
    experts, top-k selection with renormalized weights (norm_topk_prob).

    TPU-native evaluation: a ``lax.scan`` over the stacked expert weights
    computes every expert densely and combines with the per-token routing
    weight (zero for unrouted experts). Static shapes, no ragged dispatch —
    right for batch-1 inference/small scale; production-scale serving would
    shard the expert axis over the mesh ('expert parallel') with the same
    math.
    """
    logits = x @ p["router_kernel"]  # [B, T, E]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    topv, topi = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    if cfg.norm_topk_prob:
        topv = topv / topv.sum(-1, keepdims=True)

    def expert(carry, packed):
        gate_k, up_k, down_k, e = packed
        w = (topv * (topi == e)).sum(-1).astype(x.dtype)  # [B, T]
        y = (jax.nn.silu(x @ gate_k) * (x @ up_k)) @ down_k
        return carry + y * w[..., None], None

    out, _ = jax.lax.scan(
        expert,
        jnp.zeros_like(x),
        (p["expert_gate_kernel"], p["expert_up_kernel"],
         p["expert_down_kernel"], jnp.arange(cfg.num_experts)),
    )
    return out


def moe_mlp_ep(x, p, cfg: TextConfig, mesh, axis: str = "model"):
    """Expert-parallel MoE forward: the EXPERT axis is sharded over the mesh
    axis — each device runs the dense expert scan only over its local
    experts and the partial outputs all-reduce with one ``psum``.

    This is the production-scale sharding the dense ``_moe_mlp`` docstring
    points at (SURVEY §2.9 notes the reference has no EP at all): expert
    weights never replicate, and because every device sees all tokens there
    is no ragged all_to_all dispatch — the collective is a single psum over
    ICI. Identical math to ``_moe_mlp`` (tested on the virtual mesh).

    x: [B, T, D] (replicated). ``p`` holds ONE layer's MoE params with the
    expert axis leading ([E, ...]); num_experts must divide the axis size.
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # jax < 0.8 layout
        from jax.experimental.shard_map import shard_map

    n_exp = cfg.num_experts
    n_dev = mesh.shape[axis]
    assert n_exp % n_dev == 0, (n_exp, n_dev)
    e_local = n_exp // n_dev

    logits = x @ p["router_kernel"]  # [B, T, E] (router replicated)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    topv, topi = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    if cfg.norm_topk_prob:
        topv = topv / topv.sum(-1, keepdims=True)

    def local(gate_k, up_k, down_k, x, topv, topi):
        e0 = jax.lax.axis_index(axis) * e_local

        def expert(carry, packed):
            gk, uk, dk, j = packed
            w = (topv * (topi == e0 + j)).sum(-1).astype(x.dtype)  # [B, T]
            y = (jax.nn.silu(x @ gk) * (x @ uk)) @ dk
            return carry + y * w[..., None], None

        # the loop output varies over the mesh axis (it uses axis_index);
        # the initial carry must carry the same varying-axes type
        init = jax.lax.pvary(jnp.zeros_like(x), axis)
        out, _ = jax.lax.scan(
            expert, init,
            (gate_k, up_k, down_k, jnp.arange(e_local)),
        )
        return jax.lax.psum(out, axis)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P()),
        out_specs=P(),
    )(p["expert_gate_kernel"], p["expert_up_kernel"],
      p["expert_down_kernel"], x, topv, topi)


def _mlp(x, p, cfg: TextConfig | None = None):
    if "router_kernel" in p:
        return _moe_mlp(x, p, cfg)
    h = jax.nn.silu(_dense(x, p, "gate_kernel")) * _dense(x, p, "up_kernel")
    return _dense(h, p, "down_kernel")


def lm_prefill_layers(
    layers: dict,
    inputs_embeds: jax.Array,
    position_ids: jax.Array,
    seg_ids: jax.Array,
    cfg: TextConfig,
    remat: bool = False,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Run a stack of decoder layers (no final norm) over a full sequence.

    ``layers`` is any stacked-layer pytree slice — the whole model, or a
    contiguous range for two-stage (LLM-side compression) prefill.
    Returns (hidden [B, T, D], (k, v) each [n_layers, B, T, H_kv, Dh]).

    ``remat=True`` wraps the scanned layer in ``jax.checkpoint``: the
    backward pass recomputes each layer's activations instead of keeping
    them all live — the TPU-native equivalent of the reference's
    ``--gradient_checkpointing True`` (HF ``gradient_checkpointing_enable``),
    trading ~one extra forward of FLOPs for O(1)-layer activation memory.
    Exact (same values and gradients), so it is a pure memory knob.
    """
    cos, sin = mrope_cos_sin(position_ids, cfg)
    n_rep = cfg.num_attention_heads // cfg.num_key_value_heads

    def layer(x, p):
        h = rms_norm(x, p["input_ln_scale"], cfg.rms_norm_eps)
        q, k, v = _qkv(h, p, cfg)
        q, k = _apply_mrope(q, k, cos, sin)
        attn = attention(
            q,
            _repeat_kv(k, n_rep),
            _repeat_kv(v, n_rep),
            seg_ids,
            seg_ids,
            causal=True,
        )
        b, t = x.shape[:2]
        x = x + _dense(attn.reshape(b, t, -1), p, "o_kernel")
        h = rms_norm(x, p["post_ln_scale"], cfg.rms_norm_eps)
        x = x + _mlp(h, p, cfg)
        return x, (k, v)

    if remat:
        layer = jax.checkpoint(layer)
    return jax.lax.scan(layer, inputs_embeds, layers)


def lm_prefill(
    params: dict,
    inputs_embeds: jax.Array,
    position_ids: jax.Array,
    seg_ids: jax.Array,
    cfg: TextConfig,
    remat: bool = False,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Full-sequence forward (training and prefill).

    Args:
        inputs_embeds: [B, T, D] (valid-prefix layout; padding rows masked via
            seg_ids == 0).
        position_ids: [3, B, T] M-RoPE ids.
        seg_ids: [B, T] int32; 0 = padding. Distinct ids give packed-sample
            block-diagonal attention (training data packing).
    Returns:
        (final hidden [B, T, D] post-norm, (k_layers, v_layers) each
         [n_layers, B, T, H_kv, Dh] rotated keys for the KV cache).
    """
    x, kv = lm_prefill_layers(
        params["layers"], inputs_embeds, position_ids, seg_ids, cfg,
        remat=remat,
    )
    x = rms_norm(x, params["final_ln_scale"], cfg.rms_norm_eps)
    return x, kv


def layer_qk(
    layers: dict,
    layer_idx: int,
    hidden: jax.Array,
    position_ids: jax.Array,
    cfg: TextConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Post-rotary (q, k) of one layer given its INPUT hidden states.

    Used by LLM-side compression to recompute attention statistics at the
    capture layer (the reference recomputes eagerly in fp32 too,
    ``fastv.py:84-93``). k is GQA-expanded to match q's head count.
    Returns q, k: [B, T, H, Dh].
    """
    p = jax.tree.map(lambda a: a[layer_idx], layers)
    cos, sin = mrope_cos_sin(position_ids, cfg)
    h = rms_norm(hidden, p["input_ln_scale"], cfg.rms_norm_eps)
    q, k, v = _qkv(h, p, cfg)
    q, k = _apply_mrope(q, k, cos, sin)
    n_rep = cfg.num_attention_heads // cfg.num_key_value_heads
    return q, _repeat_kv(k, n_rep)


def _pool_row_write(pool, li, pos, val):
    """Append new KV rows into the stacked [L, B, T, *tail] pool with one
    ``dynamic_update_slice`` per batch row instead of a vector-index scatter.

    XLA performs the DUS in place on the scan-carried pool; the equivalent
    scatter (``pool.at[li, rows, pos].set``) materializes a full pool copy
    every layer — measured on v5e at 8K-slot pools (B=8, 3B): scatter 2.17x
    the read-only KV roofline per step vs 1.30x with per-row DUS
    (``tools/bench_decode_attrib.py``; IMPLEMENTATION_NOTES r5 decode-step
    attribution). The unrolled B-loop costs B extra ops per layer, dwarfed
    by the avoided copy.

    Caller contract: ``pos[i] + val.shape[1] <= T`` for every row whose
    cache content still matters. DUS clamps out-of-range starts (it shifts
    the window back) instead of dropping them like scatter — decode loops
    already guarantee capacity (slot installs reserve ``max_new + headroom``
    and batch loops allocate ``t_ctx + steps``), so the clamp never engages
    on a live row.

    pool: [L, B, T, *tail]; li: scalar layer index; pos: [B] per-row write
    offsets; val: [B, t_c, *tail].
    """
    b, t_c = val.shape[0], val.shape[1]
    tail = val.shape[2:]
    zeros = (0,) * len(tail)
    for i in range(b):
        upd = val[i].reshape((1, 1, t_c) + tail)
        pool = jax.lax.dynamic_update_slice(
            pool, upd, (li, i, pos[i]) + zeros)
    return pool


def _windowed_views(k_cache, v_cache, k_scale, v_scale, w):
    """Static live-prefix views of the slot pool for attention READS.

    ``w`` is the auto-window bucket (None = full pool): XLA fuses the
    static ``[:, :w]`` slice into the attention einsum so per-step KV
    traffic shrinks to the bucket; kv WRITES still land in the full pool.
    Shared by lm_decode_step and lm_decode_chunk — the single place the
    windowing contract is applied."""
    if w is None:
        return k_cache, v_cache, k_scale, v_scale
    return (k_cache[:, :w], v_cache[:, :w],
            None if k_scale is None else k_scale[:, :w],
            None if v_scale is None else v_scale[:, :w])


def lm_decode_step(
    params: dict,
    cache: KVCache,
    inputs_embeds: jax.Array,
    position_ids: jax.Array,
    cfg: TextConfig,
    attn_impl: str | None = None,
    attn_window: int | None = None,
) -> Tuple[jax.Array, KVCache]:
    """One decode step.

    Args:
        inputs_embeds: [B, 1, D] token embedding.
        position_ids: [3, B, 1].
        attn_impl: decode-attention impl ("xla" dense / "blocked"
            length-aware Pallas; None = VST_DECODE_ATTN env, default xla).
        attn_window: STATIC bound on live cache length — attention reads
            only ``cache[:, :attn_window]`` (kv writes still land in the
            full pool). XLA fuses the static slice into the attention
            einsum, so per-step KV traffic shrinks from T_max to the
            window with zero kernel overhead. Caller contract: every LIVE
            row's post-write length <= attn_window (rows beyond it produce
            garbage attention, acceptable only for dead slots whose
            outputs are discarded).
    Returns: (hidden [B, 1, D] post-norm, updated cache).

    KV-pool traffic note: the stacked [L, B, T, H, D] pools ride the layer
    scan as CARRIES with one-row scatter writes and a dynamic-slice read
    per layer — NOT as scan xs/ys. Threading them through xs/ys made XLA
    materialize the per-layer slice and write the whole pool back every
    step: measured 3.6x the read-only KV roofline slope (4.75 ms/pool-GB
    vs 1.31 ideal, `tools/bench_decode_attrib.py`, v5e 3B int8 B=8).
    """
    cos, sin = mrope_cos_sin(position_ids, cfg)
    n_rep = cfg.num_attention_heads // cfg.num_key_value_heads
    b = inputs_embeds.shape[0]
    quant = isinstance(cache, QuantKVCache)

    def layer(carry, scanned):
        if quant:
            x, k_all, v_all, ks_all, vs_all = carry
            p, pos, li = scanned  # pos: [B] layer's length, li: layer idx
        else:
            x, k_all, v_all = carry
            p, pos, li = scanned
        h = rms_norm(x, p["input_ln_scale"], cfg.rms_norm_eps)
        q, k, v = _qkv(h, p, cfg)
        q, k = _apply_mrope(q, k, cos, sin)
        # Write the new row at (layer, batch row, length) — per-row DUS,
        # in place on the carried pool (see _pool_row_write's traffic note).
        if quant:
            k8, ks_new = quantize_kv(k, k_all.dtype)
            v8, vs_new = quantize_kv(v, v_all.dtype)
            k_all = _pool_row_write(k_all, li, pos, k8)
            v_all = _pool_row_write(v_all, li, pos, v8)
            ks_all = _pool_row_write(ks_all, li, pos, ks_new)
            vs_all = _pool_row_write(vs_all, li, pos, vs_new)
            # int8 straight into the attention dots; scales fold into the
            # grouped logits/probs (materializing a dequantized bf16 copy
            # triples the step's KV traffic — measured 0.78x).
            k_cache = jax.lax.dynamic_index_in_dim(k_all, li, 0, False)
            v_cache = jax.lax.dynamic_index_in_dim(v_all, li, 0, False)
            kq_scale = jax.lax.dynamic_index_in_dim(ks_all, li, 0, False)
            vq_scale = jax.lax.dynamic_index_in_dim(vs_all, li, 0, False)
        else:
            kq_scale = vq_scale = None
            k_all = _pool_row_write(k_all, li, pos, k)
            v_all = _pool_row_write(v_all, li, pos, v)
            k_cache = jax.lax.dynamic_index_in_dim(k_all, li, 0, False)
            v_cache = jax.lax.dynamic_index_in_dim(v_all, li, 0, False)
        # Unexpanded [B, T, H_kv, D] caches: grouped-query attention streams
        # the pool once (no n_rep-x _repeat_kv materialization).
        kc, vc, ks_r, vs_r = _windowed_views(
            k_cache, v_cache, kq_scale, vq_scale, attn_window)
        attn = decode_attention(
            q, kc, vc, pos + 1, k_scale=ks_r, v_scale=vs_r, impl=attn_impl,
        )
        x = x + _dense(attn.reshape(b, 1, -1), p, "o_kernel")
        h = rms_norm(x, p["post_ln_scale"], cfg.rms_norm_eps)
        x = x + _mlp(h, p, cfg)
        if quant:
            return (x, k_all, v_all, ks_all, vs_all), None
        return (x, k_all, v_all), None

    lidx = jnp.arange(cfg.num_hidden_layers)
    if quant:
        (x, k_new, v_new, ks_new, vs_new), _ = jax.lax.scan(
            layer, (inputs_embeds, cache.k, cache.v, cache.k_scale,
                    cache.v_scale),
            (params["layers"], cache.length, lidx),
        )
        x = rms_norm(x, params["final_ln_scale"], cfg.rms_norm_eps)
        return x, QuantKVCache(k=k_new, v=v_new, k_scale=ks_new,
                               v_scale=vs_new, length=cache.length + 1)
    (x, k_new, v_new), _ = jax.lax.scan(
        layer, (inputs_embeds, cache.k, cache.v),
        (params["layers"], cache.length, lidx),
    )
    x = rms_norm(x, params["final_ln_scale"], cfg.rms_norm_eps)
    return x, KVCache(k=k_new, v=v_new, length=cache.length + 1)


def lm_decode_chunk(
    params: dict,
    cache: KVCache,
    inputs_embeds: jax.Array,
    position_ids: jax.Array,
    cfg: TextConfig,
    attn_impl: str | None = None,
    attn_window: int | None = None,
) -> Tuple[jax.Array, KVCache]:
    """Multi-token decode step (speculative-decoding verification).

    Processes T_c proposed tokens in ONE forward against the cache: each
    row's kv is appended at base_len + i and row i attends causally within
    the chunk plus the committed cache. Decode is weight-bandwidth-bound, so
    this costs roughly one single-token step — the accepted prefix comes for
    free (prompt-lookup speculative decoding).

    Args:
        inputs_embeds: [B, T_c, D].
        position_ids: [3, B, T_c].
    Returns: (hidden [B, T_c, D] post-final-norm, cache with length += T_c —
    callers roll length back by the rejected suffix).
    """
    cos, sin = mrope_cos_sin(position_ids, cfg)
    n_rep = cfg.num_attention_heads // cfg.num_key_value_heads
    b, t_c, _ = inputs_embeds.shape
    quant = isinstance(cache, QuantKVCache)

    def layer(carry, scanned):
        if quant:
            x, k_all, v_all, ks_all, vs_all = carry
            p, pos, li = scanned  # pos: [B] layer's length, li: layer idx
        else:
            x, k_all, v_all = carry
            p, pos, li = scanned
        h = rms_norm(x, p["input_ln_scale"], cfg.rms_norm_eps)
        q, k, v = _qkv(h, p, cfg)
        q, k = _apply_mrope(q, k, cos, sin)
        # Write the t_c new rows at (layer, batch row, pos..pos+t_c-1) —
        # per-row DUS, in place on the carried pool (see _pool_row_write).
        if quant:
            k8, ks_new = quantize_kv(k, k_all.dtype)
            v8, vs_new = quantize_kv(v, v_all.dtype)
            k_all = _pool_row_write(k_all, li, pos, k8)
            v_all = _pool_row_write(v_all, li, pos, v8)
            ks_all = _pool_row_write(ks_all, li, pos, ks_new)
            vs_all = _pool_row_write(vs_all, li, pos, vs_new)
            # Fold dequant scales into logits/probs (see lm_decode_step).
            k_cache = jax.lax.dynamic_index_in_dim(k_all, li, 0, False)
            v_cache = jax.lax.dynamic_index_in_dim(v_all, li, 0, False)
            kq_scale = jax.lax.dynamic_index_in_dim(ks_all, li, 0, False)
            vq_scale = jax.lax.dynamic_index_in_dim(vs_all, li, 0, False)
        else:
            kq_scale = vq_scale = None
            k_all = _pool_row_write(k_all, li, pos, k)
            v_all = _pool_row_write(v_all, li, pos, v)
            k_cache = jax.lax.dynamic_index_in_dim(k_all, li, 0, False)
            v_cache = jax.lax.dynamic_index_in_dim(v_all, li, 0, False)
        kc, vc, ks_r, vs_r = _windowed_views(
            k_cache, v_cache, kq_scale, vq_scale, attn_window)
        attn = chunk_decode_attention(
            q, kc, vc, pos, k_scale=ks_r, v_scale=vs_r, impl=attn_impl,
        )
        x = x + _dense(attn.reshape(b, t_c, -1), p, "o_kernel")
        h = rms_norm(x, p["post_ln_scale"], cfg.rms_norm_eps)
        x = x + _mlp(h, p, cfg)
        if quant:
            return (x, k_all, v_all, ks_all, vs_all), None
        return (x, k_all, v_all), None

    lidx = jnp.arange(cfg.num_hidden_layers)
    if quant:
        (x, k_new, v_new, ks_new, vs_new), _ = jax.lax.scan(
            layer, (inputs_embeds, cache.k, cache.v, cache.k_scale,
                    cache.v_scale),
            (params["layers"], cache.length, lidx),
        )
        x = rms_norm(x, params["final_ln_scale"], cfg.rms_norm_eps)
        return x, QuantKVCache(k=k_new, v=v_new, k_scale=ks_new,
                               v_scale=vs_new, length=cache.length + t_c)
    (x, k_new, v_new), _ = jax.lax.scan(
        layer, (inputs_embeds, cache.k, cache.v),
        (params["layers"], cache.length, lidx),
    )
    x = rms_norm(x, params["final_ln_scale"], cfg.rms_norm_eps)
    return x, KVCache(k=k_new, v=v_new, length=cache.length + t_c)


def embed_tokens(params: dict, input_ids: jax.Array) -> jax.Array:
    return params["embed_tokens"][input_ids]


def lm_head(params: dict, hidden: jax.Array, cfg: TextConfig) -> jax.Array:
    """[.., D] -> [.., V] logits (fp32)."""
    w = params["embed_tokens"] if cfg.tie_word_embeddings else params["lm_head_kernel"]
    if cfg.tie_word_embeddings:
        return jnp.einsum(
            "...d,vd->...v", hidden, w, preferred_element_type=jnp.float32
        )
    return jnp.einsum("...d,dv->...v", hidden, w, preferred_element_type=jnp.float32)


def init_lm_params(key: jax.Array, cfg: TextConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 10)
    d, i, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    dh, hq, hkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads
    n = cfg.num_hidden_layers

    def nrm(k, shape, std=0.02):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    layers = {
        "input_ln_scale": jnp.ones((n, d), dtype),
        "post_ln_scale": jnp.ones((n, d), dtype),
        "q_kernel": nrm(ks[0], (n, d, hq * dh)),
        "k_kernel": nrm(ks[1], (n, d, hkv * dh)),
        "v_kernel": nrm(ks[2], (n, d, hkv * dh)),
        "o_kernel": nrm(ks[3], (n, hq * dh, d)),
    }
    if cfg.num_experts > 0:
        e, mi = cfg.num_experts, cfg.moe_intermediate_size
        layers.update(
            router_kernel=nrm(ks[4], (n, d, e)),
            expert_gate_kernel=nrm(ks[5], (n, e, d, mi)),
            expert_up_kernel=nrm(ks[6], (n, e, d, mi)),
            expert_down_kernel=nrm(ks[9], (n, e, mi, d)),
        )
    else:
        layers.update(
            gate_kernel=nrm(ks[4], (n, d, i)),
            up_kernel=nrm(ks[5], (n, d, i)),
            down_kernel=nrm(ks[6], (n, i, d)),
        )
    if cfg.attention_bias:
        layers.update(
            q_bias=jnp.zeros((n, hq * dh), dtype),
            k_bias=jnp.zeros((n, hkv * dh), dtype),
            v_bias=jnp.zeros((n, hkv * dh), dtype),
        )
    if cfg.qk_norm:
        layers.update(
            q_norm_scale=jnp.ones((n, dh), dtype),
            k_norm_scale=jnp.ones((n, dh), dtype),
        )
    params = {
        "embed_tokens": nrm(ks[7], (v, d)),
        "layers": layers,
        "final_ln_scale": jnp.ones((d,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head_kernel"] = nrm(ks[8], (d, v))
    return params


def init_lm_params_int8(key: jax.Array, cfg: TextConfig,
                        dtype=jnp.bfloat16, bits: int = 8) -> dict:
    """Random-init the LM directly with int8 (or packed int4) matmul kernels.

    For benchmark/memory purposes at 7B scale: initializing bf16 then
    quantizing would transiently hold ~13 GB of bf16 kernels — more than one
    v5e's HBM. Kernels are uniform ints with a per-channel scale chosen so the
    dequantized std matches the usual 0.02 init.
    """
    d, i = cfg.hidden_size, cfg.intermediate_size
    dh, hq, hkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads
    n = cfg.num_hidden_layers
    shapes = {
        "q_kernel": (n, d, hq * dh),
        "k_kernel": (n, d, hkv * dh),
        "v_kernel": (n, d, hkv * dh),
        "o_kernel": (n, hq * dh, d),
        "gate_kernel": (n, d, i),
        "up_kernel": (n, d, i),
        "down_kernel": (n, i, d),
    }
    ks = jax.random.split(key, len(shapes) + 2)
    layers = {
        "input_ln_scale": jnp.ones((n, d), dtype),
        "post_ln_scale": jnp.ones((n, d), dtype),
    }
    # uniform int in [-qmax, qmax] has std sqrt(((2*qmax+1)^2 - 1)/12);
    # scale to weight std 0.02
    assert bits in (8, 4), bits
    qmax = 127 if bits == 8 else 7
    scale_val = 0.02 / float(np.sqrt(((2 * qmax + 1) ** 2 - 1) / 12.0))
    for idx, (name, shape) in enumerate(shapes.items()):
        wq = jax.random.randint(ks[idx], shape, -qmax, qmax + 1, jnp.int8)
        layers[name] = to_int4(wq) if bits == 4 else wq
        layers[name + "_scale"] = jnp.full(
            (shape[0], shape[2]), scale_val, jnp.float32
        )
    if cfg.attention_bias:
        layers.update(
            q_bias=jnp.zeros((n, hq * dh), dtype),
            k_bias=jnp.zeros((n, hkv * dh), dtype),
            v_bias=jnp.zeros((n, hkv * dh), dtype),
        )
    if cfg.qk_norm:
        layers.update(
            q_norm_scale=jnp.ones((n, dh), dtype),
            k_norm_scale=jnp.ones((n, dh), dtype),
        )
    v = cfg.vocab_size
    params = {
        "layers": layers,
        "embed_tokens": (
            jax.random.normal(ks[-2], (v, d)) * 0.02
        ).astype(dtype),
        "final_ln_scale": jnp.ones((d,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head_kernel"] = (
            jax.random.normal(ks[-1], (d, v)) * 0.02
        ).astype(dtype)
    return params


def init_kv_cache(
    cfg: TextConfig, batch: int, max_len: int, dtype=jnp.float32
) -> KVCache:
    shape = (
        cfg.num_hidden_layers,
        batch,
        max_len,
        cfg.num_key_value_heads,
        cfg.head_dim,
    )
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        length=jnp.zeros((cfg.num_hidden_layers, batch), jnp.int32),
    )
