"""Qwen2.5-VL end-to-end model: vision encode -> (select) -> prefill -> decode.

Inference pipeline semantics follow the reference selector model
(``qwen-evaluation/token_compression/selector_model.py:96-387``) re-architected
for XLA: the host computes all data-dependent index arrays (positions of image
tokens, original M-RoPE ids, bucket choices) and two jitted device programs do
the work:

  _prefill: ViT -> scorer -> hard top-k -> sequence compaction -> causal
            prefill over the valid-prefix compressed sequence -> first token.
  _decode:  single-token step against the KV cache.

Shapes are bucketed so distinct compilations stay O(#buckets), not O(#images).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visionselector_tpu.core.config import VLConfig
from visionselector_tpu.models.qwen25vl import lm as lm_mod
from visionselector_tpu.models.qwen25vl import vit as vit_mod
from visionselector_tpu.preprocess.indices import build_vision_batch, pick_bucket
from visionselector_tpu.preprocess.rope import get_rope_index
from visionselector_tpu.selector.select import (
    Selection,
    compact_sequence,
    select_hard,
)

# 6144 fills the 4096->8192 gap: ChartQA/DocVQA-scale images land at
# 4100-6100 aligned patches and would otherwise pay the 8192 program.
VISION_BUCKETS = (512, 1024, 2048, 4096, 6144, 8192, 16384)
TEXT_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096)


def init_params(key: jax.Array, cfg: VLConfig, with_selector: bool = True) -> dict:
    """Random-init full parameter tree (tests / from-scratch training)."""
    k1, k2, k3 = jax.random.split(key, 3)
    dtype = cfg.jax_dtype
    params = {
        "visual": vit_mod.init_vit_params(k1, cfg.vision, dtype),
        "lm": lm_mod.init_lm_params(k2, cfg.text, dtype),
    }
    if with_selector:
        from visionselector_tpu.selector.scorer import init_scorer_params

        sel_cfg = (cfg.selector or cfg.with_selector().selector)
        params["scorer"] = init_scorer_params(k3, sel_cfg, jnp.float32)
    return params


# ---------------------------------------------------------------------------
# Jitted device programs
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "window_diag", "window_kv_iters", "full_kv_iters"),
)
def encode_vision(params, cfg: VLConfig, pixel_values, rot_pos_ids,
                  window_seg_ids, full_seg_ids, reverse_index,
                  window_kv_bounds=None, full_kv_bounds=None,
                  window_diag: bool = False, window_kv_iters: int = 0,
                  full_kv_iters: int = 0):
    """ViT forward -> merged tokens [L_pad, out_hidden] in original order."""
    return vit_mod.vit_forward(
        params["visual"], pixel_values, rot_pos_ids, window_seg_ids,
        full_seg_ids, reverse_index, cfg.vision,
        window_kv_bounds=window_kv_bounds, full_kv_bounds=full_kv_bounds,
        window_diag=window_diag,
        window_kv_iters=window_kv_iters, full_kv_iters=full_kv_iters,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "k_max", "use_selector", "window_diag",
                     "window_kv_iters", "full_kv_iters"),
)
def _prefill(
    params: dict,
    cfg: VLConfig,
    k_max: int,
    use_selector: bool,
    # vision inputs (bucketed)
    pixel_values: jax.Array,
    rot_pos_ids: jax.Array,
    window_seg_ids: jax.Array,
    full_seg_ids: jax.Array,
    reverse_index: jax.Array,
    num_merged: jax.Array,  # scalar: real merged token count N
    k: jax.Array,  # scalar: tokens to keep
    # text inputs
    input_ids: jax.Array,  # [T_orig]
    image_positions: jax.Array,  # [L_pad] sentinel-padded
    text_positions: jax.Array,  # [T_text_max] sentinel-padded
    num_text: jax.Array,  # scalar
    position_ids_orig: jax.Array,  # [3, T_orig]
    window_kv_bounds: jax.Array | None = None,
    full_kv_bounds: jax.Array | None = None,
    window_diag: bool = False,
    window_kv_iters: int = 0,
    full_kv_iters: int = 0,
):
    """Returns (next_token, selection indices/valid, compacted valid_len,
    kv cache (k, v) at prefill length, logits row)."""
    hidden, comp, selection, (k_layers, v_layers) = _prefill_core(
        params, cfg, k_max, use_selector, pixel_values, rot_pos_ids,
        window_seg_ids, full_seg_ids, reverse_index, num_merged, k,
        input_ids, image_positions, text_positions, num_text,
        position_ids_orig, window_kv_bounds, full_kv_bounds,
        window_diag, window_kv_iters, full_kv_iters,
    )
    last = hidden[0, comp.valid_len - 1]  # [D]
    logits = lm_mod.lm_head(params["lm"], last, cfg.text)  # [V]
    next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return (next_token, selection.indices, selection.valid, selection.scores,
            comp.valid_len, (k_layers, v_layers), logits)


def _compact_stage(
    params, cfg, k_max, use_selector, pixel_values, rot_pos_ids,
    window_seg_ids, full_seg_ids, reverse_index, num_merged, k,
    input_ids, image_positions, text_positions, num_text,
    position_ids_orig, window_kv_bounds, full_kv_bounds,
    window_diag, window_kv_iters, full_kv_iters,
):
    """Traced ViT -> selection -> compaction (NO decoder layers).

    Shared by the fused prefill programs below and by the chunked-prefill
    path, which runs the compacted sequence through the decoder in
    fixed-size segments between continuous-batching decode chunks."""
    vision_embeds = vit_mod.vit_forward(
        params["visual"], pixel_values, rot_pos_ids, window_seg_ids,
        full_seg_ids, reverse_index, cfg.vision,
        window_kv_bounds=window_kv_bounds, full_kv_bounds=full_kv_bounds,
        window_diag=window_diag,
        window_kv_iters=window_kv_iters, full_kv_iters=full_kv_iters,
    )  # [L_pad, out]
    return _select_and_compact(
        params, cfg, k_max, use_selector, vision_embeds, num_merged, k,
        input_ids, image_positions, text_positions, num_text,
        position_ids_orig,
    )


def _select_and_compact(
    params, cfg, k_max, use_selector, vision_embeds, num_merged, k,
    input_ids, image_positions, text_positions, num_text,
    position_ids_orig,
):
    """Selection + sequence compaction given merged vision embeddings."""
    text_embeds = lm_mod.embed_tokens(params["lm"], input_ids)  # [T_orig, D]

    if use_selector:
        selection = select_hard(
            params["scorer"], vision_embeds, num_merged, k, k_max
        )
    else:
        # keep everything: identity "selection" over all L_pad slots
        n_pad = vision_embeds.shape[0]
        idx = jnp.arange(k_max, dtype=jnp.int32)
        valid = idx < num_merged
        idx = jnp.where(valid, idx, n_pad)
        selection = Selection(
            indices=idx, valid=valid,
            scores=jnp.zeros((n_pad,), jnp.float32), k=num_merged,
        )

    comp = compact_sequence(
        text_embeds, vision_embeds, selection, image_positions,
        text_positions, num_text, position_ids_orig,
    )
    return comp, selection


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "k_max", "use_selector", "window_diag",
                     "window_kv_iters", "full_kv_iters", "pad_to"),
)
def _vision_compact(
    params, cfg, k_max, use_selector, pixel_values, rot_pos_ids,
    window_seg_ids, full_seg_ids, reverse_index, num_merged, k,
    input_ids, image_positions, text_positions, num_text,
    position_ids_orig, window_kv_bounds=None, full_kv_bounds=None,
    window_diag: bool = False, window_kv_iters: int = 0,
    full_kv_iters: int = 0, pad_to: int = 0,
):
    """Chunked-prefill stage A: the compacted sequence WITHOUT any decoder
    work. Returns (comp, selection) pytrees; ``pad_to`` > t_comp pads the
    embeds/position rows inside the program (an eager pad would cost an
    extra dispatch round trip per admission — material through the axon
    tunnel)."""
    comp, selection = _compact_stage(
        params, cfg, k_max, use_selector, pixel_values, rot_pos_ids,
        window_seg_ids, full_seg_ids, reverse_index, num_merged, k,
        input_ids, image_positions, text_positions, num_text,
        position_ids_orig, window_kv_bounds, full_kv_bounds,
        window_diag, window_kv_iters, full_kv_iters,
    )
    t_comp = comp.embeds.shape[0]
    if pad_to > t_comp:
        comp = comp._replace(
            embeds=jnp.pad(comp.embeds, ((0, pad_to - t_comp), (0, 0))),
            position_ids=jnp.pad(comp.position_ids,
                                 ((0, 0), (0, pad_to - t_comp))),
        )
    return comp, selection


def _prefill_core(
    params, cfg, k_max, use_selector, pixel_values, rot_pos_ids,
    window_seg_ids, full_seg_ids, reverse_index, num_merged, k,
    input_ids, image_positions, text_positions, num_text,
    position_ids_orig, window_kv_bounds, full_kv_bounds,
    window_diag, window_kv_iters, full_kv_iters,
):
    """Shared traced prefill body: ViT -> selection -> compaction -> LM.

    Called under jit by ``_prefill`` (generation) and ``_prefill_ll``
    (loglikelihood scoring). Returns (hidden, comp, selection, kv)."""
    comp, selection = _compact_stage(
        params, cfg, k_max, use_selector, pixel_values, rot_pos_ids,
        window_seg_ids, full_seg_ids, reverse_index, num_merged, k,
        input_ids, image_positions, text_positions, num_text,
        position_ids_orig, window_kv_bounds, full_kv_bounds,
        window_diag, window_kv_iters, full_kv_iters,
    )

    hidden, kv = lm_mod.lm_prefill(
        params["lm"], comp.embeds[None], comp.position_ids[:, None, :],
        comp.seg_ids[None], cfg.text,
    )
    return hidden, comp, selection, kv


def _score_continuation(params, cfg, hidden, valid_len, cont_ids, cont_len,
                        c_max: int):
    """Sum log-probs of the last ``cont_len`` tokens of the (compacted)
    sequence, whose ids are ``cont_ids[:cont_len]``, plus a greedy flag.

    The compacted layout sorts real tokens by original position with padding
    after, so the continuation (a pure-text suffix that compression never
    drops) occupies positions [valid_len - cont_len, valid_len). Token i is
    predicted by the hidden state one position earlier. Mirrors the lmms ABC
    ``loglikelihood`` contract (lmms-eval/lmms_eval/api/model.py:30-57)."""
    c_idx = jnp.arange(c_max)
    pos = valid_len - cont_len + c_idx  # continuation token positions
    valid = c_idx < cont_len
    h = hidden[0, jnp.maximum(pos - 1, 0)]  # [c_max, D]
    logits = lm_mod.lm_head(params["lm"], h, cfg.text)  # [c_max, V]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ids = cont_ids.astype(jnp.int32)
    tok_lp = jnp.take_along_axis(logp, ids[:, None], axis=-1)[:, 0]
    ll = jnp.sum(jnp.where(valid, tok_lp, 0.0))
    greedy = jnp.all(
        jnp.where(valid, jnp.argmax(logits, axis=-1) == ids, True)
    )
    return ll, greedy


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "k_max", "use_selector", "c_max", "window_diag",
                     "window_kv_iters", "full_kv_iters"),
)
def _prefill_ll(
    params: dict,
    cfg: VLConfig,
    k_max: int,
    use_selector: bool,
    c_max: int,
    pixel_values: jax.Array,
    rot_pos_ids: jax.Array,
    window_seg_ids: jax.Array,
    full_seg_ids: jax.Array,
    reverse_index: jax.Array,
    num_merged: jax.Array,
    k: jax.Array,
    input_ids: jax.Array,
    image_positions: jax.Array,
    text_positions: jax.Array,
    num_text: jax.Array,
    position_ids_orig: jax.Array,
    cont_ids: jax.Array,  # [c_max] continuation token ids (padded)
    cont_len: jax.Array,  # scalar: real continuation length
    window_kv_bounds: jax.Array | None = None,
    full_kv_bounds: jax.Array | None = None,
    window_diag: bool = False,
    window_kv_iters: int = 0,
    full_kv_iters: int = 0,
):
    """Loglikelihood prefill: returns (sum log-prob of continuation,
    is_greedy). The full prompt (context + continuation) is prefilled once;
    compression applies to the vision tokens exactly as in generation."""
    hidden, comp, _selection, _kv = _prefill_core(
        params, cfg, k_max, use_selector, pixel_values, rot_pos_ids,
        window_seg_ids, full_seg_ids, reverse_index, num_merged, k,
        input_ids, image_positions, text_positions, num_text,
        position_ids_orig, window_kv_bounds, full_kv_bounds,
        window_diag, window_kv_iters, full_kv_iters,
    )
    return _score_continuation(
        params, cfg, hidden, comp.valid_len, cont_ids, cont_len, c_max
    )


def ll_continuation_arrays(continuation_ids: np.ndarray):
    """(cont_padded [c_max], c, c_max) for loglikelihood scoring — shared by
    both family engines so the bucketing stays in one place."""
    continuation_ids = np.asarray(continuation_ids).reshape(-1)
    c = len(continuation_ids)
    assert c > 0, "empty continuation"
    c_max = max(16, -(-c // 16) * 16)
    cont_padded = np.zeros(c_max, np.int64)
    cont_padded[:c] = continuation_ids
    return cont_padded, c, c_max


def text_only_loglikelihood(params, cfg, full_ids, cont_padded, c, c_max,
                            text_buckets):
    """Text-only (ll, is_greedy) over the padded causal prefill — the
    family-agnostic branch of engine.loglikelihood."""
    t_orig = len(full_ids)
    t_bucket = pick_bucket(t_orig, list(text_buckets))
    t_bucket += (-t_bucket) % 128
    ids_padded = np.zeros(t_bucket, np.int64)
    ids_padded[:t_orig] = full_ids
    pos = np.zeros((3, t_bucket), np.int64)
    pos[:, :t_orig] = np.tile(np.arange(t_orig), (3, 1))
    seg = (np.arange(t_bucket) < t_orig).astype(np.int32)
    ll, greedy = _prefill_text_ll(
        params, cfg, c_max, jnp.asarray(ids_padded), jnp.asarray(pos),
        jnp.asarray(seg), jnp.asarray(t_orig), jnp.asarray(cont_padded),
        jnp.asarray(c),
    )
    return float(ll), bool(greedy)


@functools.partial(jax.jit, static_argnames=("cfg", "c_max"))
def _prefill_text_ll(
    params: dict,
    cfg: VLConfig,
    c_max: int,
    input_ids: jax.Array,  # [T_pad]
    position_ids: jax.Array,  # [3, T_pad]
    seg_ids: jax.Array,  # [T_pad]
    valid_len: jax.Array,  # scalar
    cont_ids: jax.Array,  # [c_max]
    cont_len: jax.Array,  # scalar
):
    """Text-only loglikelihood prefill (no vision branch)."""
    embeds = lm_mod.embed_tokens(params["lm"], input_ids)
    hidden, _ = lm_mod.lm_prefill(
        params["lm"], embeds[None], position_ids[:, None, :],
        seg_ids[None], cfg.text,
    )
    return _score_continuation(
        params, cfg, hidden, valid_len, cont_ids, cont_len, c_max
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _prefill_text(
    params: dict,
    cfg: VLConfig,
    input_ids: jax.Array,  # [T_pad] right-padded with pad rows
    position_ids: jax.Array,  # [3, T_pad]
    seg_ids: jax.Array,  # [T_pad] int32 (1 valid / 0 pad)
    valid_len: jax.Array,  # scalar
):
    """Causal prefill with no vision branch (text-only requests —
    mme/scienceqa docs without an image; reference runs the stock LM path)."""
    embeds = lm_mod.embed_tokens(params["lm"], input_ids)
    hidden, (k_layers, v_layers) = lm_mod.lm_prefill(
        params["lm"], embeds[None], position_ids[:, None, :],
        seg_ids[None], cfg.text,
    )
    last = hidden[0, valid_len - 1]
    logits = lm_mod.lm_head(params["lm"], last, cfg.text)
    next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return next_token, (k_layers, v_layers), logits


def generate_text_only(
    params: dict,
    cfg,
    input_ids: np.ndarray,
    max_new_tokens: int,
    eos_token_ids,
    temperature: float = 0.0,
    top_p: float = 1.0,
    seed: int = 0,
    on_token_chunk=None,
    text_buckets=(64, 128, 256, 512, 1024),
    _defer_decode: bool = False,
    top_k: int = 0,
    repetition_penalty: float = 1.0,
) -> "GenerationResult":
    """Text-only generation shared by both family engines: plain causal
    prefill (1D rope on all three axes) + decode. No vision branch."""
    import time

    input_ids = np.asarray(input_ids).reshape(-1)
    t_orig = len(input_ids)
    t_start = time.perf_counter()
    t_bucket = pick_bucket(t_orig, list(text_buckets))
    t_bucket += (-t_bucket) % 128
    ids_padded = np.zeros(t_bucket, np.int64)
    ids_padded[:t_orig] = input_ids
    pos = np.zeros((3, t_bucket), np.int64)
    pos[:, :t_orig] = np.tile(np.arange(t_orig), (3, 1))
    seg = (np.arange(t_bucket) < t_orig).astype(np.int32)
    next_token, (k_l, v_l), last_logits = _prefill_text(
        params, cfg, jnp.asarray(ids_padded), jnp.asarray(pos),
        jnp.asarray(seg), jnp.asarray(t_orig),
    )
    next_token.block_until_ready()
    t_prefill = time.perf_counter() - t_start
    t_max = t_bucket + max_new_tokens
    cache = lm_mod.KVCache(
        k=jnp.pad(k_l, ((0, 0), (0, 0), (0, t_max - t_bucket),
                        (0, 0), (0, 0))),
        v=jnp.pad(v_l, ((0, 0), (0, 0), (0, t_max - t_bucket),
                        (0, 0), (0, 0))),
        length=jnp.full((cfg.text.num_hidden_layers, 1), t_orig, jnp.int32),
    )
    if _defer_decode:
        return PrefillState(
            cache=cache, next_token=int(next_token), start_pos=t_orig,
            eos_token_ids=tuple(eos_token_ids),
            max_new_tokens=max_new_tokens,
            result=GenerationResult(
                tokens=[], selected_indices=None, num_vision_tokens=0,
                prefill_len=t_orig, prefill_seconds=t_prefill,
            ),
            t_start=t_start,
            logits=last_logits,
        )
    presence = None
    if repetition_penalty != 1.0:
        presence, next_token = _rep_penalty_setup(
            cfg.text.vocab_size, input_ids, last_logits, next_token,
            repetition_penalty, temperature, top_p, top_k, seed)
    tokens = _run_decode_loop(
        params, cfg, cache, next_token, t_orig, eos_token_ids,
        max_new_tokens, temperature, top_p, seed, on_chunk=on_token_chunk,
        top_k=top_k, repetition_penalty=repetition_penalty,
        presence=presence,
    )
    return GenerationResult(
        tokens=tokens, selected_indices=None, num_vision_tokens=0,
        prefill_len=t_orig, prefill_seconds=t_prefill,
        total_seconds=time.perf_counter() - t_start,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "window_diag", "window_kv_iters", "full_kv_iters"),
)
def _vision_stats(params, cfg: VLConfig, pixel_values, rot_pos_ids,
                  window_seg_ids, full_seg_ids, reverse_index,
                  window_kv_bounds=None, full_kv_bounds=None,
                  window_diag: bool = False, window_kv_iters: int = 0,
                  full_kv_iters: int = 0):
    """ViT forward with last-block attention stats (baseline methods)."""
    return vit_mod.vit_forward_stats(
        params["visual"], pixel_values, rot_pos_ids, window_seg_ids,
        full_seg_ids, reverse_index, cfg.vision,
        window_kv_bounds=window_kv_bounds, full_kv_bounds=full_kv_bounds,
        window_diag=window_diag,
        window_kv_iters=window_kv_iters, full_kv_iters=full_kv_iters,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _prefill_from_vision(
    params: dict,
    cfg: VLConfig,
    vision_embeds: jax.Array,  # [L_pad, D] (strategy replacements applied)
    indices: jax.Array,  # [k_max] ascending, sentinel L_pad for invalid
    valid: jax.Array,  # [k_max] bool
    k: jax.Array,  # scalar kept count
    input_ids: jax.Array,
    image_positions: jax.Array,
    text_positions: jax.Array,
    num_text: jax.Array,
    position_ids_orig: jax.Array,
):
    """Compaction + causal prefill given externally-selected vision tokens
    (training-free baseline path; ViT ran separately via _vision_stats)."""
    hidden, comp, (k_layers, v_layers) = _from_vision_core(
        params, cfg, vision_embeds, indices, valid, k, input_ids,
        image_positions, text_positions, num_text, position_ids_orig,
    )
    last = hidden[0, comp.valid_len - 1]
    logits = lm_mod.lm_head(params["lm"], last, cfg.text)
    next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return next_token, comp.valid_len, (k_layers, v_layers), logits


def _from_vision_core(params, cfg, vision_embeds, indices, valid, k,
                      input_ids, image_positions, text_positions, num_text,
                      position_ids_orig):
    """Shared traced body of the from-vision prefill (generation + ll)."""
    text_embeds = lm_mod.embed_tokens(params["lm"], input_ids)
    selection = Selection(
        indices=indices.astype(jnp.int32), valid=valid,
        scores=jnp.zeros((vision_embeds.shape[0],), jnp.float32),
        k=jnp.asarray(k),
    )
    comp = compact_sequence(
        text_embeds, vision_embeds, selection, image_positions,
        text_positions, num_text, position_ids_orig,
    )
    hidden, kv = lm_mod.lm_prefill(
        params["lm"], comp.embeds[None], comp.position_ids[:, None, :],
        comp.seg_ids[None], cfg.text,
    )
    return hidden, comp, kv


@functools.partial(jax.jit, static_argnames=("cfg", "c_max"))
def _prefill_from_vision_ll(
    params: dict,
    cfg: VLConfig,
    c_max: int,
    vision_embeds: jax.Array,
    indices: jax.Array,
    valid: jax.Array,
    k: jax.Array,
    input_ids: jax.Array,
    image_positions: jax.Array,
    text_positions: jax.Array,
    num_text: jax.Array,
    position_ids_orig: jax.Array,
    cont_ids: jax.Array,
    cont_len: jax.Array,
):
    """Loglikelihood scoring over the from-vision prefill (used by the OV
    engine, whose RICE tower runs in a separate program)."""
    hidden, comp, _kv = _from_vision_core(
        params, cfg, vision_embeds, indices, valid, k, input_ids,
        image_positions, text_positions, num_text, position_ids_orig,
    )
    return _score_continuation(
        params, cfg, hidden, comp.valid_len, cont_ids, cont_len, c_max
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "target", "capture", "window_diag",
                     "window_kv_iters", "full_kv_iters"),
)
def _stage_a(
    params: dict,
    cfg: VLConfig,
    target: int,  # compression layer index (reference default 2)
    capture: str,  # "fastv" (qk attention at target-1) | "dart" (keys at target)
    pixel_values, rot_pos_ids, window_seg_ids, full_seg_ids, reverse_index,
    num_merged, input_ids, image_positions, text_positions, num_text,
    position_ids_orig, window_kv_bounds=None, full_kv_bounds=None,
    window_diag: bool = False, window_kv_iters: int = 0,
    full_kv_iters: int = 0,
):
    """LLM-side compression, stage A: ViT + full-sequence decoder layers
    [0, target) with attention-statistic capture.

    Reference mechanism: FastV ranks image positions by mean attention
    received in layer target-1 (``fastv.py:236-266``); DART picks pivots by
    key L1-norm at the target layer (``dart.py:208-302``). Both then gather
    the sequence at layer ``target``.

    Returns (hidden at layer target [1, T, D], (k_a, v_a) for layers
    [0, target), fastv_scores [T], key_l1 [T], full-seq valid_len,
    comp.position_ids [3, T], comp.selected_positions [T]).
    """
    vision_embeds = vit_mod.vit_forward(
        params["visual"], pixel_values, rot_pos_ids, window_seg_ids,
        full_seg_ids, reverse_index, cfg.vision,
        window_kv_bounds=window_kv_bounds, full_kv_bounds=full_kv_bounds,
        window_diag=window_diag,
        window_kv_iters=window_kv_iters, full_kv_iters=full_kv_iters,
    )
    return _stage_a_core(
        params, cfg, target, capture, vision_embeds, num_merged, input_ids,
        image_positions, text_positions, num_text, position_ids_orig,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "target", "capture"))
def _stage_a_from_vision(
    params: dict, cfg, target: int, capture: str,
    vision_embeds: jax.Array, num_merged, input_ids, image_positions,
    text_positions, num_text, position_ids_orig,
):
    """Stage A given precomputed vision embeddings (OV family: RICE tower
    runs in its own program; the decoder stack is family-agnostic)."""
    return _stage_a_core(
        params, cfg, target, capture, vision_embeds, num_merged, input_ids,
        image_positions, text_positions, num_text, position_ids_orig,
    )


def _stage_a_core(
    params, cfg, target, capture, vision_embeds, num_merged, input_ids,
    image_positions, text_positions, num_text, position_ids_orig,
):
    text_embeds = lm_mod.embed_tokens(params["lm"], input_ids)
    n_pad = vision_embeds.shape[0]
    idx = jnp.arange(n_pad, dtype=jnp.int32)
    valid = idx < num_merged
    selection = Selection(
        indices=jnp.where(valid, idx, n_pad), valid=valid,
        scores=jnp.zeros((n_pad,), jnp.float32), k=num_merged,
    )
    comp = compact_sequence(
        text_embeds, vision_embeds, selection, image_positions,
        text_positions, num_text, position_ids_orig,
    )

    layers = params["lm"]["layers"]
    cap_layer = target - 1 if capture == "fastv" else target
    pre = jax.tree.map(lambda a: a[:cap_layer], layers)
    hidden, (k_pre, v_pre) = lm_mod.lm_prefill_layers(
        pre, comp.embeds[None], comp.position_ids[:, None, :],
        comp.seg_ids[None], cfg.text,
    )
    q_cap, k_cap = lm_mod.layer_qk(
        layers, cap_layer, hidden, comp.position_ids[:, None, :], cfg.text
    )

    # FastV image score: mean over heads & (valid) queries of causal softmax
    # attention received per position (origin=False variant, fastv.py:252).
    # Streamed over query blocks: the naive T x T x H fp32 map is ~16 GB at
    # the 16384 vision bucket; the blocked column-sum peaks at H x B x T.
    fastv_scores = _fastv_attention_colsum(
        q_cap[0], k_cap[0], comp.seg_ids, cfg.text.head_dim**-0.5
    )

    key_l1 = jnp.abs(k_cap[0]).sum(axis=(1, 2))  # [T] L1 over heads*dims

    if capture == "fastv":
        # run the capture layer itself to reach layer `target`'s input
        one = jax.tree.map(lambda a: a[cap_layer : cap_layer + 1], layers)
        hidden, (k1, v1) = lm_mod.lm_prefill_layers(
            one, hidden, comp.position_ids[:, None, :], comp.seg_ids[None],
            cfg.text,
        )
        k_a = jnp.concatenate([k_pre, k1])
        v_a = jnp.concatenate([v_pre, v1])
    else:
        k_a, v_a = k_pre, v_pre

    return (hidden, (k_a, v_a), fastv_scores, key_l1, comp.valid_len,
            comp.position_ids, comp.selected_positions)


def _fastv_attention_colsum(q, k, seg_ids, scale, block: int = 128):
    """Mean attention received per key under causal masked softmax, streamed
    over query blocks (FastV capture without materializing T x T).

    q, k: [T, H, D]; seg_ids: [T] (0 = padding). Returns [T] fp32:
    ``probs.mean(heads).sum(valid queries) / n_valid_queries`` — identical to
    the reference's eager fp32 recompute (``fastv.py:84-93``) semantics.
    """
    t = q.shape[0]
    t_pad = -(-t // block) * block
    qp = jnp.pad(q, ((0, t_pad - t), (0, 0), (0, 0)))
    segp = jnp.pad(seg_ids, (0, t_pad - t))
    valid_k = (seg_ids > 0)
    kf = k.astype(jnp.float32)

    def body(colsum, qb):
        qs = jax.lax.dynamic_slice_in_dim(qp, qb * block, block)  # [B, H, D]
        logits = jnp.einsum(
            "bhd,khd->hbk", qs.astype(jnp.float32), kf,
            preferred_element_type=jnp.float32,
        ) * scale  # [H, B, T]
        qi = qb * block + jnp.arange(block)
        seg_q = jax.lax.dynamic_slice_in_dim(segp, qb * block, block)
        mask = (
            (qi[:, None] >= jnp.arange(t)[None, :])
            & valid_k[None, :] & (seg_q > 0)[:, None]
        )  # [B, T]
        probs = jnp.where(
            mask[None], jax.nn.softmax(
                jnp.where(mask[None], logits, -1e30), axis=-1
            ), 0.0,
        )
        colsum = colsum + probs.mean(axis=0).sum(axis=0)  # [T]
        return colsum, None

    colsum, _ = jax.lax.scan(
        body, jnp.zeros((t,), jnp.float32), jnp.arange(t_pad // block)
    )
    nq = jnp.maximum((seg_ids > 0).sum(), 1)
    return colsum / nq


@functools.partial(jax.jit, static_argnames=("cfg", "target"))
def _stage_b(
    params: dict,
    cfg: VLConfig,
    target: int,
    hidden: jax.Array,  # [1, T, D] at layer target's input
    position_ids_full: jax.Array,  # [3, T]
    keep_indices: jax.Array,  # [T_keep] ascending positions into T; sentinel T
    keep_valid_len: jax.Array,  # scalar
):
    """LLM-side compression, stage B: gather the sequence at layer target and
    run layers [target, end) + head (``fastv.py:253-258`` keep_indexs gather)."""
    t = hidden.shape[1]
    h_pad = jnp.concatenate([hidden[0], jnp.zeros_like(hidden[0, :1])])
    h_comp = h_pad[keep_indices][None]
    pos_pad = jnp.pad(position_ids_full, ((0, 0), (0, 1)))
    pos_comp = pos_pad[:, keep_indices]
    t_keep = keep_indices.shape[0]
    seg = (jnp.arange(t_keep) < keep_valid_len).astype(jnp.int32)

    layers = params["lm"]["layers"]
    post = jax.tree.map(lambda a: a[target:], layers)
    x, (k_b, v_b) = lm_mod.lm_prefill_layers(
        post, h_comp, pos_comp[:, None, :], seg[None], cfg.text
    )
    x = vit_mod.rms_norm(
        x, params["lm"]["final_ln_scale"], cfg.text.rms_norm_eps
    )
    last = x[0, keep_valid_len - 1]
    logits = lm_mod.lm_head(params["lm"], last, cfg.text)
    next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return next_token, (k_b, v_b), logits


@functools.partial(jax.jit, static_argnames=("cfg",))
def _decode(params, cfg: VLConfig, cache: lm_mod.KVCache, token: jax.Array,
            pos: jax.Array):
    """token: [] int32; pos: [] int32 shared by all 3 M-RoPE axes."""
    embed = lm_mod.embed_tokens(params["lm"], token[None])[None]  # [1, 1, D]
    pos3 = jnp.broadcast_to(pos, (3, 1, 1))
    hidden, cache = lm_mod.lm_decode_step(params["lm"], cache, embed, pos3, cfg.text)
    logits = lm_mod.lm_head(params["lm"], hidden[0, 0], cfg.text)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache, logits


def _sample_token(logits: jax.Array, key: jax.Array, temperature: jax.Array,
                  top_p: jax.Array, top_k=0) -> jax.Array:
    """Greedy when temperature == 0, else top-k/nucleus (top-p) sampling.

    ``lax.cond`` keeps the vocab-size argsort out of the greedy path (it runs
    only when sampling is enabled). Warper order follows HF
    (``TemperatureLogitsWarper`` -> ``TopKLogitsWarper`` ->
    ``TopPLogitsWarper``): temperature first, then the top-k cut, then the
    smallest prefix of the (top-k-renormalized) sorted distribution whose
    mass reaches top_p. ``top_k`` is a traced scalar; <= 0 disables it."""

    def greedy(_):
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def sample(_):
        temp = jnp.maximum(temperature, 1e-6)
        probs = jax.nn.softmax(logits.astype(jnp.float32) / temp, axis=-1)
        sort_idx = jnp.argsort(-probs)
        sorted_probs = probs[sort_idx]
        v = sorted_probs.shape[0]
        k_eff = jnp.where(top_k <= 0, v, top_k)
        kmask = jnp.arange(v) < k_eff
        sp = jnp.where(kmask, sorted_probs, 0.0)
        # HF applies top_p over the top_k-RENORMALIZED distribution; scaling
        # the cutoff by the kept mass z is the renormalization without a
        # divide (z == 1 when top_k is off, preserving the old numerics).
        z = jnp.sum(sp)
        cum = jnp.cumsum(sp)
        keep = ((cum - sp) < top_p * z) & kmask  # always keeps the top token
        masked = jnp.where(keep, jnp.log(sp + 1e-20), -jnp.inf)
        choice = jax.random.categorical(key, masked)
        return sort_idx[choice].astype(jnp.int32)

    return jax.lax.cond(temperature > 0.0, sample, greedy, None)


def _penalize_logits(logits: jax.Array, presence: jax.Array,
                     penalty) -> jax.Array:
    """HF ``RepetitionPenaltyLogitsProcessor`` semantics: tokens already
    seen (prompt + generated; ``presence`` is a vocab-shaped bool mask) get
    score/penalty when positive, score*penalty when negative. Broadcasts
    over leading batch axes."""
    lg = logits.astype(jnp.float32)
    pen = jnp.where(lg > 0, lg / penalty, lg * penalty)
    return jnp.where(presence, pen, lg)


@functools.partial(jax.jit, static_argnames=("cfg", "max_steps"),
                   donate_argnums=(2,))
def _decode_loop(
    params,
    cfg: VLConfig,
    cache: lm_mod.KVCache,
    first_token: jax.Array,  # [] int32 (from prefill)
    start_pos: jax.Array,  # [] int32: valid_len + rope_delta
    eos_ids: jax.Array,  # [n_eos] int32
    max_steps: int,
    temperature: jax.Array = 0.0,
    top_p: jax.Array = 1.0,
    rng_key: jax.Array | None = None,
    top_k: jax.Array = 0,
    rep_penalty: jax.Array = 1.0,
    presence: jax.Array | None = None,
):
    """Decode fully on device with early EOS exit (greedy or top-p sampling).

    The reference (and our earlier python loop) dispatches one step per token
    with a host sync each; a ``while_loop`` keeps the whole decode on device
    and transfers the token buffer once — removing per-token host round trips
    (~26 ms each through the axon tunnel; dispatch overhead on any host).

    ``presence`` ([V] bool; None = repetition penalty off — a separate
    compiled program only when the feature is used): tokens already seen get
    HF repetition-penalty treatment each step (greedy AND sampled), and the
    mask accumulates every emitted token.

    Returns (tokens [max_steps] int32 — entries past `count` undefined,
    count [], cache, last token, presence-or-None).
    """
    temperature = jnp.asarray(temperature, jnp.float32)
    top_p = jnp.asarray(top_p, jnp.float32)
    top_k = jnp.asarray(top_k, jnp.int32)
    rep_penalty = jnp.asarray(rep_penalty, jnp.float32)
    use_pen = presence is not None
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)

    def cond(state):
        step, tok, cache, done = state[:4]
        return (step < max_steps) & jnp.logical_not(done)

    def body(state):
        step, tok, cache, done, toks, key, pres = state
        pos = start_pos + step
        embed = lm_mod.embed_tokens(params["lm"], tok[None])[None]
        pos3 = jnp.broadcast_to(pos, (3, 1, 1))
        hidden, cache = lm_mod.lm_decode_step(
            params["lm"], cache, embed, pos3, cfg.text
        )
        logits = lm_mod.lm_head(params["lm"], hidden[0, 0], cfg.text)
        if use_pen:
            logits = _penalize_logits(logits, pres, rep_penalty)
        key, sub = jax.random.split(key)
        tok2 = _sample_token(logits, sub, temperature, top_p, top_k)
        if use_pen:
            pres = pres.at[tok2].set(True)
        toks = toks.at[step].set(tok2)
        done = jnp.any(tok2 == eos_ids)
        return step + 1, tok2, cache, done, toks, key, pres

    toks0 = jnp.zeros((max_steps,), jnp.int32)
    done0 = jnp.any(first_token == eos_ids)
    pres0 = presence if use_pen else jnp.zeros((), jnp.bool_)
    step, tok, cache, done, toks, _, pres = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), first_token, cache, done0, toks0,
         rng_key, pres0),
    )
    # count excludes a trailing EOS
    count = step - jnp.where(done & (step > 0), 1, 0)
    return toks, count, cache, tok, (pres if use_pen else None)


def _run_decode_loop(params, cfg, cache, first_token, start_pos, eos_token_ids,
                     max_new_tokens, temperature=0.0, top_p=1.0, seed=0,
                     on_chunk=None, chunk_size: int = 8, top_k: int = 0,
                     repetition_penalty: float = 1.0, presence=None):
    """Host wrapper: on-device decode, one transfer for all tokens.

    ``on_chunk``: optional callback receiving each freshly decoded token
    chunk (streaming serving); decode then runs in ``chunk_size``-token
    device dispatches instead of one while_loop over the whole budget.

    ``presence``: [V] bool device array seeding the repetition-penalty mask
    (prompt tokens + the first token); required when
    ``repetition_penalty != 1.0``, carried across streaming chunks.
    """
    first = int(first_token)
    if first in eos_token_ids:
        if on_chunk is not None:
            on_chunk([])
        return []
    if max_new_tokens <= 1:
        if on_chunk is not None:
            on_chunk([first])
        return [first]
    if repetition_penalty != 1.0:
        assert presence is not None, (
            "repetition_penalty needs the caller-seeded presence mask")
    else:
        presence = None
    eos_arr = jnp.asarray(list(eos_token_ids), jnp.int32)
    temp = jnp.asarray(temperature, jnp.float32)
    tp = jnp.asarray(top_p, jnp.float32)
    tk = jnp.asarray(top_k, jnp.int32)
    rp = jnp.asarray(repetition_penalty, jnp.float32)
    key = jax.random.PRNGKey(seed)

    if on_chunk is None:
        toks, count, _, _, _ = _decode_loop(
            params, cfg, cache, first_token,
            jnp.asarray(start_pos, jnp.int32), eos_arr, max_new_tokens - 1,
            temp, tp, key, tk, rp, presence,
        )
        return [first] + np.asarray(toks)[: int(count)].tolist()

    on_chunk([first])
    out = [first]
    tok = first_token
    remaining = max_new_tokens - 1
    pos = start_pos
    while remaining > 0:
        step = min(chunk_size, remaining)
        key, sub = jax.random.split(key)
        toks, count, cache, tok, presence = _decode_loop(
            params, cfg, cache, tok, jnp.asarray(pos, jnp.int32),
            eos_arr, step, temp, tp, sub, tk, rp, presence,
        )
        n = int(count)
        chunk = np.asarray(toks)[:n].tolist()
        out.extend(chunk)
        on_chunk(chunk)
        if n < step or (chunk and chunk[-1] in eos_token_ids):
            break
        remaining -= step
        pos += step
    return out


def _rep_penalty_setup(vocab_size: int, input_ids, last_logits, next_token,
                       repetition_penalty: float, temperature: float = 0.0,
                       top_p: float = 1.0, top_k: int = 0, seed: int = 0):
    """Host-side repetition-penalty seeding: the presence mask starts as the
    set of prompt token ids (HF penalizes every id in ``input_ids``), and the
    FIRST generated token is re-picked from the penalized prefill last-row
    logits — argmax when greedy, sampled (with the request's seed on a
    distinct stream from the decode loop) when ``temperature > 0`` —
    matching HF ``generate(..., repetition_penalty=p)``, whose processor
    applies to the prefill logits too. Returns (presence [V] device bool,
    first_token int). When the prefill program did not expose its logits
    (LLM-side strategies), the unpenalized first token is kept and only
    subsequent steps penalize."""
    pres = np.zeros(vocab_size, bool)
    pres[np.asarray(input_ids).reshape(-1)] = True
    if last_logits is not None:
        lg = np.asarray(last_logits, np.float32)
        pen = np.where(lg > 0, lg / repetition_penalty,
                       lg * repetition_penalty)
        penalized = np.where(pres, pen, lg)
        if float(temperature) > 0.0:
            key = jax.random.fold_in(jax.random.PRNGKey(seed), 0x5157)
            first = int(_sample_token(
                jnp.asarray(penalized), key,
                jnp.asarray(float(temperature), jnp.float32),
                jnp.asarray(float(top_p), jnp.float32),
                jnp.asarray(int(top_k), jnp.int32)))
        else:
            first = int(penalized.argmax())
    else:
        first = int(next_token)
    pres[first] = True
    return jnp.asarray(pres), first


@functools.partial(jax.jit, static_argnames=("cfg", "max_steps"),
                   donate_argnums=(2,))
def _decode_loop_batch(
    params,
    cfg: VLConfig,
    cache: lm_mod.KVCache,
    first_tokens: jax.Array,  # [B] int32
    start_pos: jax.Array,  # [B] int32 (per-sample valid_len + rope_delta)
    eos_ids: jax.Array,  # [n_eos]
    max_steps: int,
    temperature: jax.Array = 0.0,
    top_p: jax.Array = 1.0,
    rng_key: jax.Array | None = None,
    top_k: jax.Array = 0,
    rep_penalty: jax.Array = 1.0,
    presence: jax.Array | None = None,
):
    """Batched on-device decode (continuous micro-batch serving).

    Decode is weight-bandwidth-bound at batch 1 (every step streams the whole
    LM from HBM); stacking B requests' KV caches amortizes the weight reads
    ~B-fold. ``lm_decode_step`` already supports per-layer AND per-row cache
    lengths, so requests with different prefill lengths (even mixed
    FastV-style per-layer lengths) batch together. Finished rows keep
    stepping with their last token frozen; their cache writes land past the
    returned counts and are ignored.

    ``presence`` ([B, V] bool, None = off): per-row repetition-penalty masks
    seeded from each request's prompt (+first token); frozen finished rows
    re-mark their last token, which is a no-op.

    Returns (toks [max_steps, B], counts [B] valid tokens excl. trailing EOS).
    """
    b = first_tokens.shape[0]
    temperature = jnp.asarray(temperature, jnp.float32)
    top_p = jnp.asarray(top_p, jnp.float32)
    top_k = jnp.asarray(top_k, jnp.int32)
    rep_penalty = jnp.asarray(rep_penalty, jnp.float32)
    use_pen = presence is not None
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)

    def cond(state):
        step, tok, cache, done = state[:4]
        return (step < max_steps) & jnp.logical_not(jnp.all(done))

    def body(state):
        step, tok, cache, done, finish, toks, key, pres = state
        pos = start_pos + step  # [B]
        embed = lm_mod.embed_tokens(params["lm"], tok)[:, None]  # [B, 1, D]
        pos3 = jnp.broadcast_to(pos[None, :, None], (3, b, 1))
        hidden, cache = lm_mod.lm_decode_step(
            params["lm"], cache, embed, pos3, cfg.text
        )
        logits = lm_mod.lm_head(params["lm"], hidden[:, 0], cfg.text)  # [B, V]
        if use_pen:
            logits = _penalize_logits(logits, pres, rep_penalty)
        key, sub = jax.random.split(key)
        subs = jax.random.split(sub, b)
        tok2 = jax.vmap(
            lambda lg, kk: _sample_token(lg, kk, temperature, top_p, top_k)
        )(logits, subs)
        tok2 = jnp.where(done, tok, tok2)
        if use_pen:
            pres = pres.at[jnp.arange(b), tok2].set(True)
        toks = toks.at[step].set(tok2)
        now_done = jnp.any(tok2[:, None] == eos_ids[None, :], axis=1)
        finish = jnp.where(done, finish, jnp.where(now_done, step, finish))
        done = done | now_done
        return step + 1, tok2, cache, done, finish, toks, key, pres

    toks0 = jnp.zeros((max_steps, b), jnp.int32)
    done0 = jnp.any(first_tokens[:, None] == eos_ids[None, :], axis=1)
    finish0 = jnp.where(done0, -1, max_steps)
    pres0 = presence if use_pen else jnp.zeros((), jnp.bool_)
    step, tok, cache, done, finish, toks, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((), jnp.int32), first_tokens, cache, done0, finish0,
         toks0, rng_key, pres0),
    )
    # per-sample count excludes the trailing EOS (mirrors _decode_loop):
    # finished at step s -> s tokens; never finished -> all decoded steps.
    counts = jnp.clip(jnp.minimum(finish, step), 0)
    return toks, counts


# ---------------------------------------------------------------------------
# Host orchestration
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PrefillState:
    """Deferred-decode prefill output (``generate(..., _defer_decode=True)``):
    everything ``generate_batch`` needs to join this request into one batched
    decode dispatch."""

    cache: "lm_mod.KVCache"  # [L, 1, T, H_kv, Dh] (T = t_comp + max_new)
    next_token: int
    start_pos: int  # valid_len + rope_delta
    eos_token_ids: Tuple[int, ...]
    max_new_tokens: int
    result: "GenerationResult"  # tokens empty; filled after batched decode
    t_start: float = 0.0
    # full logits row of the prefill's last position (selector/orig/text
    # paths; None on strategy paths) — lets loglikelihood_choices score the
    # first continuation token without re-running the prefill
    logits: Optional[jax.Array] = None
    # rope delta of the ORIGINAL (uncompacted) prompt: trailing text token
    # at original ids index i sits at rope position i + rope_delta. Needed
    # by the prefix cache's suffix append — under compression start_pos is
    # valid_len + delta (compacted), so start_pos alone cannot recover
    # trailing-token positions (kept rows keep their original positions)
    rope_delta: int = 0


@dataclasses.dataclass
class GenerationResult:
    tokens: List[int]
    selected_indices: Optional[np.ndarray]  # kept vision token indices (sorted)
    num_vision_tokens: int  # original N
    prefill_len: int  # compacted valid length
    prefill_seconds: float = 0.0
    total_seconds: float = 0.0
    scores: Optional[np.ndarray] = None  # raw LIS scores (visualization)
    # device dispatches the decode took (speculative decoding emits several
    # tokens per dispatch; None for the plain per-token loop)
    decode_dispatches: Optional[int] = None
    # speculative-decoding observability (VERDICT r4 item 5): prompt-lookup
    # proposals made / accepted for this request. acceptance rate =
    # spec_accepted / spec_proposed. None when speculative was off.
    spec_proposed: Optional[int] = None
    spec_accepted: Optional[int] = None


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "lo", "hi", "first", "window_diag",
                     "window_kv_iters", "full_kv_iters"),
)
def _vit_segment(
    params, x, rot_pos_ids, window_seg_ids, full_seg_ids, cfg,
    lo: int, hi: int, first: bool,
    window_kv_bounds=None, full_kv_bounds=None, window_diag: bool = False,
    window_kv_iters: int = 0, full_kv_iters: int = 0,
):
    """Vision-tower layers [lo, hi) as one chunked-admission dispatch
    (``first`` also runs the patch embed on raw pixel rows)."""
    if first:
        x = vit_mod.vit_embed(params["visual"], x)
    return vit_mod.vit_forward_segment(
        params["visual"], x, rot_pos_ids, window_seg_ids, full_seg_ids,
        cfg.vision, lo, hi,
        window_kv_bounds=window_kv_bounds, full_kv_bounds=full_kv_bounds,
        window_diag=window_diag, window_kv_iters=window_kv_iters,
        full_kv_iters=full_kv_iters,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "k_max", "use_selector", "pad_to"),
)
def _compact_from_hidden(
    params, cfg, k_max, use_selector, x, reverse_index, num_merged, k,
    input_ids, image_positions, text_positions, num_text,
    position_ids_orig, pad_to: int = 0,
):
    """Chunked-admission epilogue of the vision phase: merger + selection +
    compaction on the final tower hidden states."""
    vision_embeds = vit_mod.vit_merge(
        params["visual"], x, reverse_index, cfg.vision)
    comp, selection = _select_and_compact(
        params, cfg, k_max, use_selector, vision_embeds, num_merged, k,
        input_ids, image_positions, text_positions, num_text,
        position_ids_orig,
    )
    t_comp = comp.embeds.shape[0]
    if pad_to > t_comp:
        comp = comp._replace(
            embeds=jnp.pad(comp.embeds, ((0, pad_to - t_comp), (0, 0))),
            position_ids=jnp.pad(comp.position_ids,
                                 ((0, 0), (0, pad_to - t_comp))),
        )
    return comp, selection


@functools.partial(jax.jit, static_argnames=("cfg", "p"), donate_argnums=(1,))
def _prefill_chunk_seg(params, cache, embeds, pos, base, cfg, p: int):
    """One chunked-prefill segment: compacted rows [base, base+p) run
    through ALL decoder layers against the (growing) cache in one dispatch.

    ``lm_decode_chunk`` gives exactly the needed semantics — each row's kv
    appends at layer_len + i, row i attends the committed cache plus
    causally within the segment. The cache is donated so segments never
    copy the pool-sized buffer. Returns (hidden [1, p, D], cache)."""
    d = embeds.shape[1]
    seg_e = jax.lax.dynamic_slice(embeds, (base, 0), (p, d))[None]
    seg_p = jax.lax.dynamic_slice(pos, (0, base), (3, p))[:, None, :]
    return lm_mod.lm_decode_chunk(params["lm"], cache, seg_e, seg_p,
                                  cfg.text)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _prefill_chunk_logits(params, hidden, idx, cfg):
    last = hidden[0, idx]
    logits = lm_mod.lm_head(params["lm"], last, cfg.text)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), logits


@dataclasses.dataclass
class ChunkedPrefill:
    """In-flight segmented admission prefill (continuous batching).

    The fused prefill program stalls every live decode slot for its full
    duration (~ViT + whole-prompt LM). This state machine splits the LM
    part into fixed ``seg``-token segments so the batcher can interleave
    decode chunks between them, bounding the decode stall per iteration to
    max(one segment, one vision dispatch) — the vLLM "chunked prefill"
    discipline, TPU-shaped: every segment is the SAME compiled program
    (static segment length, dynamic base offset).

    Correctness leans on the compacted valid-prefix layout: real tokens
    form a prefix, so mid segments are fully real, and the final segment's
    padding rows sit strictly after the real rows (causal masking keeps
    real rows from attending them; their garbage kv lands above the final
    cache length and is never attended — the same invariant the slot pool
    already relies on)."""

    engine: "QwenVLEngine"
    seg: int
    eos_token_ids: Tuple[int, ...]
    max_new_tokens: int
    rope_delta: int
    result: "GenerationResult"
    t_start: float
    # LM phase (populated by start(), or by the compact step when the
    # vision tower itself runs segmented)
    embeds: Optional[jax.Array] = None  # [t_cap, D] compacted (seg-padded)
    position_ids: Optional[jax.Array] = None  # [3, t_cap]
    cache: Optional["lm_mod.KVCache"] = None  # [L, 1, t_cap]
    valid_len: int = 0
    n_seg: int = 0
    selection: Optional[object] = None  # device pytree; fetched in finish()
    i: int = 0
    _hidden_last: Optional[jax.Array] = None
    # vision phase state (segmented tower): layer cursor + program inputs;
    # None once the compact step has run
    _vit: Optional[dict] = None

    @property
    def done(self) -> bool:
        return self._vit is None and self.cache is not None \
            and self.i >= self.n_seg

    def step(self) -> bool:
        """Run ONE dispatch (a vision layer group, the compact epilogue,
        or an LM segment); returns True when the prefill is complete."""
        assert not self.done
        if self._vit is not None:
            self._vit_step()
            return False
        hidden, self.cache = _prefill_chunk_seg(
            self.engine.params, self.cache, self.embeds, self.position_ids,
            jnp.asarray(self.i * self.seg, jnp.int32), self.engine.cfg,
            self.seg,
        )
        self.i += 1
        if self.done:
            self._hidden_last = hidden
        return self.done

    def _vit_step(self):
        eng, v = self.engine, self._vit
        cfg = eng.cfg
        depth = cfg.vision.depth
        if v["lo"] < depth:
            hi = min(v["lo"] + v["group"], depth)
            v["x"] = _vit_segment(
                eng.params, v["x"], v["rot_pos_ids"], v["window_seg_ids"],
                v["full_seg_ids"], cfg, v["lo"], hi, first=(v["lo"] == 0),
                window_kv_bounds=v["window_kv_bounds"],
                full_kv_bounds=v["full_kv_bounds"],
                window_diag=v["window_diag"],
                window_kv_iters=v["window_kv_iters"],
                full_kv_iters=v["full_kv_iters"],
            )
            v["lo"] = hi
            return
        # compact epilogue: merger + selection + compaction, then arm the
        # LM phase (the ONE host sync of the admission lives here)
        comp, selection = _compact_from_hidden(
            eng.params, cfg, v["k_max"], eng.use_selector, v["x"],
            v["reverse_index"], v["num_merged"], v["k"], v["input_ids"],
            v["image_positions"], v["text_positions"], v["num_text"],
            v["position_ids_orig"], pad_to=v["t_cap"],
        )
        self.cache = lm_mod.init_kv_cache(
            cfg.text, 1, v["t_cap"], comp.embeds.dtype)
        self.valid_len = int(comp.valid_len)
        self.n_seg = -(-self.valid_len // self.seg)
        self.embeds, self.position_ids = comp.embeds, comp.position_ids
        self.selection = selection if eng.use_selector else None
        self.result.prefill_len = self.valid_len
        self._vit = None

    def finish(self) -> "PrefillState":
        """Epilogue after the last segment: first token + trimmed cache."""
        import time

        assert self.done
        idx = (self.valid_len - 1) - (self.n_seg - 1) * self.seg
        next_tok, logits = _prefill_chunk_logits(
            self.engine.params, self._hidden_last,
            jnp.asarray(idx, jnp.int32), self.engine.cfg,
        )
        cache = self.cache._replace(
            length=jnp.full_like(self.cache.length, self.valid_len))
        if self.selection is not None:
            # one batched fetch for all selection arrays (single RTT)
            sel_idx, sel_valid, scores = jax.device_get(
                (self.selection.indices, self.selection.valid,
                 self.selection.scores))
            self.result.selected_indices = sel_idx[sel_valid]
            self.result.scores = scores[: self.result.num_vision_tokens]
        self.result.prefill_len = self.valid_len
        self.result.prefill_seconds = time.perf_counter() - self.t_start
        return PrefillState(
            cache=cache, next_token=int(next_tok),
            start_pos=self.valid_len + self.rope_delta,
            eos_token_ids=self.eos_token_ids,
            max_new_tokens=self.max_new_tokens,
            result=self.result, t_start=self.t_start, logits=logits,
            rope_delta=self.rope_delta,
        )


class QwenVLEngine:
    """Batch-1 generation engine (the reference asserts batch=1 for the
    selector path too — ``token_compression/selector_model.py:270``)."""

    def __init__(
        self,
        cfg: VLConfig,
        params: dict,
        use_selector: bool = True,
        budget: float = 0.2,
        vision_buckets=VISION_BUCKETS,
        text_buckets=TEXT_BUCKETS,
        strategy=None,
    ):
        """``strategy``: optional training-free baseline from
        ``selector.baselines`` — overrides the LIS selector."""
        self.cfg = cfg
        self.strategy = strategy
        self.use_selector = (
            strategy is None and use_selector and ("scorer" in params)
        )
        self.budget = budget
        self.vision_buckets = vision_buckets
        self.text_buckets = text_buckets
        # Optional: pad ViT heads to 128 for the packed attention layout
        # (measured slower on v5e; opt in together with VST_PACKED_ATTN=1).
        import os

        if (os.environ.get("VST_PACKED_ATTN") == "1"
                and cfg.vision.head_dim % 128 != 0):
            from visionselector_tpu.models.qwen25vl.weights import (
                pad_vit_head_dim,
            )

            params = dict(params)
            params["visual"] = pad_vit_head_dim(params["visual"], cfg.vision)
        self.params = params

    def _prep_vision(self, input_ids, pixel_values, grid_thw, img_grid,
                     vid_grid, second_per_grid_ts):
        """Host-side prep shared by ``generate`` and ``loglikelihood``:
        bucket choice, vision-batch index arrays, k/k_max, padded position
        maps and M-RoPE ids. ``pixel_values``/``grid_thw`` are the already
        image+video-concatenated arrays; ``img_grid``/``vid_grid`` the
        originals (None when that modality is absent)."""
        import os as _os
        from types import SimpleNamespace

        cfg = self.cfg
        input_ids = np.asarray(input_ids).reshape(-1)
        t_orig = len(input_ids)
        merge_unit = cfg.vision.spatial_merge_unit
        s_real = pixel_values.shape[0]
        # Window-aligned layout (default): every window in a 64-patch slot ->
        # block-diagonal window attention via the all-heads diagonal kernel.
        # The slot padding usually fits the same bucket the raw length needs.
        align = _os.environ.get("VST_ALIGN_WINDOWS", "1") == "1"
        s_need = s_real
        if align:
            from visionselector_tpu.preprocess.indices import (
                aligned_window_len,
            )

            s_need = aligned_window_len(
                grid_thw, window_size=cfg.vision.window_size,
                spatial_merge_size=cfg.vision.spatial_merge_size,
                patch_size=cfg.vision.patch_size,
            )
            if s_need > self.vision_buckets[-1] >= s_real:
                # slot padding would push past the largest validated bucket
                # while the raw length still fits — keep the classic layout
                align = False
                s_need = s_real
        s_bucket = pick_bucket(s_need, [b for b in self.vision_buckets])
        vb = build_vision_batch(
            pixel_values, grid_thw,
            window_size=cfg.vision.window_size,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            patch_size=cfg.vision.patch_size,
            pad_to=s_bucket,
            align_windows=align,
        )
        l_pad = s_bucket // merge_unit
        n = vb.num_merged

        if self.use_selector:
            k = max(1, int(n * self.budget))
            k_max = max(1, int(l_pad * self.budget))
            k = min(k, k_max)
        elif self.strategy is not None:
            k = None  # determined by the strategy downstream
            k_max = min(l_pad, int(l_pad * self.budget) + 2)
        else:
            k = n
            k_max = l_pad

        # Host-side index arrays over the original sequence. Merged-token
        # order is [image grids..., video grids...] (pixel concat order), so
        # the merged->sequence map lists image-token positions first;
        # compact_sequence re-sorts by sequence position, so an interleaved
        # prompt (video before image) stays correct.
        is_img = input_ids == cfg.image_token_id
        is_vid = input_ids == cfg.video_token_id
        is_vision = (is_img if img_grid is not None else False) | (
            is_vid if vid_grid is not None else False)
        image_pos = np.concatenate([
            np.where(is_img)[0] if img_grid is not None else [],
            np.where(is_vid)[0] if vid_grid is not None else [],
        ]).astype(np.int64)
        assert len(image_pos) == n, (len(image_pos), n)
        text_pos = np.where(~is_vision)[0]
        num_text = len(text_pos)

        image_pos_padded = np.full(l_pad, t_orig, np.int64)
        image_pos_padded[:n] = image_pos
        t_text_bucket = pick_bucket(num_text, list(self.text_buckets))
        # Round the compacted length (k_max + text bucket) to a 128 multiple
        # so the causal prefill kernel runs block-aligned without internal
        # padding.
        t_text_bucket += (-(k_max + t_text_bucket)) % 128
        text_pos_padded = np.full(t_text_bucket, t_orig, np.int64)
        text_pos_padded[:num_text] = text_pos

        position_ids, rope_delta = get_rope_index(
            input_ids,
            image_grid_thw=img_grid,
            video_grid_thw=vid_grid,
            second_per_grid_ts=second_per_grid_ts,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            tokens_per_second=cfg.vision.tokens_per_second,
            image_token_id=cfg.image_token_id,
            video_token_id=cfg.video_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
        )
        return SimpleNamespace(
            vb=vb, n=n, k=k, k_max=k_max, l_pad=l_pad, s_bucket=s_bucket,
            image_pos=image_pos, text_pos=text_pos, num_text=num_text,
            image_pos_padded=image_pos_padded,
            text_pos_padded=text_pos_padded, t_text_bucket=t_text_bucket,
            position_ids=position_ids, rope_delta=rope_delta, t_orig=t_orig,
        )

    def loglikelihood(
        self,
        input_ids: np.ndarray,
        continuation_ids: np.ndarray,
        pixel_values: Optional[np.ndarray] = None,
        grid_thw: Optional[np.ndarray] = None,
        pixel_values_videos: Optional[np.ndarray] = None,
        video_grid_thw: Optional[np.ndarray] = None,
        second_per_grid_ts: Optional[np.ndarray] = None,
    ) -> Tuple[float, bool]:
        """Score a continuation given a (possibly visual) context: returns
        (sum log P(continuation | context), is_greedy) — the third method of
        the lmms model ABC (``lmms-eval/lmms_eval/api/model.py:30-57``).

        The full prompt context+continuation is prefilled once; the selector
        (or no compression, for ``orig``) applies to vision tokens exactly as
        in generation, and the continuation — a pure-text suffix that
        compaction always keeps — is scored from the prefill hidden states.
        Training-free baseline strategies are not supported here (the
        reference's compression adapters expose only ``generate_until``)."""
        if self.strategy is not None:
            raise NotImplementedError(
                "loglikelihood supports selector/orig paths only"
            )
        cfg = self.cfg
        input_ids = np.asarray(input_ids).reshape(-1)
        assert len(input_ids) > 0, (
            "loglikelihood needs a non-empty context: token 0's score would "
            "otherwise silently read position 0's clamped hidden state"
        )
        cont_padded, c, c_max = ll_continuation_arrays(continuation_ids)
        full_ids = np.concatenate([input_ids, cont_padded[:c]])

        img_grid = grid_thw if pixel_values is not None else None
        vid_grid = video_grid_thw if pixel_values_videos is not None else None
        if pixel_values is not None and pixel_values_videos is not None:
            pixel_values = np.concatenate([pixel_values, pixel_values_videos])
            grid_thw = np.concatenate([grid_thw, video_grid_thw])
        elif pixel_values_videos is not None:
            pixel_values = pixel_values_videos
            grid_thw = video_grid_thw

        if pixel_values is None:
            return text_only_loglikelihood(
                self.params, cfg, full_ids, cont_padded, c, c_max,
                self.text_buckets,
            )

        assert grid_thw is not None
        p = self._prep_vision(
            full_ids, pixel_values, grid_thw, img_grid, vid_grid,
            second_per_grid_ts,
        )
        vb = p.vb
        ll, greedy = _prefill_ll(
            self.params, cfg, p.k_max, self.use_selector, c_max,
            jnp.asarray(vb.pixel_values), jnp.asarray(vb.rot_pos_ids),
            jnp.asarray(vb.window_seg_ids), jnp.asarray(vb.full_seg_ids),
            jnp.asarray(vb.reverse_index), jnp.asarray(p.n),
            jnp.asarray(p.k), jnp.asarray(full_ids),
            jnp.asarray(p.image_pos_padded), jnp.asarray(p.text_pos_padded),
            jnp.asarray(p.num_text), jnp.asarray(p.position_ids),
            jnp.asarray(cont_padded), jnp.asarray(c),
            window_kv_bounds=jnp.asarray(vb.window_kv_bounds),
            full_kv_bounds=jnp.asarray(vb.full_kv_bounds),
            window_diag=vb.window_diag,
            window_kv_iters=vb.window_kv_iters,
            full_kv_iters=vb.full_kv_iters,
        )
        return float(ll), bool(greedy)

    def generate(
        self,
        input_ids: np.ndarray,
        pixel_values: Optional[np.ndarray] = None,
        grid_thw: Optional[np.ndarray] = None,
        max_new_tokens: int = 64,
        eos_token_ids: Optional[Tuple[int, ...]] = None,
        pixel_values_videos: Optional[np.ndarray] = None,
        video_grid_thw: Optional[np.ndarray] = None,
        second_per_grid_ts: Optional[np.ndarray] = None,
        temperature: float = 0.0,
        top_p: float = 1.0,
        seed: int = 0,
        on_token_chunk=None,
        _defer_decode: bool = False,
        top_k: int = 0,
        repetition_penalty: float = 1.0,
    ) -> GenerationResult:
        """Greedy generation for one sample.

        input_ids: [T_orig] with ``<|image_pad|>``/``<|video_pad|>`` runs
        already expanded. Video path semantics follow the reference
        (``token_compression/selector_model.py:264-298``): kept video tokens
        replace the original run between vision_start/vision_end, with M-RoPE
        ids built on the original sequence then gathered — which the generic
        position-compaction here implements for free.
        """
        import time

        cfg = self.cfg
        if eos_token_ids is None:
            eos_token_ids = (cfg.eos_token_id,)
        input_ids = np.asarray(input_ids).reshape(-1)
        t_orig = len(input_ids)
        t_start = time.perf_counter()

        # Image / video / MIXED requests: pixel rows are concatenated
        # (image grids first, then video grids) through one ViT call; the
        # merged-order -> sequence-position map below follows the same order,
        # and get_rope_index handles interleaved vision runs natively.
        img_grid = grid_thw if pixel_values is not None else None
        vid_grid = video_grid_thw if pixel_values_videos is not None else None
        is_video = pixel_values_videos is not None
        if pixel_values is not None and pixel_values_videos is not None:
            pixel_values = np.concatenate([pixel_values, pixel_values_videos])
            grid_thw = np.concatenate([grid_thw, video_grid_thw])
        elif is_video:
            pixel_values = pixel_values_videos
            grid_thw = video_grid_thw

        if pixel_values is None:
            # Text-only request (no vision branch) — shared helper.
            return generate_text_only(
                self.params, cfg, input_ids, max_new_tokens, eos_token_ids,
                temperature, top_p, seed, on_token_chunk,
                text_buckets=self.text_buckets,
                _defer_decode=_defer_decode,
                top_k=top_k, repetition_penalty=repetition_penalty,
            )

        assert grid_thw is not None

        p = self._prep_vision(
            input_ids, pixel_values, grid_thw, img_grid, vid_grid,
            second_per_grid_ts,
        )
        vb, n, k, k_max, l_pad = p.vb, p.n, p.k, p.k_max, p.l_pad
        image_pos, text_pos, num_text = p.image_pos, p.text_pos, p.num_text
        image_pos_padded = p.image_pos_padded
        text_pos_padded = p.text_pos_padded
        t_text_bucket = p.t_text_bucket
        position_ids, rope_delta = p.position_ids, p.rope_delta

        if self.strategy is not None and getattr(self.strategy, "llm_side", False):
            # FastV/DART: two-stage prefill with mid-decoder compression.
            target = self.strategy.target_layer
            (hidden_t, (k_a, v_a), fv_scores, key_l1, full_valid_len,
             pos_full, _sel) = _stage_a(
                self.params, cfg, target, self.strategy.capture,
                jnp.asarray(vb.pixel_values), jnp.asarray(vb.rot_pos_ids),
                jnp.asarray(vb.window_seg_ids), jnp.asarray(vb.full_seg_ids),
                jnp.asarray(vb.reverse_index), jnp.asarray(n),
                jnp.asarray(input_ids), jnp.asarray(image_pos_padded),
                jnp.asarray(text_pos_padded), jnp.asarray(num_text),
                jnp.asarray(position_ids),
                jnp.asarray(vb.window_kv_bounds),
                jnp.asarray(vb.full_kv_bounds),
                window_diag=vb.window_diag,
                window_kv_iters=vb.window_kv_iters,
                full_kv_iters=vb.full_kv_iters,
            )
            t_pad_full = hidden_t.shape[1]
            fv = np.asarray(fv_scores)[:t_orig]
            kl1 = np.asarray(key_l1)[:t_orig]
            h_t = np.asarray(hidden_t[0], np.float32)[:t_orig]
            retained = np.asarray(
                self.strategy.select(fv, kl1, h_t, image_pos, self.budget),
                np.int64,
            )
            keep = np.sort(np.concatenate([retained, text_pos]))
            k_img_max = k_max + 8  # pivots can exceed the exact budget
            t_keep_pad = k_img_max + t_text_bucket
            keep_padded = np.full(t_keep_pad, t_pad_full, np.int64)
            keep_padded[: len(keep)] = keep
            keep_valid = len(keep)

            next_token, (k_b, v_b), stage_b_logits = _stage_b(
                self.params, cfg, target, hidden_t, pos_full,
                jnp.asarray(keep_padded), jnp.asarray(keep_valid),
            )
            next_token.block_until_ready()
            t_prefill = time.perf_counter() - t_start

            t_max = max(t_pad_full, t_keep_pad) + max_new_tokens
            nl = cfg.text.num_hidden_layers

            def pad_t(x, t_now):
                return jnp.pad(
                    x, ((0, 0), (0, 0), (0, t_max - t_now), (0, 0), (0, 0))
                )

            cache = lm_mod.KVCache(
                k=jnp.concatenate([pad_t(k_a, t_pad_full), pad_t(k_b, t_keep_pad)]),
                v=jnp.concatenate([pad_t(v_a, t_pad_full), pad_t(v_b, t_keep_pad)]),
                length=jnp.concatenate([
                    jnp.full((target, 1), t_orig, jnp.int32),
                    jnp.full((nl - target, 1), keep_valid, jnp.int32),
                ]),
            )
            # map retained sequence positions back to vision-token indices
            pos_to_vis = {int(p): j for j, p in enumerate(image_pos)}
            sel_vis = np.asarray(
                sorted(pos_to_vis[int(p)] for p in retained), np.int64
            )
            if _defer_decode:
                return PrefillState(
                    cache=cache, next_token=int(next_token),
                    start_pos=t_orig + int(rope_delta),
                    eos_token_ids=tuple(eos_token_ids),
                    max_new_tokens=max_new_tokens,
                    result=GenerationResult(
                        tokens=[], selected_indices=sel_vis,
                        num_vision_tokens=n, prefill_len=keep_valid,
                        prefill_seconds=t_prefill,
                    ),
                    t_start=t_start,
                    logits=stage_b_logits,
                    rope_delta=int(rope_delta),
                )
            presence = None
            if repetition_penalty != 1.0:
                presence, next_token = _rep_penalty_setup(
                    cfg.text.vocab_size, input_ids, stage_b_logits,
                    next_token, repetition_penalty, temperature, top_p,
                    top_k, seed)
            tokens = _run_decode_loop(
                self.params, cfg, cache, next_token,
                t_orig + rope_delta, eos_token_ids, max_new_tokens,
                temperature, top_p, seed, on_chunk=on_token_chunk,
                top_k=top_k, repetition_penalty=repetition_penalty,
                presence=presence,
            )
            return GenerationResult(
                tokens=tokens,
                selected_indices=sel_vis,
                num_vision_tokens=n,
                prefill_len=keep_valid,
                prefill_seconds=t_prefill,
                total_seconds=time.perf_counter() - t_start,
            )

        if self.strategy is not None:
            # Training-free baseline: ViT (+ stats) -> host strategy -> prefill.
            merged, attn_recv, keys = _vision_stats(
                self.params, cfg,
                jnp.asarray(vb.pixel_values), jnp.asarray(vb.rot_pos_ids),
                jnp.asarray(vb.window_seg_ids), jnp.asarray(vb.full_seg_ids),
                jnp.asarray(vb.reverse_index),
                jnp.asarray(vb.window_kv_bounds),
                jnp.asarray(vb.full_kv_bounds),
                window_diag=vb.window_diag,
                window_kv_iters=vb.window_kv_iters,
                full_kv_iters=vb.full_kv_iters,
            )
            merged_np = np.asarray(merged)[:n]
            attn_np = np.asarray(attn_recv)[:n] if self.strategy.needs_stats else None
            keys_np = np.asarray(keys)[:n] if self.strategy.needs_stats else None
            idx_np, new_embeds = self.strategy(
                merged_np, attn_np, keys_np, self.budget, grid_thw
            )
            idx_np = np.asarray(idx_np, np.int64)[:k_max]
            k = len(idx_np)
            vision_embeds = np.asarray(merged)
            if new_embeds is not None:
                vision_embeds = vision_embeds.copy()
                vision_embeds[idx_np] = np.asarray(new_embeds, vision_embeds.dtype)[:k]
            idx_padded = np.full(k_max, l_pad, np.int64)
            idx_padded[:k] = idx_np
            valid_mask = np.arange(k_max) < k

            next_token, valid_len, (k_l, v_l), last_logits = \
                _prefill_from_vision(
                    self.params, cfg, jnp.asarray(vision_embeds),
                    jnp.asarray(idx_padded), jnp.asarray(valid_mask),
                    jnp.asarray(k), jnp.asarray(input_ids),
                    jnp.asarray(image_pos_padded),
                    jnp.asarray(text_pos_padded),
                    jnp.asarray(num_text), jnp.asarray(position_ids),
                )
            sel_idx, sel_valid = jnp.asarray(idx_padded), jnp.asarray(valid_mask)
        else:
            (next_token, sel_idx, sel_valid, sel_scores, valid_len,
             (k_l, v_l), last_logits) = _prefill(
                self.params, cfg, k_max, self.use_selector,
                jnp.asarray(vb.pixel_values), jnp.asarray(vb.rot_pos_ids),
                jnp.asarray(vb.window_seg_ids), jnp.asarray(vb.full_seg_ids),
                jnp.asarray(vb.reverse_index), jnp.asarray(n), jnp.asarray(k),
                jnp.asarray(input_ids), jnp.asarray(image_pos_padded),
                jnp.asarray(text_pos_padded), jnp.asarray(num_text),
                jnp.asarray(position_ids),
                jnp.asarray(vb.window_kv_bounds),
                jnp.asarray(vb.full_kv_bounds),
                window_diag=vb.window_diag,
                window_kv_iters=vb.window_kv_iters,
                full_kv_iters=vb.full_kv_iters,
            )
        next_token.block_until_ready()
        t_prefill = time.perf_counter() - t_start

        valid_len_i = int(valid_len)
        t_comp = k_max + t_text_bucket
        t_max = t_comp + max_new_tokens
        cache = lm_mod.KVCache(
            k=jnp.pad(k_l, ((0, 0), (0, 0), (0, t_max - t_comp), (0, 0), (0, 0))),
            v=jnp.pad(v_l, ((0, 0), (0, 0), (0, t_max - t_comp), (0, 0), (0, 0))),
            length=jnp.full(
                (cfg.text.num_hidden_layers, 1), valid_len_i, jnp.int32
            ),
        )

        sel_idx_np = np.asarray(sel_idx)
        sel_valid_np = np.asarray(sel_valid)
        compressed = self.use_selector or self.strategy is not None
        if _defer_decode:  # see generate_batch

            return PrefillState(
                cache=cache, next_token=int(next_token),
                start_pos=valid_len_i + int(rope_delta),
                eos_token_ids=tuple(eos_token_ids),
                max_new_tokens=max_new_tokens,
                result=GenerationResult(
                    tokens=[],
                    scores=(np.asarray(sel_scores)[:n]
                            if self.use_selector else None),
                    selected_indices=(
                        sel_idx_np[sel_valid_np] if compressed else None
                    ),
                    num_vision_tokens=n,
                    prefill_len=valid_len_i,
                    prefill_seconds=t_prefill,
                ),
                t_start=t_start,
                logits=last_logits,
                rope_delta=int(rope_delta),
            )
        presence = None
        if repetition_penalty != 1.0:
            presence, next_token = _rep_penalty_setup(
                cfg.text.vocab_size, input_ids, last_logits, next_token,
                repetition_penalty, temperature, top_p, top_k, seed)
        tokens = _run_decode_loop(
            self.params, cfg, cache, next_token,
            valid_len_i + rope_delta, eos_token_ids, max_new_tokens,
            temperature, top_p, seed, on_chunk=on_token_chunk,
            top_k=top_k, repetition_penalty=repetition_penalty,
            presence=presence,
        )

        return GenerationResult(
            tokens=tokens,
            scores=(np.asarray(sel_scores)[:n] if self.use_selector else None),
            selected_indices=(
                sel_idx_np[sel_valid_np] if compressed else None
            ),
            num_vision_tokens=n,
            prefill_len=valid_len_i,
            prefill_seconds=t_prefill,
            total_seconds=time.perf_counter() - t_start,
        )

    def start_chunked_prefill(
        self,
        input_ids,
        pixel_values=None,
        grid_thw=None,
        pixel_values_videos=None,
        video_grid_thw=None,
        second_per_grid_ts=None,
        max_new_tokens: int = 64,
        eos_token_ids: Optional[Tuple[int, ...]] = None,
        prefill_chunk: int = 256,
        vit_segments: int = 0,
    ) -> Optional["ChunkedPrefill"]:
        """Begin a segmented admission prefill (see ``ChunkedPrefill``).

        With ``vit_segments`` <= 1: runs ONE vision+compaction dispatch
        (``_vision_compact``) and returns the state machine whose
        ``step()`` feeds ``prefill_chunk`` compacted tokens through the
        decoder per call. With ``vit_segments`` > 1 the vision tower ITSELF
        runs segmented — ``step()`` first advances depth/vit_segments tower
        layers at a time, then the merger+selection+compaction epilogue,
        then the LM segments; for large images the tower is the dominant
        un-chunkable dispatch otherwise. Returns None when the request is
        not eligible — strategy baselines (their capture stages are fused)
        and text-only requests (their prefill is already cheap) fall back
        to the fused one-shot path."""
        import time

        cfg = self.cfg
        if self.strategy is not None:
            return None
        if pixel_values is None and pixel_values_videos is None:
            return None
        if eos_token_ids is None:
            eos_token_ids = (cfg.eos_token_id,)
        input_ids = np.asarray(input_ids).reshape(-1)
        t_start = time.perf_counter()

        img_grid = grid_thw if pixel_values is not None else None
        vid_grid = video_grid_thw if pixel_values_videos is not None else None
        if pixel_values is not None and pixel_values_videos is not None:
            pixel_values = np.concatenate([pixel_values, pixel_values_videos])
            grid_thw = np.concatenate([grid_thw, video_grid_thw])
        elif pixel_values_videos is not None:
            pixel_values = pixel_values_videos
            grid_thw = video_grid_thw

        p = self._prep_vision(
            input_ids, pixel_values, grid_thw, img_grid, vid_grid,
            second_per_grid_ts,
        )
        vb = p.vb
        seg = max(1, int(prefill_chunk))
        # static segment-aligned capacity: padding happens INSIDE the
        # program, the per-request cache allocates once — admission costs
        # exactly one dispatch + one scalar fetch before the first segment
        t_comp = p.k_max + p.t_text_bucket
        t_cap = -(-t_comp // seg) * seg
        if vit_segments > 1:
            # segmented tower: no dispatch here; step() drives the phases
            result = GenerationResult(
                tokens=[], scores=None, selected_indices=None,
                num_vision_tokens=p.n, prefill_len=0,
            )
            depth = cfg.vision.depth
            vit = dict(
                x=jnp.asarray(vb.pixel_values),
                rot_pos_ids=jnp.asarray(vb.rot_pos_ids),
                window_seg_ids=jnp.asarray(vb.window_seg_ids),
                full_seg_ids=jnp.asarray(vb.full_seg_ids),
                reverse_index=jnp.asarray(vb.reverse_index),
                window_kv_bounds=jnp.asarray(vb.window_kv_bounds),
                full_kv_bounds=jnp.asarray(vb.full_kv_bounds),
                window_diag=vb.window_diag,
                window_kv_iters=vb.window_kv_iters,
                full_kv_iters=vb.full_kv_iters,
                num_merged=jnp.asarray(p.n), k=jnp.asarray(p.k),
                input_ids=jnp.asarray(input_ids),
                image_positions=jnp.asarray(p.image_pos_padded),
                text_positions=jnp.asarray(p.text_pos_padded),
                num_text=jnp.asarray(p.num_text),
                position_ids_orig=jnp.asarray(p.position_ids),
                k_max=p.k_max, t_cap=t_cap,
                lo=0, group=max(1, -(-depth // int(vit_segments))),
            )
            return ChunkedPrefill(
                engine=self, seg=seg, eos_token_ids=tuple(eos_token_ids),
                max_new_tokens=max_new_tokens,
                rope_delta=int(p.rope_delta), result=result,
                t_start=t_start, _vit=vit,
            )
        comp, selection = _vision_compact(
            self.params, cfg, p.k_max, self.use_selector,
            jnp.asarray(vb.pixel_values), jnp.asarray(vb.rot_pos_ids),
            jnp.asarray(vb.window_seg_ids), jnp.asarray(vb.full_seg_ids),
            jnp.asarray(vb.reverse_index), jnp.asarray(p.n),
            jnp.asarray(p.k), jnp.asarray(input_ids),
            jnp.asarray(p.image_pos_padded), jnp.asarray(p.text_pos_padded),
            jnp.asarray(p.num_text), jnp.asarray(p.position_ids),
            jnp.asarray(vb.window_kv_bounds), jnp.asarray(vb.full_kv_bounds),
            window_diag=vb.window_diag,
            window_kv_iters=vb.window_kv_iters,
            full_kv_iters=vb.full_kv_iters,
            pad_to=t_cap,
        )
        cache = lm_mod.init_kv_cache(cfg.text, 1, t_cap, comp.embeds.dtype)
        valid_len = int(comp.valid_len)  # the ONE host sync
        n_seg = -(-valid_len // seg)

        # selection arrays are fetched lazily in finish() — each blocking
        # device->host read is a tunnel round trip on the admission path
        result = GenerationResult(
            tokens=[], scores=None, selected_indices=None,
            num_vision_tokens=p.n, prefill_len=valid_len,
        )
        return ChunkedPrefill(
            engine=self, embeds=comp.embeds, position_ids=comp.position_ids,
            cache=cache, valid_len=valid_len, seg=seg, n_seg=n_seg,
            eos_token_ids=tuple(eos_token_ids),
            max_new_tokens=max_new_tokens,
            rope_delta=int(p.rope_delta), result=result, t_start=t_start,
            selection=selection if self.use_selector else None,
        )

    def generate_batch(
        self,
        requests: List[dict],
        max_new_tokens: int = 64,
        eos_token_ids: Optional[Tuple[int, ...]] = None,
        temperature: float = 0.0,
        top_p: float = 1.0,
        seed: int = 0,
        top_k: int = 0,
        repetition_penalty: float = 1.0,
    ) -> List[GenerationResult]:
        """Decode-batched generation: prefill each request through the
        bucketed single-sample programs (mirroring the reference's batch=1
        prefill), then join ALL requests into ONE batched decode dispatch.

        Decode is LM-weight-bandwidth-bound, so a size-B micro-batch
        amortizes the per-step HBM weight stream ~B-fold — the TPU-native
        serving-throughput lever the reference (sequential CUDA decode)
        doesn't have. Mixed request shapes batch fine: per-layer/per-row
        cache lengths cover selector, orig, ViT-side and FastV/DART
        (LLM-side) prefills, and text-only requests.

        Each request is a dict of ``generate`` kwargs (input_ids,
        pixel_values, grid_thw, ...).
        """
        return run_generate_batch(
            self, requests, max_new_tokens=max_new_tokens,
            eos_token_ids=eos_token_ids, temperature=temperature,
            top_p=top_p, seed=seed, top_k=top_k,
            repetition_penalty=repetition_penalty,
        )


@functools.partial(jax.jit, static_argnames=("cfg", "c_max"))
def _score_chunk(params, cache, cont_padded, cont_len, pos_start,
                 ctx_logits, cfg: VLConfig, c_max: int):
    """ll/is_greedy of one continuation given a PREFILLED cache plus the
    context's last-row logits: one chunked decode forward instead of a full
    re-prefill per choice. The returned (mutated-copy) cache is discarded by
    the caller — not donated, so the shared context cache stays valid across
    choices. Continuation positions follow the decode convention (exactly
    what generated tokens would receive)."""
    ids = cont_padded.astype(jnp.int32)
    embeds = lm_mod.embed_tokens(params["lm"], ids)[None]
    pos = pos_start + jnp.arange(c_max)
    pos3 = jnp.broadcast_to(pos[None, None, :], (3, 1, c_max))
    hidden, _cache = lm_mod.lm_decode_chunk(
        params["lm"], cache, embeds, pos3, cfg.text
    )
    rows = lm_mod.lm_head(params["lm"], hidden[0], cfg.text)  # [c_max, V]

    lp_ctx = jax.nn.log_softmax(ctx_logits.astype(jnp.float32))
    ll = lp_ctx[ids[0]]
    greedy = jnp.argmax(ctx_logits) == ids[0]
    # token j >= 1 is predicted by chunk row j-1
    lp_rows = jax.nn.log_softmax(rows.astype(jnp.float32), axis=-1)
    tok_lp = jnp.take_along_axis(lp_rows[:-1], ids[1:, None], axis=-1)[:, 0]
    tail_valid = jnp.arange(1, c_max) < cont_len
    ll = ll + jnp.sum(jnp.where(tail_valid, tok_lp, 0.0))
    greedy = greedy & jnp.all(jnp.where(
        tail_valid, jnp.argmax(rows[:-1], axis=-1) == ids[1:], True))
    return ll, greedy


def run_loglikelihood_choices(
    engine,
    input_ids: np.ndarray,
    choices_ids: List[np.ndarray],
    **gen_kwargs,
) -> List[Tuple[float, bool]]:
    """Score several continuations of ONE context with a single prefill:
    the (vision-heavy) context prefills once, then each choice costs one
    tiny chunked forward — an N-choice MC doc is ~N x cheaper than the
    per-pair ``engine.loglikelihood``. Works for any engine supporting
    ``_defer_decode`` (selector/orig/text paths).

    On uncompressed paths this equals per-pair loglikelihood exactly; under
    compression, continuation positions follow the decode convention (the
    positions generated tokens would receive), whereas the full-prefill path
    numbers positions on the original sequence — rankings are consistent
    either way."""
    assert getattr(engine, "strategy", None) is None, (
        "loglikelihood supports selector/orig paths only"
    )
    from visionselector_tpu.models.qwen25vl.model import (
        ll_continuation_arrays,
    )

    prepped = [ll_continuation_arrays(c) for c in choices_ids]
    c_max = max(p[2] for p in prepped)
    state = engine.generate(
        np.asarray(input_ids), max_new_tokens=c_max + 1,
        eos_token_ids=(-1,), _defer_decode=True, **gen_kwargs,
    )
    assert state.logits is not None
    out = []
    for padded, c, _cm in prepped:
        padded_u = np.zeros(c_max, np.int64)
        padded_u[: len(padded)] = padded
        ll, greedy = _score_chunk(
            engine.params, state.cache, jnp.asarray(padded_u),
            jnp.asarray(c), jnp.asarray(state.start_pos, jnp.int32),
            state.logits, engine.cfg, c_max,
        )
        out.append((float(ll), bool(greedy)))
    return out


def _prompt_lookup(ctx: list, n: int, m: int) -> list:
    """Prompt-lookup proposal: find the most recent EARLIER occurrence of
    the context's final n-gram and return the m tokens that followed it
    (padded to exactly m). VQA/summarization answers echo prompt spans, so
    the greedy verifier accepts multi-token runs for the price of ~one
    decode step. Returns [0]*m when no match (step then emits 1 token)."""
    pad = [0] * m
    if len(ctx) <= n:
        return pad
    tail = ctx[-n:]
    for i in range(len(ctx) - n - 1, -1, -1):
        if ctx[i:i + n] == tail:
            cont = ctx[i + n:i + n + m]
            if cont:
                return cont + [0] * (m - len(cont))
    return pad


@functools.partial(jax.jit, static_argnames=("cfg", "m"), donate_argnums=(1,))
def _spec_verify(params, cache, cur, props, pos_start, cfg: VLConfig,
                 m: int):
    """One speculative step: consume [cur, props...] in one chunked forward,
    return (greedy [m+1], accepted-proposal count a, cache rolled back over
    the rejected suffix). Emits greedy[:a+1] — decode is weight-bound, so
    the extra rows are nearly free (lm_mod.lm_decode_chunk)."""
    ids = jnp.concatenate([cur[None], props]).astype(jnp.int32)  # [m+1]
    embeds = lm_mod.embed_tokens(params["lm"], ids)[None]
    pos = pos_start + jnp.arange(m + 1)
    pos3 = jnp.broadcast_to(pos[None, None, :], (3, 1, m + 1))
    hidden, cache = lm_mod.lm_decode_chunk(
        params["lm"], cache, embeds, pos3, cfg.text
    )
    logits = lm_mod.lm_head(params["lm"], hidden[0], cfg.text)  # [m+1, V]
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    eq = props.astype(jnp.int32) == greedy[:m]
    a = jnp.where(jnp.all(eq), m, jnp.argmin(eq)).astype(jnp.int32)
    # keep kv only for [cur] + the a accepted proposals
    cache = lm_mod.KVCache(k=cache.k, v=cache.v,
                           length=cache.length - (m - a))
    return greedy, a, cache


def _nucleus_probs(logits: jax.Array, temperature: jax.Array,
                   top_p: jax.Array, top_k=0) -> jax.Array:
    """Row-wise top-k/nucleus-truncated sampling distribution over the vocab.

    Identical semantics to ``_sample_token``'s sampling branch (top-k cut,
    then the smallest sorted prefix of the renormalized distribution whose
    mass reaches top_p, renormalize), expressed as an explicit distribution
    so speculative acceptance can evaluate per-token probabilities.
    [R, V] -> [R, V] float32, rows sum to 1. ``top_k`` <= 0 disables it."""
    temp = jnp.maximum(temperature, 1e-6)
    probs = jax.nn.softmax(logits.astype(jnp.float32) / temp, axis=-1)
    sort_idx = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, sort_idx, axis=-1)
    v = probs.shape[-1]
    k_eff = jnp.where(jnp.asarray(top_k) <= 0, v, top_k)
    kmask = jnp.arange(v)[None, :] < k_eff
    sp = jnp.where(kmask, sorted_probs, 0.0)
    z = jnp.sum(sp, axis=-1, keepdims=True)
    cum = jnp.cumsum(sp, axis=-1)
    keep = ((cum - sp) < top_p * z) & kmask  # always keeps the top token
    kept = jnp.where(keep, sp, 0.0)
    kept = kept / jnp.sum(kept, axis=-1, keepdims=True)
    rows = jnp.arange(probs.shape[0])[:, None]
    return jnp.zeros_like(kept).at[rows, sort_idx].set(kept)


def _spec_accept(probs: jax.Array, props: jax.Array, key: jax.Array):
    """Speculative-sampling acceptance for a DETERMINISTIC (point-mass)
    draft (Leviathan et al. 2023, specialized to q = delta_{props[i]}).

    probs: [m+1, V] target distributions (row i conditions on the first i
    proposals all having been accepted); props: [m] drafted tokens.
    Accept draft i with prob p_i(props[i]); at the first rejection a,
    resample from the residual norm(max(p_a - q_a, 0)) — which for a point
    mass is p_a with the draft token's entry zeroed. If all m accepted, the
    bonus token samples from p_m directly. Returns (emitted [m+1] — only
    [:a+1] is meaningful — and a). The marginal law of each emitted token
    is exactly the target distribution, so outputs are distributed
    identically to the plain autoregressive sampler."""
    m = props.shape[0]
    ku, kr = jax.random.split(key)
    u = jax.random.uniform(ku, (m,))
    p_draft = probs[jnp.arange(m), props]
    rej = u >= p_draft
    a = jnp.where(jnp.any(rej), jnp.argmax(rej), m).astype(jnp.int32)
    row = probs[a]
    # residual when a < m (all-accepted bonus row keeps p_m untouched);
    # p(draft)=1 rows always accept, so the residual can't be all-zero
    zeroed = row.at[props[jnp.minimum(a, m - 1)]].set(0.0)
    row = jnp.where(a < m, zeroed, row)
    t_a = jax.random.categorical(kr, jnp.log(row + 1e-20)).astype(jnp.int32)
    emitted = jnp.concatenate(
        [props.astype(jnp.int32), jnp.zeros((1,), jnp.int32)])
    emitted = emitted.at[a].set(t_a)
    return emitted, a


@functools.partial(jax.jit, static_argnames=("cfg", "m"), donate_argnums=(1,))
def _spec_verify_sampled(params, cache, cur, props, pos_start, key,
                         temperature, top_p, cfg: VLConfig, m: int,
                         top_k=0):
    """Sampled-output speculative step: same chunked verify forward as
    ``_spec_verify``, but acceptance follows the speculative-sampling rule
    (``_spec_accept``) so emitted tokens are distributed EXACTLY as the
    plain nucleus sampler's — not merely greedy-identical. Returns
    (emitted [m+1], accepted count a, rolled-back cache, next rng key)."""
    ids = jnp.concatenate([cur[None], props]).astype(jnp.int32)  # [m+1]
    embeds = lm_mod.embed_tokens(params["lm"], ids)[None]
    pos = pos_start + jnp.arange(m + 1)
    pos3 = jnp.broadcast_to(pos[None, None, :], (3, 1, m + 1))
    hidden, cache = lm_mod.lm_decode_chunk(
        params["lm"], cache, embeds, pos3, cfg.text
    )
    logits = lm_mod.lm_head(params["lm"], hidden[0], cfg.text)  # [m+1, V]
    probs = _nucleus_probs(logits, temperature, top_p, top_k)
    key, k_acc = jax.random.split(key)
    emitted, a = _spec_accept(probs, props, k_acc)
    cache = lm_mod.KVCache(k=cache.k, v=cache.v,
                           length=cache.length - (m - a))
    return emitted, a, cache, key


def generate_speculative(
    engine,
    input_ids: np.ndarray,
    pixel_values: Optional[np.ndarray] = None,
    grid_thw: Optional[np.ndarray] = None,
    max_new_tokens: int = 64,
    eos_token_ids: Optional[Tuple[int, ...]] = None,
    propose_len: int = 7,
    ngram: int = 3,
    temperature: float = 0.0,
    top_p: float = 1.0,
    seed: int = 0,
    top_k: int = 0,
    repetition_penalty: float = 1.0,
    **gen_kwargs,
) -> "GenerationResult":
    """Generation with prompt-lookup speculative decoding.

    Prefill runs exactly as ``engine.generate`` (any engine supporting
    ``_defer_decode``: Qwen + OV, selector/orig/baselines); the decode loop
    then verifies ``propose_len`` prompt-lookup proposals per chunked
    forward, emitting 1..propose_len+1 tokens per weight-stream pass.

    temperature == 0 (default): greedy outputs are IDENTICAL to
    ``engine.generate`` by construction (accepted tokens are exactly the
    greedy continuations). temperature > 0: the speculative-sampling
    acceptance rule (``_spec_accept``) makes every emitted token's marginal
    law EXACTLY the nucleus sampler's — same distribution as
    ``engine.generate(temperature=..., top_p=...)``, different draws."""
    import time

    sampling = temperature is not None and temperature > 0.0
    if repetition_penalty != 1.0:
        # chunk-parallel verify cannot apply the stateful penalty (row i's
        # logits would need presence updated by rows < i within the same
        # forward) — run the plain decode loop, which supports it exactly
        return engine.generate(
            input_ids, pixel_values, grid_thw,
            max_new_tokens=max_new_tokens, eos_token_ids=eos_token_ids,
            temperature=temperature, top_p=top_p, seed=seed, top_k=top_k,
            repetition_penalty=repetition_penalty, **gen_kwargs,
        )
    state = engine.generate(
        input_ids, pixel_values, grid_thw,
        max_new_tokens=max_new_tokens, eos_token_ids=eos_token_ids,
        _defer_decode=True, **gen_kwargs,
    )
    cfg = engine.cfg
    m = propose_len
    eos = set(state.eos_token_ids)
    key = jax.random.PRNGKey(seed)
    if sampling:
        if state.logits is None:
            # strategy paths defer without the last logits row: the first
            # token can't be resampled, so run the plain sampled decode loop
            return engine.generate(
                input_ids, pixel_values, grid_thw,
                max_new_tokens=max_new_tokens, eos_token_ids=eos_token_ids,
                temperature=temperature, top_p=top_p, seed=seed,
                top_k=top_k, **gen_kwargs,
            )
        key, k0 = jax.random.split(key)
        first = int(_sample_token(
            state.logits, k0, jnp.asarray(temperature, jnp.float32),
            jnp.asarray(top_p, jnp.float32), jnp.asarray(top_k, jnp.int32)))
    else:
        first = state.next_token
    base = state.result
    if first in eos:
        return GenerationResult(
            tokens=[], scores=base.scores,
            selected_indices=base.selected_indices,
            num_vision_tokens=base.num_vision_tokens,
            prefill_len=base.prefill_len,
            prefill_seconds=base.prefill_seconds,
            total_seconds=time.perf_counter() - state.t_start,
        )

    # headroom: one chunk may overshoot the per-token budget by up to m rows
    cache = state.cache
    cache = lm_mod.KVCache(
        k=jnp.pad(cache.k, ((0, 0), (0, 0), (0, m + 1), (0, 0), (0, 0))),
        v=jnp.pad(cache.v, ((0, 0), (0, 0), (0, m + 1), (0, 0), (0, 0))),
        length=cache.length,
    )
    out = [first]
    ctx = list(map(int, np.asarray(input_ids).reshape(-1))) + [first]
    pos = state.start_pos
    cur = jnp.asarray(first, jnp.int32)
    steps = 0
    proposed = accepted = 0
    temp_j = jnp.asarray(temperature or 0.0, jnp.float32)
    top_p_j = jnp.asarray(top_p, jnp.float32)
    while len(out) < max_new_tokens:
        props = _prompt_lookup(ctx, ngram, m)
        if sampling:
            emitted, a, cache, key = _spec_verify_sampled(
                engine.params, cache, cur, jnp.asarray(props, jnp.int32),
                jnp.asarray(pos, jnp.int32), key, temp_j, top_p_j, cfg, m,
                top_k=jnp.asarray(top_k, jnp.int32),
            )
        else:
            emitted, a, cache = _spec_verify(
                engine.params, cache, cur, jnp.asarray(props, jnp.int32),
                jnp.asarray(pos, jnp.int32), cfg, m,
            )
        a_i = int(a)
        new = np.asarray(emitted)[: a_i + 1].tolist()
        steps += 1
        proposed += m
        accepted += a_i
        stop = False
        kept = 0
        for t in new:
            if t in eos or len(out) >= max_new_tokens:
                stop = True
                break
            out.append(t)
            ctx.append(t)
            kept += 1
        if stop:
            break
        cur = jnp.asarray(new[-1], jnp.int32)
        pos += a_i + 1
    return GenerationResult(
        tokens=out,
        scores=base.scores,
        selected_indices=base.selected_indices,
        num_vision_tokens=base.num_vision_tokens,
        prefill_len=base.prefill_len,
        prefill_seconds=base.prefill_seconds,
        total_seconds=time.perf_counter() - state.t_start,
        decode_dispatches=steps,
        spec_proposed=proposed,
        spec_accepted=accepted,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "c"))
def _append_chunk(params, cache, ids_padded, n_valid, pos_start,
                  cfg: VLConfig, c: int):
    """Consume ``n_valid`` new text tokens (padded to static length ``c``)
    against the cache in one chunked forward; returns (next_token, cache).

    Padding rows write garbage kv ABOVE the rolled-back length, which the
    next append overwrites — within the chunk they sit after the real rows,
    so no real row ever attends one (chunk_decode_attention's causal
    bound). NOT donated: the caller's ChatSession keeps referencing its old
    cache (error recovery / conversation branching), so donating the input
    buffers would invalidate a still-live session."""
    embeds = lm_mod.embed_tokens(params["lm"], ids_padded.astype(jnp.int32))
    pos = pos_start + jnp.arange(c)
    pos3 = jnp.broadcast_to(pos[None, None, :], (3, 1, c))
    hidden, cache = lm_mod.lm_decode_chunk(
        params["lm"], cache, embeds[None], pos3, cfg.text
    )
    last = jax.lax.dynamic_index_in_dim(hidden[0], n_valid - 1, axis=0,
                                        keepdims=False)
    logits = lm_mod.lm_head(params["lm"], last, cfg.text)
    next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    cache = lm_mod.KVCache(k=cache.k, v=cache.v,
                           length=cache.length - (c - n_valid))
    return next_token, cache


@dataclasses.dataclass
class ChatSession:
    """Multi-turn decoding state: the KV cache survives across turns, so a
    follow-up question costs one chunked append + decode instead of a full
    re-prefill of the (vision-heavy) conversation — a serving capability the
    reference's stateless per-request pipeline lacks."""

    cache: "lm_mod.KVCache"
    pos: int  # next rope position
    pending: int  # last emitted, not-yet-consumed token (eos of the turn)
    eos_token_ids: Tuple[int, ...]


def _ensure_capacity(cache, need: int):
    t_now = cache.k.shape[2]
    if t_now >= need:
        return cache
    pad = ((0, 0), (0, 0), (0, need - t_now), (0, 0), (0, 0))
    return lm_mod.KVCache(
        k=jnp.pad(cache.k, pad), v=jnp.pad(cache.v, pad),
        length=cache.length,
    )


def start_chat_session(
    engine,
    input_ids: np.ndarray,
    pixel_values: Optional[np.ndarray] = None,
    grid_thw: Optional[np.ndarray] = None,
    max_new_tokens: int = 64,
    eos_token_ids: Optional[Tuple[int, ...]] = None,
    temperature: float = 0.0,
    top_p: float = 1.0,
    seed: int = 0,
    top_k: int = 0,
    **gen_kwargs,
) -> Tuple["GenerationResult", ChatSession]:
    """First turn: normal (compressed) prefill + decode, but the KV cache
    is kept and returned as a ChatSession for follow-up turns. Sampling is
    per-turn: a sampled first turn consumes the same key stream as
    ``engine.generate(temperature, seed)`` (identical rollout)."""
    import time

    state = engine.generate(
        input_ids, pixel_values, grid_thw, max_new_tokens=max_new_tokens,
        eos_token_ids=eos_token_ids, _defer_decode=True, **gen_kwargs,
    )
    cfg = engine.cfg
    eos = tuple(state.eos_token_ids)
    first = state.next_token
    base = state.result
    if first in eos:
        sess = ChatSession(cache=state.cache, pos=state.start_pos,
                           pending=first, eos_token_ids=eos)
        return dataclasses.replace(
            base, tokens=[], total_seconds=time.perf_counter() - state.t_start
        ), sess
    eos_arr = jnp.asarray(list(eos), jnp.int32)
    toks, count, cache, last, _ = _decode_loop(
        engine.params, cfg, state.cache, jnp.asarray(first, jnp.int32),
        jnp.asarray(state.start_pos, jnp.int32), eos_arr,
        max_new_tokens - 1,
        jnp.asarray(temperature, jnp.float32), jnp.asarray(top_p,
                                                           jnp.float32),
        jax.random.PRNGKey(seed), jnp.asarray(top_k, jnp.int32),
    )
    n = int(count)
    tokens = [first] + np.asarray(toks)[:n].tolist()
    last_i = int(last)
    consumed = n + (1 if last_i in eos else 0)
    sess = ChatSession(
        cache=cache, pos=state.start_pos + consumed, pending=last_i,
        eos_token_ids=eos,
    )
    return dataclasses.replace(
        base, tokens=tokens,
        total_seconds=time.perf_counter() - state.t_start,
    ), sess


def continue_chat_session(
    engine,
    sess: ChatSession,
    new_ids: np.ndarray,
    max_new_tokens: int = 64,
    temperature: float = 0.0,
    top_p: float = 1.0,
    seed: int = 0,
    top_k: int = 0,
) -> Tuple["GenerationResult", ChatSession]:
    """Follow-up turn: append [pending eos + new turn tokens] through ONE
    chunked forward (static 32-multiple chunk; kv of padding rows rolled
    back), then decode. No vision re-encode, no prompt re-prefill.
    Sampling is per-turn (fresh PRNGKey(seed) each turn; vary the seed
    across turns for independent draws)."""
    import time

    t_start = time.perf_counter()
    cfg = engine.cfg
    new_ids = np.asarray(new_ids).reshape(-1)
    chunk = np.concatenate([[sess.pending], new_ids]).astype(np.int64)
    n = len(chunk)
    c = max(32, -(-n // 32) * 32)
    ids_padded = np.zeros(c, np.int64)
    ids_padded[:n] = chunk
    need = int(np.asarray(sess.cache.length).max()) + c + max_new_tokens + 1
    cache = _ensure_capacity(sess.cache, need)
    t0 = time.perf_counter()
    next_token, cache = _append_chunk(
        engine.params, cache, jnp.asarray(ids_padded), jnp.asarray(n),
        jnp.asarray(sess.pos, jnp.int32), cfg, c,
    )
    next_token.block_until_ready()
    t_prefill = time.perf_counter() - t0
    pos = sess.pos + n
    first = int(next_token)
    eos = sess.eos_token_ids
    if first in eos:
        new_sess = ChatSession(cache=cache, pos=pos, pending=first,
                               eos_token_ids=eos)
        return GenerationResult(
            tokens=[], selected_indices=None, num_vision_tokens=0,
            prefill_len=n, prefill_seconds=t_prefill,
            total_seconds=time.perf_counter() - t_start,
        ), new_sess
    eos_arr = jnp.asarray(list(eos), jnp.int32)
    toks, count, cache, last, _ = _decode_loop(
        engine.params, cfg, cache, next_token,
        jnp.asarray(pos, jnp.int32), eos_arr, max_new_tokens - 1,
        jnp.asarray(temperature, jnp.float32), jnp.asarray(top_p,
                                                           jnp.float32),
        jax.random.PRNGKey(seed), jnp.asarray(top_k, jnp.int32),
    )
    k = int(count)
    tokens = [first] + np.asarray(toks)[:k].tolist()
    last_i = int(last)
    consumed = k + (1 if last_i in eos else 0)
    new_sess = ChatSession(cache=cache, pos=pos + consumed, pending=last_i,
                           eos_token_ids=eos)
    return GenerationResult(
        tokens=tokens, selected_indices=None, num_vision_tokens=0,
        prefill_len=n, prefill_seconds=t_prefill,
        total_seconds=time.perf_counter() - t_start,
    ), new_sess


@dataclasses.dataclass
class PrefixEntry:
    """One stored post-prefill snapshot for cross-request KV reuse."""

    sig: Optional[str]  # image signature (None = text-only prompt)
    ids: np.ndarray  # full stored prompt tokens
    vis_end: int  # ids index after the last vision span (0 = none)
    cache: "lm_mod.KVCache"  # per-layer lengths at end of prompt
    pos: int  # next rope position at end of prompt
    result: "GenerationResult"  # prefill metadata (indices, counts, time)
    # original-prompt rope delta: trailing text at ids index i has rope
    # position i + delta (NOT pos-relative — under compression ``pos`` is
    # compacted-length based while kept rows keep original positions)
    delta: int = 0


class PrefixCacheStore:
    """Cross-request KV prefix cache (LRU, host-orchestrated).

    Requests that share an (image, prompt-prefix) pair — the serving
    pattern of a fixed system prompt + image asked several questions, or
    repeated identical requests — skip re-prefilling the shared prefix:
    the stored cache is rolled back to the common prefix and only the
    suffix runs, through the same chunked-append program chat sessions use.

    Correctness under token compression: vision tokens are compacted, so
    ids positions map 1:1 to kv rows only AFTER the last vision span
    (``vis_end``). A hit therefore requires the common prefix to cover
    every vision token; the rolled-back trailing tokens are all text, so
    per-layer cache lengths shift by exactly the rollback count (this
    also holds for per-layer-length baselines like FastV: a text row
    lands in every layer). Rope positions do NOT track compacted lengths:
    kept rows keep their ORIGINAL positions, so re-appended suffix tokens
    take original-index positions (``consumed + delta``) while decode
    continues at compacted_len + delta — both exactly as a fresh
    compressed prefill assigns them. The stored snapshot is
    never donated — ``_append_chunk`` is non-donating and returns a fresh
    buffer, which is what the donating decode loop then consumes.

    Distinct from ``ChatSession``: sessions extend ONE conversation's
    cache across turns; this store serves MANY independent requests that
    happen to share a prefix (the reference's pipeline re-prefills every
    request from scratch: ``token_compression/selector_model.py:270``).
    Not thread-safe on its own — call under the server's engine lock."""

    def __init__(self, max_entries: int = 4, min_prefix: int = 32):
        import collections

        self.entries: "collections.OrderedDict[int, PrefixEntry]" = (
            collections.OrderedDict())
        self.max_entries = max_entries
        self.min_prefix = min_prefix
        self.hits = 0
        self.misses = 0
        self._next_id = 0

    @staticmethod
    def signature(pixel_values, grid_thw) -> Optional[str]:
        import hashlib

        if pixel_values is None:
            return None
        h = hashlib.sha1()
        h.update(np.ascontiguousarray(pixel_values).tobytes())
        if grid_thw is not None:
            h.update(np.ascontiguousarray(grid_thw).tobytes())
        return h.hexdigest()

    def lookup(self, sig, ids: np.ndarray, exact_only: bool = False):
        """Longest usable (entry, consumed) for a new prompt, or None.

        ``consumed`` is capped at len(ids)-1 so at least one token always
        goes through the append chunk — that recomputes the next-token
        logits, so an exact full-prompt hit needs no stored logits row.
        ``exact_only`` restricts to whole-prompt repeats (used for
        text-dependent pruning strategies like FastV/DART, whose selection
        would differ under a different question — the LIS selector and the
        uncompressed path score vision tokens only, so divergent-suffix
        reuse is exact for them)."""
        best, best_consumed = None, 0
        for key, e in self.entries.items():
            if e.sig != sig:
                continue
            if exact_only and (len(e.ids) != len(ids)
                               or not (e.ids == ids).all()):
                continue
            n = min(len(e.ids), len(ids))
            neq = np.nonzero(e.ids[:n] != ids[:n])[0]
            j = int(neq[0]) if len(neq) else n
            consumed = min(j, len(ids) - 1)
            if consumed < max(e.vis_end, 1, self.min_prefix):
                continue
            if consumed > best_consumed:
                best, best_consumed = (key, e), consumed
        if best is None:
            return None
        key, e = best
        self.entries.move_to_end(key)
        return e, best_consumed

    def insert(self, entry: PrefixEntry):
        # skip duplicates of an already-stored prompt (repeat requests)
        for e in self.entries.values():
            if (e.sig == entry.sig and len(e.ids) == len(entry.ids)
                    and (e.ids == entry.ids).all()):
                return
        self.entries[self._next_id] = entry
        self._next_id += 1
        while len(self.entries) > self.max_entries:
            self.entries.popitem(last=False)


def _vision_span_end(ids: np.ndarray, cfg) -> int:
    ends = np.nonzero(ids == cfg.vision_end_token_id)[0]
    return int(ends[-1]) + 1 if len(ends) else 0


def prefix_cached_prefill(
    engine,
    store: PrefixCacheStore,
    input_ids: np.ndarray,
    pixel_values: Optional[np.ndarray] = None,
    grid_thw: Optional[np.ndarray] = None,
    max_new_tokens: int = 64,
    eos_token_ids: Optional[Tuple[int, ...]] = None,
    **gen_kwargs,
) -> "PrefillState":
    """Prefill through the cross-request KV prefix cache; returns a
    PrefillState whose cache is safe to donate downstream (the stored
    snapshot is never aliased into it).

    Miss: normal (compressed) prefill; the post-prefill cache is
    snapshotted into ``store`` and a copy returned. Hit: the stored cache
    rolls back to the common prefix and ONLY the suffix tokens run one
    chunked append — the vision encode and shared-text prefill are
    skipped; the append's output is already a fresh buffer."""
    import time

    input_ids = np.asarray(input_ids).reshape(-1)
    sig = PrefixCacheStore.signature(pixel_values, grid_thw)
    hit = store.lookup(
        sig, input_ids,
        exact_only=getattr(engine, "strategy", None) is not None)

    if hit is None:
        store.misses += 1
        state = engine.generate(
            input_ids, pixel_values, grid_thw,
            max_new_tokens=max_new_tokens, eos_token_ids=eos_token_ids,
            _defer_decode=True, **gen_kwargs,
        )
        store.insert(PrefixEntry(
            sig=sig, ids=input_ids.copy(),
            vis_end=_vision_span_end(input_ids, engine.cfg),
            cache=state.cache, pos=state.start_pos, result=state.result,
            delta=state.rope_delta,
        ))
        # downstream decode donates its cache: hand out a copy so the
        # stored snapshot survives
        cache = lm_mod.KVCache(k=jnp.copy(state.cache.k),
                               v=jnp.copy(state.cache.v),
                               length=jnp.copy(state.cache.length))
        return dataclasses.replace(state, cache=cache)

    store.hits += 1
    t_start = time.perf_counter()
    entry, consumed = hit
    cfg = engine.cfg
    d = len(entry.ids) - consumed  # trailing text tokens to roll back
    suffix = input_ids[consumed:]
    n = len(suffix)
    c = max(32, -(-n // 32) * 32)
    ids_padded = np.zeros(c, np.int64)
    ids_padded[:n] = suffix
    rolled = lm_mod.KVCache(k=entry.cache.k, v=entry.cache.v,
                            length=entry.cache.length - d)
    need = int(np.asarray(rolled.length).max()) + c + max_new_tokens + 1
    cache = _ensure_capacity(rolled, need)
    # the appended suffix tokens are trailing text of the ORIGINAL prompt:
    # their rope positions are consumed+delta .. (original-index based, same
    # as the fresh prefill gives them) — NOT entry.pos - d, which under
    # compression is compacted-length based and would rotate the appended
    # keys to the wrong angles (greedy usually survives the small logit
    # shift; sampled rollouts diverge)
    append_pos = consumed + entry.delta
    t0 = time.perf_counter()
    next_token, cache = _append_chunk(
        engine.params, cache, jnp.asarray(ids_padded), jnp.asarray(n),
        jnp.asarray(append_pos, jnp.int32), cfg, c,
    )
    next_token.block_until_ready()
    t_prefill = time.perf_counter() - t0
    eos = tuple(eos_token_ids) if eos_token_ids is not None else (
        cfg.eos_token_id,)
    base = dataclasses.replace(
        entry.result, tokens=[],
        prefill_len=entry.result.prefill_len - d + n,
        prefill_seconds=t_prefill)
    # decode continues at compacted_len + delta (reference semantics):
    # the compacted length of the new prompt is the stored one - d + n
    return PrefillState(
        cache=cache, next_token=int(next_token),
        start_pos=entry.pos - d + n,
        eos_token_ids=eos, max_new_tokens=max_new_tokens, result=base,
        t_start=t_start, rope_delta=entry.delta,
    )


def generate_prefix_cached(
    engine,
    store: PrefixCacheStore,
    input_ids: np.ndarray,
    pixel_values: Optional[np.ndarray] = None,
    grid_thw: Optional[np.ndarray] = None,
    max_new_tokens: int = 64,
    eos_token_ids: Optional[Tuple[int, ...]] = None,
    temperature: float = 0.0,
    top_p: float = 1.0,
    seed: int = 0,
    top_k: int = 0,
    repetition_penalty: float = 1.0,
    **gen_kwargs,
) -> "GenerationResult":
    """Generation through a cross-request KV prefix cache — greedy outputs
    are identical to a fresh full prefill (pinned by tests), and the
    sampled path consumes the same per-step key splits as
    ``engine.generate(temperature=..., seed=...)``, so a cache hit's
    sampled rollout equals the fresh rollout for the same seed. See
    ``prefix_cached_prefill`` for the hit/miss mechanics.

    ``repetition_penalty != 1.0`` bypasses the store (the hit path's
    re-appended suffix does not expose the last-row logits the penalized
    first token needs): outputs stay exactly ``engine.generate``'s."""
    import time

    if repetition_penalty != 1.0:
        return engine.generate(
            input_ids, pixel_values, grid_thw,
            max_new_tokens=max_new_tokens, eos_token_ids=eos_token_ids,
            temperature=temperature, top_p=top_p, seed=seed, top_k=top_k,
            repetition_penalty=repetition_penalty, **gen_kwargs,
        )
    state = prefix_cached_prefill(
        engine, store, input_ids, pixel_values, grid_thw,
        max_new_tokens=max_new_tokens, eos_token_ids=eos_token_ids,
        **gen_kwargs,
    )
    eos = tuple(state.eos_token_ids)
    tokens = _run_decode_loop(
        engine.params, engine.cfg, state.cache,
        jnp.asarray(state.next_token, jnp.int32), state.start_pos, eos,
        max_new_tokens, temperature, top_p, seed, top_k=top_k,
    )
    return dataclasses.replace(
        state.result, tokens=tokens,
        total_seconds=time.perf_counter() - state.t_start)


@functools.partial(jax.jit, static_argnames=("t_all",))
def _assemble_batch_cache(ks, vs, lens, t_all: int):
    """One dispatch for the whole pad+concat cache assembly (module-level so
    the jit cache hits across run_generate_batch calls of the same shape)."""

    def pad_t(x):
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, t_all - x.shape[2]), (0, 0), (0, 0))
        )

    return lm_mod.KVCache(
        k=jnp.concatenate([pad_t(x) for x in ks], axis=1),
        v=jnp.concatenate([pad_t(x) for x in vs], axis=1),
        length=jnp.concatenate(list(lens), axis=1),
    )


def run_generate_batch(
    engine,
    requests: List[dict],
    max_new_tokens: int = 64,
    eos_token_ids: Optional[Tuple[int, ...]] = None,
    temperature: float = 0.0,
    top_p: float = 1.0,
    seed: int = 0,
    top_k: int = 0,
    repetition_penalty: float = 1.0,
) -> List[GenerationResult]:
    """Family-agnostic decode batching over an engine whose ``generate``
    supports ``_defer_decode`` (QwenVLEngine, OVEngine)."""
    import time

    if not requests:
        return []
    states: List[PrefillState] = [
        engine.generate(
            **req, max_new_tokens=max_new_tokens,
            eos_token_ids=eos_token_ids, temperature=temperature,
            top_p=top_p, seed=seed, _defer_decode=True,
        )
        for req in requests
    ]
    if repetition_penalty != 1.0:
        # per-row presence from each request's prompt; penalized first
        # tokens from each prefill's last-row logits (HF semantics)
        vocab = engine.cfg.text.vocab_size
        pres_rows, firsts_pen = [], []
        for req, s in zip(requests, states):
            pres, first = _rep_penalty_setup(
                vocab, req["input_ids"], s.logits, s.next_token,
                repetition_penalty, temperature, top_p, top_k, seed)
            pres_rows.append(np.asarray(pres))
            firsts_pen.append(first)
        for s, f in zip(states, firsts_pen):
            s.next_token = f
    eos = states[0].eos_token_ids
    assert all(s.eos_token_ids == eos for s in states)

    t_all = max(s.cache.k.shape[2] for s in states)

    # Pad the batch axis to the next power of two: the decode loop compiles
    # per (B, T) shape, and a server's micro-batches arrive in arbitrary
    # sizes — padding caps the program count at log2(max_batch). Padding
    # rows replay the last request (their outputs are dropped).
    n = len(states)
    b_pad = 1
    while b_pad < n:
        b_pad *= 2
    pad_states = states + [states[-1]] * (b_pad - n)
    presence = None
    if repetition_penalty != 1.0:
        pres_np = np.stack(
            pres_rows + [pres_rows[-1]] * (b_pad - n))  # [b_pad, V]
        presence = jnp.asarray(pres_np)

    cache = _assemble_batch_cache(
        tuple(s.cache.k for s in pad_states),
        tuple(s.cache.v for s in pad_states),
        tuple(s.cache.length for s in pad_states),
        t_all=t_all,
    )
    firsts = jnp.asarray([s.next_token for s in pad_states], jnp.int32)
    starts = jnp.asarray([s.start_pos for s in pad_states], jnp.int32)
    eos_arr = jnp.asarray(list(eos), jnp.int32)

    results = []
    t_dec0 = time.perf_counter()
    if max_new_tokens > 1:
        toks, counts = _decode_loop_batch(
            engine.params, engine.cfg, cache, firsts, starts, eos_arr,
            max_new_tokens - 1, jnp.asarray(temperature, jnp.float32),
            jnp.asarray(top_p, jnp.float32), jax.random.PRNGKey(seed),
            jnp.asarray(top_k, jnp.int32),
            jnp.asarray(repetition_penalty, jnp.float32), presence,
        )
        toks = np.asarray(toks)
        counts = np.asarray(counts)
    else:
        toks = np.zeros((0, len(states)), np.int32)
        counts = np.zeros(len(states), np.int64)
    t_decode = time.perf_counter() - t_dec0
    for i, s in enumerate(states):
        if s.next_token in eos:
            s.result.tokens = []  # mirror _run_decode_loop
        else:
            s.result.tokens = (
                [s.next_token] + toks[: int(counts[i]), i].tolist()
            )
        # per-request latency = own prefill + the shared decode dispatch
        # (comparable to the sequential path; wall time since a request's own
        # t_start would charge it every LATER request's prefill too)
        s.result.total_seconds = s.result.prefill_seconds + t_decode
        results.append(s.result)
    return results
