"""Token selection: hard top-k compaction (inference) and soft masking (train).

Inference semantics follow
``qwen-evaluation/token_compression/selector_model.py:183-254``:
  scores -> topk(k).indices -> ascending sort -> gather kept vision tokens;
  the LLM sequence is physically compacted to text ∪ kept-vision positions and
  M-RoPE position ids are computed on the ORIGINAL sequence then gathered.

TPU design: all shapes are static. ``k`` is a dynamic scalar bounded by a
static ``k_max``; unselected slots receive a beyond-range sentinel index that
sorts to the end, so the compacted sequence is always a *valid prefix* —
downstream attention masks a prefix length instead of a scatter mask, and the
KV cache stays dense.

Training semantics follow
``qwen-vl-finetune/compression_method/selector_model.py:158-172``: soft
sigmoid mask multiplies hidden states (no dropping — shapes static by nature),
plus a no-grad hard top-k 0/1 mask as the BCE constraint target.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from visionselector_tpu.kernels.topk import (
    hard_topk_indices,
    hard_topk_mask,
    soft_topk,
)
from visionselector_tpu.selector.scorer import score_tokens


class Selection(NamedTuple):
    """Result of hard top-k selection over merged vision tokens."""

    indices: jax.Array  # [k_max] int32 ascending; invalid slots = N_pad sentinel
    valid: jax.Array  # [k_max] bool
    scores: jax.Array  # [N_pad] fp32 raw scores
    k: jax.Array  # scalar int32: number of kept tokens


def select_hard(
    scorer_params: dict,
    merged_tokens: jax.Array,
    num_valid: jax.Array,
    k: jax.Array,
    k_max: int,
) -> Selection:
    """Score (on detached tokens — ``selector_model.py:185``) and hard-select.

    Args:
        merged_tokens: [N_pad, D] merged vision tokens (padding rows at end).
        num_valid: scalar int — real token count N.
        k: scalar int — number to keep (host computes max(1, int(N * budget))).
        k_max: static bound for k.
    """
    scores = score_tokens(
        scorer_params, jax.lax.stop_gradient(merged_tokens), valid_len=num_valid
    )
    idx, valid = hard_topk_indices(scores, k, k_max, valid_len=num_valid)
    return Selection(indices=idx, valid=valid, scores=scores, k=jnp.asarray(k))


class SoftSelection(NamedTuple):
    masked_tokens: jax.Array  # [N_pad, D] tokens * soft mask
    soft_mask: jax.Array  # [N_pad] fp32, sums to k over valid rows
    hard_mask: jax.Array  # [N_pad] fp32 0/1 no-grad constraint target


def select_soft(
    scorer_params: dict,
    merged_tokens: jax.Array,
    num_valid: jax.Array,
    k: jax.Array,
    k_max: int,
) -> SoftSelection:
    """Differentiable selection for training: multiply by sigmoid mask.

    Valid rows only participate in the bisection (padding scores pushed to
    -inf would break it, so padding is excluded by masking the scores to a very
    negative but finite value — its sigmoid mass is ~0).
    """
    scores = score_tokens(scorer_params, merged_tokens, valid_len=num_valid)
    n = scores.shape[0]
    row_ok = jnp.arange(n) < num_valid
    # Finite floor keeps the bisection bracket sane while giving padding ~zero
    # soft mass.
    masked_scores = jnp.where(row_ok, scores, -1e4)
    soft = soft_topk(masked_scores[None], k)[0] * row_ok
    hard = hard_topk_mask(jax.lax.stop_gradient(scores), k, k_max, valid_len=num_valid)
    masked_tokens = (merged_tokens * soft[:, None]).astype(merged_tokens.dtype)
    return SoftSelection(masked_tokens=masked_tokens, soft_mask=soft, hard_mask=hard)


class CompactedSequence(NamedTuple):
    """Physically compacted LLM input (valid-prefix layout)."""

    embeds: jax.Array  # [T_comp, D]
    position_ids: jax.Array  # [3, T_comp]
    seg_ids: jax.Array  # [T_comp] int32: 1 on the valid prefix, 0 after
    valid_len: jax.Array  # scalar int32
    selected_positions: jax.Array  # [T_comp] original-sequence positions


def compact_sequence(
    text_embeds: jax.Array,
    vision_embeds: jax.Array,
    selection: Selection,
    image_positions: jax.Array,
    text_positions: jax.Array,
    num_text: jax.Array,
    position_ids_orig: jax.Array,
) -> CompactedSequence:
    """Build the compressed LLM input sequence.

    Args:
        text_embeds: [T_orig, D] token embeddings of the original sequence.
        vision_embeds: [N_pad, D] merged ViT outputs (original order).
        selection: hard top-k result over vision tokens.
        image_positions: [N_pad] position of the j-th vision token inside the
            original sequence (sentinel T_orig for padding rows).
        text_positions: [T_text_max] positions of non-image tokens (sentinel
            T_orig for padding beyond num_text).
        num_text: scalar — real text token count.
        position_ids_orig: [3, T_orig] M-RoPE ids of the ORIGINAL sequence
            (host-computed; reference ``selector_model.py:311-319``).

    Returns a valid-prefix CompactedSequence of static length
    k_max + T_text_max.
    """
    t_orig, d = text_embeds.shape
    sentinel = t_orig

    # Positions (in the original sequence) of kept vision tokens.
    img_pos_padded = jnp.concatenate(
        [image_positions, jnp.array([sentinel], image_positions.dtype)]
    )
    retain_img_pos = jnp.where(
        selection.valid, img_pos_padded[selection.indices], sentinel
    )

    combined = jnp.concatenate([retain_img_pos, text_positions])
    selected_positions = jnp.sort(combined)  # valid ascending, sentinels last
    t_comp = selected_positions.shape[0]
    valid_len = (num_text + selection.k).astype(jnp.int32)

    # Full-sequence embedding table: text embeds with vision embeds scattered
    # into image slots (masked_scatter equivalent), then gathered.
    full = jnp.zeros((t_orig + 1, d), text_embeds.dtype)
    full = full.at[:t_orig].set(text_embeds)
    full = full.at[image_positions].set(vision_embeds.astype(text_embeds.dtype))
    # Note: padding rows of image_positions hit the sentinel row t_orig (noop).
    embeds = full[jnp.minimum(selected_positions, sentinel)]

    pos = jnp.pad(position_ids_orig, ((0, 0), (0, 1)))  # sentinel -> pos 0
    position_ids = pos[:, selected_positions]

    seg_ids = (jnp.arange(t_comp) < valid_len).astype(jnp.int32)
    return CompactedSequence(
        embeds=embeds,
        position_ids=position_ids,
        seg_ids=seg_ids,
        valid_len=valid_len,
        selected_positions=selected_positions,
    )
