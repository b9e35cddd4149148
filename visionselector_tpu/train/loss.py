"""Training forward + composite loss for the LIS selector.

Semantics follow the reference training path
(``qwen-vl-finetune/compression_method/selector_model.py:101-326``):

- vision tower -> soft sigmoid top-k mask MULTIPLIES merged tokens (no
  dropping: static shapes — which on TPU is exactly what we want anyway),
- masked vision embeds scattered into the text sequence at image positions,
- loss = CE(shifted logits, labels) + reg_weight * BCE(soft_mask, hard_mask)
  (``selector_model.py:292-313``), labels == -100 ignored,
- reg_weight is annealed linearly by the trainer (``train_qwen_selector.py:60-92``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from visionselector_tpu.core.config import VLConfig
from visionselector_tpu.models.qwen25vl import lm as lm_mod
from visionselector_tpu.models.qwen25vl import vit as vit_mod
from visionselector_tpu.selector.select import select_soft

IGNORE_INDEX = -100


class TrainBatchSample(NamedTuple):
    """One statically-shaped training sample (vmap over a leading batch dim).

    Vision arrays are bucket-padded; text arrays padded to T_pad with seg 0.
    """

    pixel_values: jax.Array  # [S_pad, patch_dim]
    rot_pos_ids: jax.Array  # [S_pad, 2]
    window_seg_ids: jax.Array  # [S_pad]
    full_seg_ids: jax.Array  # [S_pad]
    reverse_index: jax.Array  # [L_pad]
    num_merged: jax.Array  # scalar
    k: jax.Array  # scalar: int(N * budget)
    input_ids: jax.Array  # [T_pad]
    labels: jax.Array  # [T_pad], IGNORE_INDEX outside supervised positions
    position_ids: jax.Array  # [3, T_pad]
    seg_ids: jax.Array  # [T_pad] int32, 0 = padding (packing-ready)
    image_positions: jax.Array  # [L_pad] sentinel-padded positions in sequence
    window_kv_bounds: jax.Array  # [num_q_blocks, 2] Pallas block-skip ranges
    full_kv_bounds: jax.Array  # [num_q_blocks, 2]


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over non-ignored positions. logits [T, V] fp32, labels [T]."""
    valid = labels != IGNORE_INDEX
    safe = jnp.where(valid, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
    nll = (logz - gold) * valid
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def bce(p: jax.Array, y: jax.Array, valid: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Masked-mean binary cross entropy (torch F.binary_cross_entropy)."""
    p = jnp.clip(p, eps, 1.0 - eps)
    per = -(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))
    return (per * valid).sum() / jnp.maximum(valid.sum(), 1)


def selector_train_forward(
    params: dict,
    sample: TrainBatchSample,
    cfg: VLConfig,
    reg_weight: jax.Array,
    k_max: int,
    remat: bool = False,
) -> tuple[jax.Array, dict]:
    """One sample's composite loss. Returns (loss, metrics dict)."""
    merged = vit_mod.vit_forward(
        params["visual"], sample.pixel_values, sample.rot_pos_ids,
        sample.window_seg_ids, sample.full_seg_ids, sample.reverse_index,
        cfg.vision,
        window_kv_bounds=sample.window_kv_bounds,
        full_kv_bounds=sample.full_kv_bounds,
    )  # [L_pad, D]

    soft = select_soft(
        params["scorer"], merged, sample.num_merged, sample.k, k_max
    )

    text_embeds = lm_mod.embed_tokens(params["lm"], sample.input_ids)
    t_pad, d = text_embeds.shape
    full = jnp.zeros((t_pad + 1, d), text_embeds.dtype)
    full = full.at[:t_pad].set(text_embeds)
    full = full.at[sample.image_positions].set(
        soft.masked_tokens.astype(text_embeds.dtype)
    )
    embeds = full[:t_pad]

    hidden, _ = lm_mod.lm_prefill(
        params["lm"], embeds[None], sample.position_ids[:, None, :],
        sample.seg_ids[None], cfg.text, remat=remat,
    )
    logits = lm_mod.lm_head(params["lm"], hidden[0], cfg.text)  # [T, V] fp32

    ce = cross_entropy(logits[:-1], sample.labels[1:])
    n = soft.soft_mask.shape[0]
    row_ok = (jnp.arange(n) < sample.num_merged).astype(jnp.float32)
    constraint = bce(soft.soft_mask, soft.hard_mask, row_ok)
    loss = ce + reg_weight * constraint
    soft_k = (soft.soft_mask * row_ok).sum()
    return loss, {"ce": ce, "bce": constraint, "soft_mass": soft_k}


def reg_weight_schedule(
    step: jax.Array, total_steps: int, start: float = 0.1, end: float = 2.0
) -> jax.Array:
    """Linear curriculum annealing (``train_qwen_selector.py:66-82``)."""
    frac = jnp.clip(step.astype(jnp.float32) / max(total_steps, 1), 0.0, 1.0)
    return start + (end - start) * frac
