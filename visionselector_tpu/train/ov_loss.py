"""LLaVA-OneVision-1.5 selector training forward + loss.

Parity with the OV soft-mask training path
(``llava-ov-15/compression_method/selector_model.py:56-366``:
``llavaov15_vision_tower_forward_selector`` -> soft top-k mask multiply ->
``llavaov15_generation_forward_selector`` CE + reg_weight * BCE at :354-358)
and the OV curriculum trainer (``src/train/train_sft_visionselector.py:32-63``,
reg weight 0.1 -> 3.0). Reuses the shared loss pieces and the Qwen3-flagged
decoder; only the vision tower differs (RICE with CLS insert/strip).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from visionselector_tpu.core.config import OVConfig
from visionselector_tpu.models.llava_ov15 import rice as rice_mod
from visionselector_tpu.models.qwen25vl import lm as lm_mod
from visionselector_tpu.selector.select import select_soft
from visionselector_tpu.train.loss import bce, cross_entropy


class OVTrainSample(NamedTuple):
    pixel_values: jax.Array  # [S_pad, patch_dim]
    rot_pos_ids: jax.Array  # [S_pad, 2]
    insert_map: jax.Array  # [S'_pad]
    strip_map: jax.Array  # [S_pad]
    vit_seg_ids: jax.Array  # [S'_pad]
    num_merged: jax.Array  # scalar
    k: jax.Array  # scalar
    input_ids: jax.Array  # [T_pad]
    labels: jax.Array  # [T_pad]
    position_ids: jax.Array  # [3, T_pad] (1D rope: all axes equal)
    seg_ids: jax.Array  # [T_pad]
    image_positions: jax.Array  # [L_pad]


def ov_selector_train_forward(
    params: dict,
    sample: OVTrainSample,
    cfg: OVConfig,
    reg_weight: jax.Array,
    k_max: int,
    remat: bool = False,
) -> Tuple[jax.Array, dict]:
    merged = rice_mod.rice_forward(
        params["visual"], sample.pixel_values, sample.rot_pos_ids,
        sample.insert_map, sample.strip_map, sample.vit_seg_ids, cfg.vision,
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
    logits = lm_mod.lm_head(params["lm"], hidden[0], cfg.text)

    ce = cross_entropy(logits[:-1], sample.labels[1:])
    n = soft.soft_mask.shape[0]
    row_ok = (jnp.arange(n) < sample.num_merged).astype(jnp.float32)
    constraint = bce(soft.soft_mask, soft.hard_mask, row_ok)
    loss = ce + reg_weight * constraint
    return loss, {
        "ce": ce,
        "bce": constraint,
        "soft_mass": (soft.soft_mask * row_ok).sum(),
    }


def ov_forward_logits(
    params: dict,
    sample: OVTrainSample,
    cfg: OVConfig,
    remat: bool = False,
) -> jax.Array:
    """Uncompressed OV forward to logits [T_pad, V]: RICE tower -> scatter
    ALL merged tokens (no selector mask) -> decoder -> lm_head. The OV
    counterpart of ``train/sft.py:sft_forward_logits``; shared by the
    DPO/GRPO log-prob scorers for ``--family llava_ov15``."""
    merged = rice_mod.rice_forward(
        params["visual"], sample.pixel_values, sample.rot_pos_ids,
        sample.insert_map, sample.strip_map, sample.vit_seg_ids, cfg.vision,
    )  # [L_pad, D]

    text_embeds = lm_mod.embed_tokens(params["lm"], sample.input_ids)
    t_pad, d = text_embeds.shape
    full = jnp.zeros((t_pad + 1, d), text_embeds.dtype)
    full = full.at[:t_pad].set(text_embeds)
    full = full.at[sample.image_positions].set(
        merged.astype(text_embeds.dtype)
    )
    embeds = full[:t_pad]

    hidden, _ = lm_mod.lm_prefill(
        params["lm"], embeds[None], sample.position_ids[:, None, :],
        sample.seg_ids[None], cfg.text, remat=remat,
    )
    return lm_mod.lm_head(params["lm"], hidden[0], cfg.text)


def build_ov_sample_from_record(cfg: OVConfig, record: dict, budget: float,
                                s_bucket: int, t_bucket: int,
                                min_pixels: int = 56 * 56,
                                max_pixels: int = 28 * 28 * 1280) -> "OVTrainSample":
    """Dataset record -> OVTrainSample (OV SFT parity:
    ``llava-ov-15/src/dataset/sft_dataset.py`` — same chat-templated
    ids/labels as the Qwen path, 1D rope, RICE vision batch)."""
    import numpy as np

    from visionselector_tpu.preprocess.image import preprocess_image
    from visionselector_tpu.train.loss import IGNORE_INDEX

    ids = list(record["ids"])
    labels = list(record["labels"])
    slot = record["image_slot"]
    assert record["image"] is not None and slot >= 0, "text-only packing TBD"

    pixels, grid = preprocess_image(
        record["image"], min_pixels=min_pixels, max_pixels=max_pixels,
        patch_size=cfg.vision.patch_size,
        temporal_patch_size=cfg.vision.temporal_patch_size,
        merge_size=cfg.vision.spatial_merge_size,
    )
    rb = rice_mod.build_rice_batch(
        pixels, grid, spatial_merge_size=cfg.vision.spatial_merge_size,
        pad_to=s_bucket, cls_slots=max(len(grid), 4),
    )
    n = rb.num_merged
    l_pad = s_bucket // cfg.vision.spatial_merge_unit

    vision_ids = (
        [cfg.vision_start_token_id] + [cfg.image_token_id] * n
        + [cfg.vision_end_token_id]
    )
    full_ids = np.asarray(ids[:slot] + vision_ids + ids[slot:], np.int64)
    full_labels = np.asarray(
        labels[:slot] + [IGNORE_INDEX] * len(vision_ids) + labels[slot:],
        np.int64,
    )
    t_real = len(full_ids)
    assert t_real <= t_bucket, (t_real, t_bucket)

    ids_p = np.zeros(t_bucket, np.int64)
    ids_p[:t_real] = full_ids
    lab_p = np.full(t_bucket, IGNORE_INDEX, np.int64)
    lab_p[:t_real] = full_labels
    pos_p = np.zeros((3, t_bucket), np.int64)
    pos_p[:, :t_real] = np.tile(np.arange(t_real), (3, 1))
    seg = np.zeros(t_bucket, np.int32)
    seg[:t_real] = 1
    image_pos = np.where(ids_p == cfg.image_token_id)[0][:n]
    image_pos_p = np.full(l_pad, t_bucket, np.int64)
    image_pos_p[:n] = image_pos

    return OVTrainSample(
        pixel_values=rb.pixel_values,
        rot_pos_ids=rb.rot_pos_ids,
        insert_map=rb.insert_map,
        strip_map=rb.strip_map,
        vit_seg_ids=rb.seg_ids,
        num_merged=np.asarray(n, np.int32),
        k=np.asarray(max(1, int(n * budget)), np.int32),
        input_ids=ids_p,
        labels=lab_p,
        position_ids=pos_p,
        seg_ids=seg,
        image_positions=image_pos_p,
    )


def build_ov_train_sample(cfg: OVConfig, image, prompt_before, prompt_after,
                          answer_ids, budget: float, s_bucket: int,
                          t_bucket: int, min_pixels: int = 1,
                          max_pixels: int = 10**9) -> OVTrainSample:
    """Host assembly of one OV training sample."""
    import numpy as np

    from visionselector_tpu.preprocess.image import preprocess_image
    from visionselector_tpu.preprocess.rope import expand_vision_tokens
    from visionselector_tpu.train.loss import IGNORE_INDEX

    pixels, grid = preprocess_image(
        image, min_pixels=min_pixels, max_pixels=max_pixels,
        patch_size=cfg.vision.patch_size,
        temporal_patch_size=cfg.vision.temporal_patch_size,
        merge_size=cfg.vision.spatial_merge_size,
    )
    rb = rice_mod.build_rice_batch(
        pixels, grid, spatial_merge_size=cfg.vision.spatial_merge_size,
        pad_to=s_bucket, cls_slots=max(len(grid), 4),
    )
    n = rb.num_merged
    l_pad = s_bucket // cfg.vision.spatial_merge_unit

    prompt_ids = expand_vision_tokens(
        list(prompt_before), list(prompt_after), grid,
        spatial_merge_size=cfg.vision.spatial_merge_size,
        image_token_id=cfg.image_token_id,
        vision_start_token_id=cfg.vision_start_token_id,
        vision_end_token_id=cfg.vision_end_token_id,
    )
    ids = np.concatenate([prompt_ids, np.asarray(answer_ids, np.int64)])
    t_real = len(ids)
    assert t_real <= t_bucket

    ids_p = np.zeros(t_bucket, np.int64)
    ids_p[:t_real] = ids
    lab_p = np.full(t_bucket, IGNORE_INDEX, np.int64)
    lab_p[len(prompt_ids): t_real] = answer_ids
    pos_p = np.zeros((3, t_bucket), np.int64)
    pos_p[:, :t_real] = np.tile(np.arange(t_real), (3, 1))  # 1D rope
    seg = np.zeros(t_bucket, np.int32)
    seg[:t_real] = 1
    image_pos = np.where(ids_p == cfg.image_token_id)[0][:n]
    image_pos_p = np.full(l_pad, t_bucket, np.int64)
    image_pos_p[:n] = image_pos

    return OVTrainSample(
        pixel_values=rb.pixel_values,
        rot_pos_ids=rb.rot_pos_ids,
        insert_map=rb.insert_map,
        strip_map=rb.strip_map,
        vit_seg_ids=rb.seg_ids,
        num_merged=np.asarray(n, np.int32),
        k=np.asarray(max(1, int(n * budget)), np.int32),
        input_ids=ids_p,
        labels=lab_p,
        position_ids=pos_p,
        seg_ids=seg,
        image_positions=image_pos_p,
    )
