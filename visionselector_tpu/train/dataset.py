"""Conversation dataset + packing for selector training.

Re-designs the reference data layer (``qwen-vl-finetune/qwenvl/data/``):

- dataset registry with ``%NN`` sampling-rate suffix parsing
  (``data/__init__.py:5-45``),
- jsonl "conversations" records -> chat-templated token ids with the
  ``<image>`` placeholder expanded to vision tokens
  (``data_qwen.py:47-140`` preprocess_qwen_2_visual),
- 3-retry + neighbor-fallback ``__getitem__`` (``data_qwen.py:325-358``),
- sequence packing: several samples share one device row with distinct
  segment ids (block-diagonal attention) — the TPU-native equivalent of the
  flattened/cu_seqlens collator (``data_qwen.py:566-637``).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from visionselector_tpu.train.loss import IGNORE_INDEX

logger = logging.getLogger(__name__)

SYSTEM_PROMPT = "You are a helpful assistant."
IM_START = "<|im_start|>"
IM_END = "<|im_end|>"


@dataclasses.dataclass
class DatasetSpec:
    name: str
    annotation_path: str
    data_path: str  # image root
    sampling_rate: float = 1.0


def parse_dataset_names(spec: str, registry: Dict[str, Dict[str, str]]) -> List[DatasetSpec]:
    """'coco%10,chartqa' -> specs with sampling rates (``data/__init__.py:27-31``)."""
    out = []
    for item in spec.split(","):
        item = item.strip()
        if not item:
            continue
        rate = 1.0
        if "%" in item:
            item, pct = item.split("%")
            rate = float(pct) / 100.0
        entry = registry[item]
        out.append(DatasetSpec(item, entry["annotation_path"],
                               entry.get("data_path", ""), rate))
    return out


def render_conversation(
    conversations: Sequence[dict],
    tokenizer,
) -> Tuple[List[int], List[int], List[int]]:
    """Chat-template a conversations list into (input_ids, labels, slots).

    Follows the Qwen chat layout used by the reference
    (``data_qwen.py:47-140``): system turn, then user/assistant turns; only
    assistant responses are supervised. Every ``<image>``/``<video>``
    placeholder position is returned as a token offset where that image's
    (video's) vision tokens are to be spliced — per-record image LISTS are
    first-class, matching the reference data layer's multi-image records
    (``data_qwen.py:233-242``).

    Returns: (ids WITHOUT vision expansion, labels aligned to ids, ascending
    offsets into ids where vision blocks should be inserted; empty for
    text-only records).
    """
    ids: List[int] = []
    labels: List[int] = []
    slots: List[int] = []

    def add(text: str, supervised: bool):
        toks = tokenizer.encode(text)
        ids.extend(toks)
        labels.extend(toks if supervised else [IGNORE_INDEX] * len(toks))

    add(f"{IM_START}system\n{SYSTEM_PROMPT}{IM_END}\n", False)
    for turn in conversations:
        role = turn.get("from", turn.get("role", "human"))
        value = turn.get("value", turn.get("content", ""))
        if role in ("human", "user"):
            add(f"{IM_START}user\n", False)
            rest = value
            while "<image>" in rest or "<video>" in rest:
                ii = rest.find("<image>")
                vi = rest.find("<video>")
                if ii < 0 or (0 <= vi < ii):
                    idx, tag = vi, "<video>"
                else:
                    idx, tag = ii, "<image>"
                add(rest[:idx], False)
                slots.append(len(ids))
                rest = rest[idx + len(tag):]
            add(f"{rest}{IM_END}\n", False)
        else:
            add(f"{IM_START}assistant\n", False)
            add(f"{value}{IM_END}\n", True)
    return ids, labels, slots


class ConversationDataset:
    """Lazy jsonl conversation dataset with retry + neighbor fallback."""

    def __init__(self, annotation_path: str, data_path: str, tokenizer,
                 sampling_rate: float = 1.0, seed: int = 0,
                 max_retries: int = 3):
        with open(annotation_path) as f:
            if annotation_path.endswith(".jsonl"):
                self.records = [json.loads(l) for l in f if l.strip()]
            else:
                self.records = json.load(f)
        if sampling_rate < 1.0:
            rng = random.Random(seed)
            keep = max(1, int(len(self.records) * sampling_rate))
            self.records = rng.sample(self.records, keep)
        self.data_path = data_path
        self.tokenizer = tokenizer
        self.max_retries = max_retries

    def __len__(self):
        return len(self.records)

    def _load(self, idx: int):
        rec = self.records[idx]
        ids, labels, slots = render_conversation(
            rec["conversations"], self.tokenizer
        )
        # "image": str | [str, ...] — per-record image lists are processed
        # image-by-image like the reference data layer (data_qwen.py:233-242)
        images = []
        img_names = rec.get("image")
        if img_names:
            from PIL import Image

            names = (img_names if isinstance(img_names, list)
                     else [img_names])
            for nm in names:
                im = Image.open(os.path.join(self.data_path, nm))
                im.load()
                images.append(im)
        video = rec.get("video")
        return {"ids": ids, "labels": labels,
                "image_slot": slots[0] if slots else -1,
                "image_slots": slots,
                "image": images[0] if images else None,
                "images": images, "id": rec.get("id", idx),
                "video": (os.path.join(self.data_path, video)
                          if video else None)}

    def __getitem__(self, idx: int):
        """3 retries then fall back to neighbor samples (``data_qwen.py:325-358``)."""
        for attempt in range(self.max_retries):
            try:
                return self._load(idx)
            except Exception as e:  # noqa: BLE001
                logger.warning("sample %d failed (try %d): %s", idx, attempt, e)
        for delta in range(1, len(self.records)):
            for j in ((idx + delta) % len(self), (idx - delta) % len(self)):
                try:
                    return self._load(j)
                except Exception:  # noqa: BLE001
                    continue
        raise RuntimeError("no loadable sample in dataset")


def build_sample_from_record(
    cfg,
    record: dict,
    budget: float,
    s_bucket: int,
    t_bucket: int,
    min_pixels: int = 56 * 56,
    max_pixels: int = 28 * 28 * 1280,
):
    """Dataset record -> TrainBatchSample (single image spliced at image_slot)."""
    import numpy as np

    from visionselector_tpu.preprocess.image import preprocess_image
    from visionselector_tpu.preprocess.indices import build_vision_batch
    from visionselector_tpu.preprocess.rope import get_rope_index
    from visionselector_tpu.train.loss import TrainBatchSample

    ids = list(record["ids"])
    labels = list(record["labels"])
    slot = record["image_slot"]
    is_video = record.get("video") is not None
    assert (record["image"] is not None or is_video) and slot >= 0, \
        "text-only packing TBD"
    images = record.get("images") or (
        [record["image"]] if record["image"] is not None else [])
    slots = record.get("image_slots") or [slot]

    spg = None
    if is_video:
        # video training record (<video> placeholder; data_qwen.py:266-285)
        from visionselector_tpu.preprocess.video import process_video

        pixels, grid, spg = process_video(
            record["video"],
            ele={"min_pixels": min_pixels, "max_pixels": max_pixels},
            patch_size=cfg.vision.patch_size,
            temporal_patch_size=cfg.vision.temporal_patch_size,
            merge_size=cfg.vision.spatial_merge_size,
        )
    else:
        # One or several images: per-image preprocessing, pixel rows
        # concatenated, one grid row each (data_qwen.py:233-242 parity);
        # vision blocks spliced at each placeholder slot below.
        assert len(images) == len(slots), (len(images), len(slots))
        px_list, g_list = [], []
        for im in images:
            px_i, g_i = preprocess_image(
                im, min_pixels=min_pixels, max_pixels=max_pixels,
                patch_size=cfg.vision.patch_size,
                temporal_patch_size=cfg.vision.temporal_patch_size,
                merge_size=cfg.vision.spatial_merge_size,
            )
            px_list.append(px_i)
            g_list.append(g_i)
        pixels = np.concatenate(px_list, axis=0)
        grid = np.concatenate(g_list, axis=0)
    vb = build_vision_batch(
        pixels, grid,
        window_size=cfg.vision.window_size,
        spatial_merge_size=cfg.vision.spatial_merge_size,
        patch_size=cfg.vision.patch_size,
        pad_to=s_bucket,
    )
    n = vb.num_merged
    l_pad = s_bucket // cfg.vision.spatial_merge_unit

    vision_token = cfg.video_token_id if is_video else cfg.image_token_id
    if is_video:
        run_lens, run_slots = [n], [slot]
    else:
        mu = cfg.vision.spatial_merge_unit
        run_lens = [px.shape[0] // mu for px in px_list]
        run_slots = list(slots)
        assert run_slots == sorted(run_slots), run_slots
    id_parts, label_parts = [], []
    prev = 0
    for sl, n_i in zip(run_slots, run_lens):
        run = ([cfg.vision_start_token_id] + [vision_token] * n_i
               + [cfg.vision_end_token_id])
        id_parts += ids[prev:sl] + run
        label_parts += labels[prev:sl] + [IGNORE_INDEX] * len(run)
        prev = sl
    full_ids = np.asarray(id_parts + ids[prev:], np.int64)
    full_labels = np.asarray(label_parts + labels[prev:], np.int64)
    t_real = len(full_ids)
    assert t_real <= t_bucket, (t_real, t_bucket)

    import numpy as _np

    position_ids, _ = get_rope_index(
        full_ids,
        image_grid_thw=None if is_video else grid,
        video_grid_thw=grid if is_video else None,
        second_per_grid_ts=_np.array([spg]) if is_video else None,
        spatial_merge_size=cfg.vision.spatial_merge_size,
        tokens_per_second=cfg.vision.tokens_per_second,
        image_token_id=cfg.image_token_id,
        video_token_id=cfg.video_token_id,
        vision_start_token_id=cfg.vision_start_token_id,
    )

    ids_p = np.zeros(t_bucket, np.int64)
    ids_p[:t_real] = full_ids
    lab_p = np.full(t_bucket, IGNORE_INDEX, np.int64)
    lab_p[:t_real] = full_labels
    pos_p = np.zeros((3, t_bucket), np.int64)
    pos_p[:, :t_real] = position_ids
    seg = np.zeros(t_bucket, np.int32)
    seg[:t_real] = 1
    image_pos = np.where(ids_p == vision_token)[0][:n]
    image_pos_p = np.full(l_pad, t_bucket, np.int64)
    image_pos_p[:n] = image_pos

    return TrainBatchSample(
        pixel_values=vb.pixel_values,
        rot_pos_ids=vb.rot_pos_ids,
        window_seg_ids=vb.window_seg_ids,
        full_seg_ids=vb.full_seg_ids,
        reverse_index=vb.reverse_index,
        num_merged=np.asarray(n, np.int32),
        k=np.asarray(max(1, int(n * budget)), np.int32),
        input_ids=ids_p,
        labels=lab_p,
        position_ids=pos_p,
        seg_ids=seg,
        image_positions=image_pos_p,
        window_kv_bounds=vb.window_kv_bounds,
        full_kv_bounds=vb.full_kv_bounds,
    )


def build_packed_train_sample(
    cfg,
    records: List[dict],
    budget: float,
    s_bucket: int,
    t_bucket: int,
    min_pixels: int = 56 * 56,
    max_pixels: int = 28 * 28 * 1280,
):
    """Pack several dataset records into ONE TrainBatchSample row.

    TPU-native equivalent of the reference's flattened collator
    (``data_qwen.py:566-637`` emitting cu_seqlens): samples get distinct
    segment ids (block-diagonal LM attention), per-sample M-RoPE ids restart
    at 0, all images ride one multi-image ViT batch, and the soft top-k runs
    jointly over the row's merged tokens with k = budget * total (matching the
    reference's joint scoring over the flattened batch).
    """
    import numpy as np

    from visionselector_tpu.preprocess.image import preprocess_image
    from visionselector_tpu.preprocess.indices import build_vision_batch
    from visionselector_tpu.preprocess.rope import get_rope_index
    from visionselector_tpu.train.loss import TrainBatchSample

    all_pixels, all_grids = [], []
    ids_parts, label_parts, pos_parts, seg_parts = [], [], [], []
    for si, rec in enumerate(records):
        assert rec["image"] is not None and rec["image_slot"] >= 0
        assert len(rec.get("images") or [rec["image"]]) == 1, (
            "packed rows splice one image per record; route multi-image "
            "records through build_sample_from_record"
        )
        pixels, grid = preprocess_image(
            rec["image"], min_pixels=min_pixels, max_pixels=max_pixels,
            patch_size=cfg.vision.patch_size,
            temporal_patch_size=cfg.vision.temporal_patch_size,
            merge_size=cfg.vision.spatial_merge_size,
        )
        all_pixels.append(pixels)
        all_grids.append(grid)
        n_i = pixels.shape[0] // cfg.vision.spatial_merge_unit
        vision_ids = (
            [cfg.vision_start_token_id] + [cfg.image_token_id] * n_i
            + [cfg.vision_end_token_id]
        )
        slot = rec["image_slot"]
        ids_i = np.asarray(
            rec["ids"][:slot] + vision_ids + rec["ids"][slot:], np.int64
        )
        labels_i = np.asarray(
            rec["labels"][:slot] + [IGNORE_INDEX] * len(vision_ids)
            + rec["labels"][slot:], np.int64,
        )
        pos_i, _ = get_rope_index(
            ids_i, image_grid_thw=grid,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            tokens_per_second=cfg.vision.tokens_per_second,
            image_token_id=cfg.image_token_id,
            video_token_id=cfg.video_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
        )
        ids_parts.append(ids_i)
        label_parts.append(labels_i)
        pos_parts.append(pos_i)
        seg_parts.append(np.full(len(ids_i), si + 1, np.int32))
        # block CE leakage across the sample boundary: the first token of a
        # sample must not be predicted from the previous sample's last token
        label_parts[-1][0] = IGNORE_INDEX

    pixels = np.concatenate(all_pixels)
    grid = np.concatenate(all_grids)
    vb = build_vision_batch(
        pixels, grid,
        window_size=cfg.vision.window_size,
        spatial_merge_size=cfg.vision.spatial_merge_size,
        patch_size=cfg.vision.patch_size,
        pad_to=s_bucket,
    )
    n = vb.num_merged
    l_pad = s_bucket // cfg.vision.spatial_merge_unit

    full_ids = np.concatenate(ids_parts)
    t_real = len(full_ids)
    assert t_real <= t_bucket, (t_real, t_bucket)

    ids_p = np.zeros(t_bucket, np.int64)
    ids_p[:t_real] = full_ids
    lab_p = np.full(t_bucket, IGNORE_INDEX, np.int64)
    lab_p[:t_real] = np.concatenate(label_parts)
    pos_p = np.zeros((3, t_bucket), np.int64)
    pos_p[:, :t_real] = np.concatenate(pos_parts, axis=1)
    seg = np.zeros(t_bucket, np.int32)
    seg[:t_real] = np.concatenate(seg_parts)
    image_pos = np.where(ids_p == cfg.image_token_id)[0][:n]
    image_pos_p = np.full(l_pad, t_bucket, np.int64)
    image_pos_p[:n] = image_pos

    return TrainBatchSample(
        pixel_values=vb.pixel_values,
        rot_pos_ids=vb.rot_pos_ids,
        window_seg_ids=vb.window_seg_ids,
        full_seg_ids=vb.full_seg_ids,
        reverse_index=vb.reverse_index,
        num_merged=np.asarray(n, np.int32),
        k=np.asarray(max(1, int(n * budget)), np.int32),
        input_ids=ids_p,
        labels=lab_p,
        position_ids=pos_p,
        seg_ids=seg,
        image_positions=image_pos_p,
        window_kv_bounds=vb.window_kv_bounds,
        full_kv_bounds=vb.full_kv_bounds,
    )


def pack_text_samples(
    samples: List[dict],
    t_bucket: int,
) -> Optional[dict]:
    """Greedy first-fit packing plan over tokenized lengths.

    Returns groups of sample indices whose total (vision-expanded) lengths fit
    ``t_bucket`` — the packed-collator equivalent
    (``data_qwen.py:566-637``, ``data_qwen_packed.py``). Actual multi-image
    packed TrainBatchSamples are produced by stacking the groups' vision
    batches; exposed for the packing-aware loader."""
    groups: List[List[int]] = []
    sizes: List[int] = []
    for i, s in enumerate(samples):
        n = len(s["ids"])
        placed = False
        for g, used in zip(groups, range(len(sizes))):
            if sizes[used] + n <= t_bucket:
                g.append(i)
                sizes[used] += n
                placed = True
                break
        if not placed:
            groups.append([i])
            sizes.append(n)
    return {"groups": groups, "sizes": sizes}
