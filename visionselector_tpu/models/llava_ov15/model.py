"""LLaVA-OneVision-1.5 end-to-end model (RICE ViT + Qwen3 text).

Inference parity with the reference OV selector path
(``llava-ov-15/compression_method/modeling_selector.py:69-352``): RICE tower
(CLS insert/strip) -> LIS scorer on merged tokens -> hard top-k -> sequence
compaction -> prefill/decode. The LM-side programs are shared with the Qwen
engine (``_prefill_from_vision`` / ``_decode`` are vision-agnostic); the text
model runs with Qwen3 flags (decoupled head_dim, q/k norm, no bias, 1D rope).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visionselector_tpu.core.config import OVConfig
from visionselector_tpu.models.llava_ov15 import rice as rice_mod
from visionselector_tpu.models.qwen25vl import lm as lm_mod
from visionselector_tpu.models.qwen25vl.model import (
    GenerationResult,
    _decode,
    _prefill_from_vision,
)
from visionselector_tpu.preprocess.indices import pick_bucket
from visionselector_tpu.selector.select import select_hard


def init_ov_params(key: jax.Array, cfg: OVConfig, with_selector: bool = True) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    dtype = cfg.jax_dtype
    params = {
        "visual": rice_mod.init_rice_params(k1, cfg.vision, dtype),
        "lm": lm_mod.init_lm_params(k2, cfg.text, dtype),
    }
    if with_selector:
        from visionselector_tpu.selector.scorer import init_scorer_params

        sel = cfg.selector or cfg.with_selector().selector
        params["scorer"] = init_scorer_params(k3, sel, jnp.float32)
    return params


@functools.partial(jax.jit, static_argnames=("cfg", "k_max", "use_selector"))
def _rice_encode_select(
    params, cfg: OVConfig, k_max: int, use_selector: bool,
    pixel_values, rot_pos_ids, insert_map, strip_map, seg_ids,
    num_merged, k,
):
    """RICE forward + (optional) LIS hard selection.

    Returns (merged [L_pad, D], indices [k_max], valid [k_max]).
    """
    merged = rice_mod.rice_forward(
        params["visual"], pixel_values, rot_pos_ids, insert_map, strip_map,
        seg_ids, cfg.vision,
    )
    n_pad = merged.shape[0]
    if use_selector:
        sel = select_hard(params["scorer"], merged, num_merged, k, k_max)
        return merged, sel.indices, sel.valid
    idx = jnp.arange(k_max, dtype=jnp.int32)
    valid = idx < num_merged
    return merged, jnp.where(valid, idx, n_pad).astype(jnp.int32), valid


@functools.partial(jax.jit, static_argnames=("cfg",))
def _rice_encode(params, cfg: OVConfig, pixel_values, rot_pos_ids,
                 insert_map, strip_map, seg_ids):
    return rice_mod.rice_forward(
        params["visual"], pixel_values, rot_pos_ids, insert_map, strip_map,
        seg_ids, cfg.vision,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _rice_encode_stats(params, cfg: OVConfig, pixel_values, rot_pos_ids,
                       insert_map, strip_map, seg_ids):
    return rice_mod.rice_forward_stats(
        params["visual"], pixel_values, rot_pos_ids, insert_map, strip_map,
        seg_ids, cfg.vision,
    )


class OVEngine:
    """Batch-1 generation engine for LLaVA-OneVision-1.5.

    ``strategy``: optional training-free baseline from ``selector.baselines``
    (overrides the LIS selector) — parity with the reference OV compression
    methods (``llava-ov-15/compression_method/{fastv,dart,visionzip,
    divprune}.py``).
    """

    def __init__(self, cfg: OVConfig, params: dict, use_selector: bool = True,
                 budget: float = 0.2, strategy=None):
        self.cfg = cfg
        self.params = params
        self.strategy = strategy
        self.use_selector = (
            strategy is None and use_selector and ("scorer" in params)
        )
        self.budget = budget

    def _prep_vision(self, input_ids, pixel_values, grid_thw, has_img,
                     is_video):
        """Host-side prep shared by ``generate`` and ``loglikelihood``:
        RICE batch assembly, k/k_max, padded position maps, 1D rope ids."""
        from types import SimpleNamespace

        cfg = self.cfg
        input_ids = np.asarray(input_ids).reshape(-1)
        t_orig = len(input_ids)
        s_real = pixel_values.shape[0]
        s_bucket = pick_bucket(s_real, [256, 512, 1024, 2048, 4096, 8192])
        merge_unit = cfg.vision.spatial_merge_unit
        rb = rice_mod.build_rice_batch(
            pixel_values, grid_thw,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            pad_to=s_bucket,
            cls_slots=max(len(grid_thw), 8),
        )
        n = rb.num_merged
        l_pad = s_bucket // merge_unit

        if self.use_selector:
            k = min(max(1, int(n * self.budget)),
                    max(1, int(l_pad * self.budget)))
            k_max = max(1, int(l_pad * self.budget))
        elif self.strategy is not None:
            k = None
            k_max = min(l_pad, int(l_pad * self.budget) + 2)
        else:
            k, k_max = n, l_pad

        is_img = input_ids == cfg.image_token_id
        is_vid = input_ids == cfg.video_token_id
        is_vision = (is_img if has_img else False) | (
            is_vid if is_video else False)
        image_pos = np.concatenate([
            np.where(is_img)[0] if has_img else [],
            np.where(is_vid)[0] if is_video else [],
        ]).astype(np.int64)
        assert len(image_pos) == n, (len(image_pos), n)
        text_pos = np.where(~is_vision)[0]
        num_text = len(text_pos)
        image_pos_padded = np.full(l_pad, t_orig, np.int64)
        image_pos_padded[:n] = image_pos
        t_text_bucket = pick_bucket(num_text, [64, 128, 256, 512, 1024])
        # round the compacted length (k_max + text bucket) to a 128 multiple
        # so the causal prefill runs block-aligned (Qwen engine parity)
        t_text_bucket += (-(k_max + t_text_bucket)) % 128
        text_pos_padded = np.full(t_text_bucket, t_orig, np.int64)
        text_pos_padded[:num_text] = text_pos

        # OV text model: plain 1D rope — all three axes share arange(T)
        # (``modeling_llavaonevision1_5.py:1167-1168``).
        position_ids = np.tile(np.arange(t_orig), (3, 1))
        return SimpleNamespace(
            rb=rb, n=n, k=k, k_max=k_max, l_pad=l_pad, s_bucket=s_bucket,
            image_pos=image_pos, text_pos=text_pos, num_text=num_text,
            image_pos_padded=image_pos_padded,
            text_pos_padded=text_pos_padded, t_text_bucket=t_text_bucket,
            position_ids=position_ids, t_orig=t_orig,
        )

    def loglikelihood(
        self,
        input_ids: np.ndarray,
        continuation_ids: np.ndarray,
        pixel_values: Optional[np.ndarray] = None,
        grid_thw: Optional[np.ndarray] = None,
        pixel_values_videos: Optional[np.ndarray] = None,
        video_grid_thw: Optional[np.ndarray] = None,
        second_per_grid_ts=None,
    ) -> Tuple[float, bool]:
        """(sum log P(continuation | context), is_greedy) — lmms model-ABC
        ``loglikelihood`` (``lmms-eval/lmms_eval/api/model.py:30-57``) for
        the OV family: RICE encode + selection in one program, compacted
        prefill + continuation scoring in a second (Qwen engine parity)."""
        if self.strategy is not None:
            raise NotImplementedError(
                "loglikelihood supports selector/orig paths only"
            )
        from visionselector_tpu.models.qwen25vl.model import (
            _prefill_from_vision_ll,
            ll_continuation_arrays,
            text_only_loglikelihood,
        )

        cfg = self.cfg
        input_ids = np.asarray(input_ids).reshape(-1)
        assert len(input_ids) > 0, "loglikelihood needs a non-empty context"
        cont_padded, c, c_max = ll_continuation_arrays(continuation_ids)
        full_ids = np.concatenate([input_ids, cont_padded[:c]])

        is_video = pixel_values_videos is not None
        has_img = pixel_values is not None
        if is_video:
            if has_img:
                pixel_values = np.concatenate(
                    [pixel_values, pixel_values_videos])
                grid_thw = np.concatenate([grid_thw, video_grid_thw])
            else:
                pixel_values = pixel_values_videos
                grid_thw = video_grid_thw

        if pixel_values is None:
            return text_only_loglikelihood(
                self.params, cfg, full_ids, cont_padded, c, c_max,
                [64, 128, 256, 512, 1024],
            )

        p = self._prep_vision(full_ids, pixel_values, grid_thw,
                              has_img, is_video)
        rb = p.rb
        merged, sel_idx, sel_valid = _rice_encode_select(
            self.params, cfg, p.k_max, self.use_selector,
            jnp.asarray(rb.pixel_values), jnp.asarray(rb.rot_pos_ids),
            jnp.asarray(rb.insert_map), jnp.asarray(rb.strip_map),
            jnp.asarray(rb.seg_ids), jnp.asarray(p.n), jnp.asarray(p.k),
        )
        ll, greedy = _prefill_from_vision_ll(
            self.params, cfg, c_max, merged, sel_idx, sel_valid,
            jnp.asarray(p.k), jnp.asarray(full_ids),
            jnp.asarray(p.image_pos_padded), jnp.asarray(p.text_pos_padded),
            jnp.asarray(p.num_text), jnp.asarray(p.position_ids),
            jnp.asarray(cont_padded), jnp.asarray(c),
        )
        return float(ll), bool(greedy)

    def generate(
        self,
        input_ids: np.ndarray,
        pixel_values: Optional[np.ndarray] = None,
        grid_thw: Optional[np.ndarray] = None,
        max_new_tokens: int = 64,
        eos_token_ids: Optional[Tuple[int, ...]] = None,
        temperature: float = 0.0,
        top_p: float = 1.0,
        seed: int = 0,
        on_token_chunk=None,
        pixel_values_videos: Optional[np.ndarray] = None,
        video_grid_thw: Optional[np.ndarray] = None,
        second_per_grid_ts=None,  # accepted for adapter parity; OV is 1D rope
        _defer_decode: bool = False,
        top_k: int = 0,
        repetition_penalty: float = 1.0,
    ) -> GenerationResult:
        import time

        cfg = self.cfg
        is_video = pixel_values_videos is not None
        has_img = pixel_values is not None
        if is_video:
            # video = per-frame grid rows through the same RICE path (the OV
            # text model uses 1D rope, so no temporal rope scaling applies);
            # mixed requests concatenate image grids first, then video grids
            # (matching the merged-order -> sequence map below).
            if has_img:
                pixel_values = np.concatenate(
                    [pixel_values, pixel_values_videos])
                grid_thw = np.concatenate([grid_thw, video_grid_thw])
            else:
                pixel_values = pixel_values_videos
                grid_thw = video_grid_thw
        if eos_token_ids is None:
            eos_token_ids = (cfg.eos_token_id,)
        input_ids = np.asarray(input_ids).reshape(-1)
        t_orig = len(input_ids)
        t_start = time.perf_counter()

        if pixel_values is None:
            # Text-only: shared family-agnostic helper (1D rope already).
            from visionselector_tpu.models.qwen25vl.model import (
                generate_text_only,
            )

            return generate_text_only(
                self.params, cfg, input_ids, max_new_tokens, eos_token_ids,
                temperature, top_p, seed, on_token_chunk,
                _defer_decode=_defer_decode,
                top_k=top_k, repetition_penalty=repetition_penalty,
            )

        p = self._prep_vision(input_ids, pixel_values, grid_thw,
                              has_img, is_video)
        rb, n, k, k_max, l_pad = p.rb, p.n, p.k, p.k_max, p.l_pad
        image_pos, text_pos, num_text = p.image_pos, p.text_pos, p.num_text
        image_pos_padded = p.image_pos_padded
        text_pos_padded = p.text_pos_padded
        t_text_bucket = p.t_text_bucket
        position_ids = p.position_ids
        rope_delta = 0
        from visionselector_tpu.models.qwen25vl.model import _run_decode_loop

        if self.strategy is not None and getattr(self.strategy, "llm_side", False):
            # FastV/DART over the OV decoder: two-stage prefill, RICE tower
            # runs separately (``llava-ov-15/compression_method/fastv.py``,
            # ``dart.py`` semantics).
            from visionselector_tpu.models.qwen25vl.model import (
                _stage_a_from_vision,
                _stage_b,
            )

            merged = _rice_encode(
                self.params, cfg, jnp.asarray(rb.pixel_values),
                jnp.asarray(rb.rot_pos_ids), jnp.asarray(rb.insert_map),
                jnp.asarray(rb.strip_map), jnp.asarray(rb.seg_ids),
            )
            target = self.strategy.target_layer
            (hidden_t, (k_a, v_a), fv_scores, key_l1, _full_valid_len,
             pos_full, _sel) = _stage_a_from_vision(
                self.params, cfg, target, self.strategy.capture,
                merged, jnp.asarray(n), jnp.asarray(input_ids),
                jnp.asarray(image_pos_padded), jnp.asarray(text_pos_padded),
                jnp.asarray(num_text), jnp.asarray(position_ids),
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
            k_img_max = k_max + 8
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
                k=jnp.concatenate(
                    [pad_t(k_a, t_pad_full), pad_t(k_b, t_keep_pad)]
                ),
                v=jnp.concatenate(
                    [pad_t(v_a, t_pad_full), pad_t(v_b, t_keep_pad)]
                ),
                length=jnp.concatenate([
                    jnp.full((target, 1), t_orig, jnp.int32),
                    jnp.full((nl - target, 1), keep_valid, jnp.int32),
                ]),
            )
            pos_to_vis = {int(p): j for j, p in enumerate(image_pos)}
            sel_vis = np.asarray(
                sorted(pos_to_vis[int(p)] for p in retained), np.int64
            )
            if _defer_decode:
                from visionselector_tpu.models.qwen25vl.model import (
                    PrefillState,
                )

                return PrefillState(
                    cache=cache, next_token=int(next_token),
                    start_pos=t_orig + rope_delta,
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
                from visionselector_tpu.models.qwen25vl.model import (
                    _rep_penalty_setup,
                )

                presence, next_token = _rep_penalty_setup(
                    cfg.text.vocab_size, input_ids, stage_b_logits,
                    next_token, repetition_penalty, temperature, top_p,
                    top_k, seed)
            tokens = _run_decode_loop(
                self.params, cfg, cache, next_token, t_orig + rope_delta,
                eos_token_ids, max_new_tokens, temperature, top_p, seed,
                on_chunk=on_token_chunk, top_k=top_k,
                repetition_penalty=repetition_penalty, presence=presence,
            )
            return GenerationResult(
                tokens=tokens, selected_indices=sel_vis, num_vision_tokens=n,
                prefill_len=keep_valid, prefill_seconds=t_prefill,
                total_seconds=time.perf_counter() - t_start,
            )

        if self.strategy is not None:
            # ViT-side baseline: RICE stats -> host selection -> prefill.
            merged, attn_recv, keys = _rice_encode_stats(
                self.params, cfg,
                jnp.asarray(rb.pixel_values), jnp.asarray(rb.rot_pos_ids),
                jnp.asarray(rb.insert_map), jnp.asarray(rb.strip_map),
                jnp.asarray(rb.seg_ids),
            )
            merged_np = np.asarray(merged)[:n]
            attn_np = (
                np.asarray(attn_recv)[:n] if self.strategy.needs_stats else None
            )
            keys_np = (
                np.asarray(keys)[:n] if self.strategy.needs_stats else None
            )
            idx_np, new_embeds = self.strategy(
                merged_np, attn_np, keys_np, self.budget, rb.grid_thw
            )
            idx_np = np.asarray(idx_np, np.int64)[:k_max]
            k = len(idx_np)
            vision_embeds = np.asarray(merged)
            if new_embeds is not None:
                vision_embeds = vision_embeds.copy()
                vision_embeds[idx_np] = np.asarray(
                    new_embeds, vision_embeds.dtype
                )[:k]
            sel_idx = np.full(k_max, l_pad, np.int64)
            sel_idx[:k] = idx_np
            sel_valid = np.arange(k_max) < k
            merged = jnp.asarray(vision_embeds)
            sel_idx, sel_valid = jnp.asarray(sel_idx), jnp.asarray(sel_valid)
        else:
            merged, sel_idx, sel_valid = _rice_encode_select(
                self.params, cfg, k_max, self.use_selector,
                jnp.asarray(rb.pixel_values), jnp.asarray(rb.rot_pos_ids),
                jnp.asarray(rb.insert_map), jnp.asarray(rb.strip_map),
                jnp.asarray(rb.seg_ids), jnp.asarray(n), jnp.asarray(k),
            )

        next_token, valid_len, (k_l, v_l), last_logits = _prefill_from_vision(
            self.params, cfg, merged, sel_idx, sel_valid,
            jnp.asarray(k), jnp.asarray(input_ids),
            jnp.asarray(image_pos_padded), jnp.asarray(text_pos_padded),
            jnp.asarray(num_text), jnp.asarray(position_ids),
        )
        next_token.block_until_ready()
        t_prefill = time.perf_counter() - t_start

        valid_len_i = int(valid_len)
        t_comp = k_max + t_text_bucket
        t_max = t_comp + max_new_tokens
        cache = lm_mod.KVCache(
            k=jnp.pad(k_l, ((0, 0), (0, 0), (0, t_max - t_comp), (0, 0), (0, 0))),
            v=jnp.pad(v_l, ((0, 0), (0, 0), (0, t_max - t_comp), (0, 0), (0, 0))),
            length=jnp.full((cfg.text.num_hidden_layers, 1), valid_len_i, jnp.int32),
        )
        sel_idx_np = np.asarray(sel_idx)
        sel_valid_np = np.asarray(sel_valid)
        compressed = self.use_selector or self.strategy is not None
        if _defer_decode:
            from visionselector_tpu.models.qwen25vl.model import PrefillState

            return PrefillState(
                cache=cache, next_token=int(next_token),
                start_pos=valid_len_i + rope_delta,
                eos_token_ids=tuple(eos_token_ids),
                max_new_tokens=max_new_tokens,
                result=GenerationResult(
                    tokens=[],
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
            from visionselector_tpu.models.qwen25vl.model import (
                _rep_penalty_setup,
            )

            presence, next_token = _rep_penalty_setup(
                cfg.text.vocab_size, input_ids, last_logits, next_token,
                repetition_penalty, temperature, top_p, top_k, seed)
        tokens = _run_decode_loop(
            self.params, cfg, cache, next_token,
            valid_len_i + rope_delta, eos_token_ids, max_new_tokens,
            temperature, top_p, seed, on_chunk=on_token_chunk, top_k=top_k,
            repetition_penalty=repetition_penalty, presence=presence,
        )

        return GenerationResult(
            tokens=tokens,
            selected_indices=sel_idx_np[sel_valid_np] if compressed else None,
            num_vision_tokens=n,
            prefill_len=valid_len_i,
            prefill_seconds=t_prefill,
            total_seconds=time.perf_counter() - t_start,
        )

    def generate_batch(
        self,
        requests,
        max_new_tokens: int = 64,
        eos_token_ids: Optional[Tuple[int, ...]] = None,
        temperature: float = 0.0,
        top_p: float = 1.0,
        seed: int = 0,
        top_k: int = 0,
        repetition_penalty: float = 1.0,
    ):
        """Decode-batched generation (see ``QwenVLEngine.generate_batch``)."""
        from visionselector_tpu.models.qwen25vl.model import run_generate_batch

        return run_generate_batch(
            self, requests, max_new_tokens=max_new_tokens,
            eos_token_ids=eos_token_ids, temperature=temperature,
            top_p=top_p, seed=seed, top_k=top_k,
            repetition_penalty=repetition_penalty,
        )
