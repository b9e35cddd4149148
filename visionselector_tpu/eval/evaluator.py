"""Evaluation driver: requests -> engine generation -> metrics.

Plays the role of ``lmms-eval/lmms_eval/evaluator.py`` (simple_evaluate /
evaluate) for this framework: per-task request building, rank sharding,
generation through a QwenVLEngine adapter, metric aggregation with bootstrap
stderr, and EVAL_TIME-parity timing probes whose printed lines are consumable
by ``extract_time``-style scrapers (``qwen-evaluation/extract_time.py``).
"""

from __future__ import annotations

import dataclasses
import json
import os
import threading
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from visionselector_tpu.eval.tasks import (
    TASKS,
    Request,
    aggregate_scores,
    load_task_docs,
    shard_requests,
)


@dataclasses.dataclass
class EvalTimeStats:
    prefill_ms: List[float] = dataclasses.field(default_factory=list)
    latency_ms: List[float] = dataclasses.field(default_factory=list)
    visual_tokens: List[int] = dataclasses.field(default_factory=list)
    input_tokens: List[int] = dataclasses.field(default_factory=list)
    output_tokens: List[int] = dataclasses.field(default_factory=list)

    def summary(self) -> Dict[str, float]:
        def avg(x):
            return float(np.mean(x)) if x else 0.0

        return {
            "avg_prefill_ms": avg(self.prefill_ms),
            "avg_latency_ms": avg(self.latency_ms),
            "avg_visual_tokens": avg(self.visual_tokens),
            "avg_input_tokens": avg(self.input_tokens),
            "avg_output_tokens": avg(self.output_tokens),
        }


class EngineAdapter:
    """generate_until-contract adapter (``lmms-eval/lmms_eval/api/model.py:58``)
    over a QwenVLEngine + tokenizer."""

    def __init__(self, engine, tokenizer, eval_time: bool = False,
                 visualize_dir: Optional[str] = None,
                 model_tag: str = "", min_pixels: Optional[int] = None,
                 max_pixels: Optional[int] = None):
        from visionselector_tpu.preprocess.image import (
            PROCESSOR_MAX_PIXELS,
            PROCESSOR_MIN_PIXELS,
        )

        self.engine = engine
        self.tokenizer = tokenizer
        # HF fast (Rust) tokenizers are not re-entrant: encode mutates
        # truncation/padding state, so a prefetch-thread encode racing a
        # main-thread decode can raise RuntimeError('Already borrowed').
        # Every tokenizer call in this adapter takes this lock (pure host
        # work, microseconds — never held across device dispatch).
        self._tok_lock = threading.Lock()
        # per-image pixel budget (reference model_args min_pixels/
        # max_pixels, qwen2_5_vl_with_token_compression.py:70-78)
        self.min_pixels = (PROCESSOR_MIN_PIXELS if min_pixels is None
                           else int(min_pixels))
        self.max_pixels = (PROCESSOR_MAX_PIXELS if max_pixels is None
                           else int(max_pixels))
        # identifies the model for response-cache keys (family + checkpoint);
        # without it two different checkpoints would share cache entries
        self.model_tag = model_tag or type(engine).__name__
        self.eval_time = eval_time or (
            os.environ.get("EVAL_TIME", "").lower() == "true"
        )
        # heatmap/mask PNG rendering per evaluated sample (parity with the
        # _visual adapter, qwen2_5_vl_with_token_compression_visual.py:418-663)
        self.visualize_dir = visualize_dir
        self.stats = EvalTimeStats()

    def _encode_prompt(self, question: str):
        # Both model families use the same Qwen chat format: the reference's
        # OV processor templates with identical <|im_start|> structure and the
        # identical "You are a helpful assistant." system message
        # (``llava-ov-15/src/constants.py:SYSTEM_MESSAGE``). An engine may
        # still override via a ``chat_template(question) -> (before, after)``
        # attribute.
        custom = getattr(self.engine, "chat_template", None)
        if custom is not None:
            return custom(question)
        tok = self.tokenizer
        with self._tok_lock:
            before = tok.encode(
                "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
                "<|im_start|>user\n"
            )
            after = tok.encode(
                f"{question}<|im_end|>\n<|im_start|>assistant\n")
        return before, after

    def _bucket_key(self, req: Request) -> int:
        """Estimated vision-bucket size (reads image dims without decoding) —
        grouping same-bucket requests avoids shape recompiles (the role of
        lmms-eval's sort-by-length Collator, ``utils.py:863-927``). Uses the
        engine's actual vision config so the sort key agrees with the bucket
        the engine will pick even under non-default window/patch settings."""
        if req.image_path is None:
            return 0
        try:
            from PIL import Image

            from visionselector_tpu.preprocess.image import smart_resize
            from visionselector_tpu.preprocess.indices import pick_bucket

            vis = self.engine.cfg.vision
            factor = vis.patch_size * vis.spatial_merge_size
            grids = []
            for path in req.image_paths:
                with Image.open(path) as im:
                    w, h = im.size
                hb, wb = smart_resize(h, w, factor=factor,
                                      min_pixels=self.min_pixels,
                                      max_pixels=self.max_pixels)
                grids.append((1, hb // vis.patch_size, wb // vis.patch_size))
            import numpy as _np

            from visionselector_tpu.models.qwen25vl.model import (
                VISION_BUCKETS,
            )

            window_size = getattr(vis, "window_size", None)
            if (window_size is not None
                    and os.environ.get("VST_ALIGN_WINDOWS", "1") == "1"):
                # mirror the engine's bucket choice (window-aligned length)
                from visionselector_tpu.preprocess.indices import (
                    aligned_window_len,
                )

                total = aligned_window_len(
                    _np.asarray(grids), window_size=window_size,
                    spatial_merge_size=vis.spatial_merge_size,
                    patch_size=vis.patch_size)
            else:
                total = sum(t * gh * gw for t, gh, gw in grids)
            return pick_bucket(total, list(VISION_BUCKETS))
        except Exception:  # noqa: BLE001
            return 1 << 30

    def _prepare_request(self, req: Request):
        """Build the engine ``generate`` kwargs for one request. Returns
        (gen_kwargs, grid) — grid for the visualization hook (None for
        text-only/video)."""
        from visionselector_tpu.preprocess.image import preprocess_image
        from visionselector_tpu.preprocess.rope import expand_vision_tokens

        cfg = self.engine.cfg
        before, after = self._encode_prompt(req.question)
        if req.video_path is not None:
            from visionselector_tpu.preprocess.video import process_video

            pixels, grid, spg = process_video(
                req.video_path,
                patch_size=cfg.vision.patch_size,
                temporal_patch_size=cfg.vision.temporal_patch_size,
                merge_size=cfg.vision.spatial_merge_size,
            )
            input_ids = expand_vision_tokens(
                before, after, grid,
                spatial_merge_size=cfg.vision.spatial_merge_size,
                image_token_id=cfg.video_token_id,
                vision_start_token_id=cfg.vision_start_token_id,
                vision_end_token_id=cfg.vision_end_token_id,
            )
            return dict(
                input_ids=input_ids, pixel_values_videos=pixels,
                video_grid_thw=grid, second_per_grid_ts=np.array([spg]),
            ), None
        if req.image_path is None:
            # Text-only request (mme/scienceqa contain some): no vision
            # branch; the engine prefills over the plain token sequence.
            input_ids = np.concatenate([before, after]).astype(np.int64)
            return dict(input_ids=input_ids), None
        from PIL import Image

        # One or several images (MMMU docs are multi-image): each is
        # preprocessed independently, pixel rows concatenated, one grid
        # row per image — mirroring the HF processor's batched call
        # (``qwen25vl/processing_qwen2_5_vl.py:48-219``).
        pixel_list, grid_list = [], []
        for path in req.image_paths:
            image = Image.open(path)
            px, g = preprocess_image(
                image,
                min_pixels=self.min_pixels,
                max_pixels=self.max_pixels,
                patch_size=cfg.vision.patch_size,
                temporal_patch_size=cfg.vision.temporal_patch_size,
                merge_size=cfg.vision.spatial_merge_size,
            )
            pixel_list.append(px)
            grid_list.append(g)
        pixels = np.concatenate(pixel_list, axis=0)
        grid = np.concatenate(grid_list, axis=0)
        input_ids = expand_vision_tokens(
            before, after, grid,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            image_token_id=cfg.image_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
            vision_end_token_id=cfg.vision_end_token_id,
        )
        return dict(input_ids=input_ids, pixel_values=pixels,
                    grid_thw=grid), grid

    def _postprocess(self, req: Request, res, grid, until) -> str:
        cfg = self.engine.cfg
        if (self.visualize_dir and req.video_path is None
                and len(req.image_paths) == 1
                and res.selected_indices is not None):
            from PIL import Image as _Image

            from visionselector_tpu.eval.visualize import visualize_selection

            os.makedirs(self.visualize_dir, exist_ok=True)
            img_arr = np.asarray(_Image.open(req.image_path).convert("RGB"))
            visualize_selection(
                img_arr, res.scores, res.selected_indices, grid,
                os.path.join(
                    self.visualize_dir, f"{req.task.name}_{req.doc_id}"
                ),
                spatial_merge_size=cfg.vision.spatial_merge_size,
            )
        with self._tok_lock:
            text = self.tokenizer.decode(res.tokens, skip_special_tokens=True)
        for stop in until:
            if stop in text:
                text = text.split(stop)[0]

        if self.eval_time:
            kept = (
                len(res.selected_indices)
                if res.selected_indices is not None
                else res.num_vision_tokens
            )
            self.stats.prefill_ms.append(res.prefill_seconds * 1e3)
            self.stats.latency_ms.append(res.total_seconds * 1e3)
            self.stats.visual_tokens.append(kept)
            self.stats.input_tokens.append(res.prefill_len)
            self.stats.output_tokens.append(len(res.tokens))
            print(f"Input visual token number is: {kept}")
            print(f"Generation prefill time is: {res.prefill_seconds * 1e3}")
            print(f"Generation total time is: {res.total_seconds * 1e3}")
        return text.strip()

    def generate_until(self, requests: Sequence[Request],
                       until: Sequence[str] = ("<|im_end|>",),
                       decode_batch: int | None = None) -> List[str]:
        """``decode_batch`` > 1 groups bucket-sorted requests (same
        max_new_tokens) into one batched decode dispatch per group
        (``engine.generate_batch``) — serving-style micro-batching; default
        from VST_DECODE_BATCH, else 1 (per-request decode)."""
        if decode_batch is None:
            decode_batch = int(os.environ.get("VST_DECODE_BATCH", "1"))
        # sort by bucket, run, restore original order (Collator parity)
        order = sorted(range(len(requests)),
                       key=lambda i: self._bucket_key(requests[i]))
        out_by_pos = [None] * len(requests)
        chunks = []
        i = 0
        while i < len(order):
            mnt = requests[order[i]].task.max_new_tokens
            chunk = [order[i]]
            while (len(chunk) < decode_batch
                   and i + len(chunk) < len(order)
                   and requests[order[i + len(chunk)]].task.max_new_tokens
                   == mnt):
                chunk.append(order[i + len(chunk)])
            i += len(chunk)
            chunks.append(chunk)

        # Overlap the NEXT chunk's host work (PIL decode + patchify +
        # tokenize) with the current chunk's device prefill/decode — the
        # eval-side analog of the training loop's --prefetch
        # (train/prefetch.py). Pure host work; results are identical.
        from concurrent.futures import ThreadPoolExecutor

        overlap = os.environ.get("VST_EVAL_PREFETCH", "1") != "0"
        ex = ThreadPoolExecutor(max_workers=1) if overlap else None

        def prep(chunk):
            return [self._prepare_request(requests[oi]) for oi in chunk]

        try:
            fut = ex.submit(prep, chunks[0]) if (ex and chunks) else None
            for ci, chunk in enumerate(chunks):
                mnt = requests[chunk[0]].task.max_new_tokens
                if fut is not None:
                    prepared = fut.result()
                    fut = (ex.submit(prep, chunks[ci + 1])
                           if ci + 1 < len(chunks) else None)
                else:
                    prepared = prep(chunk)
                spec = int(os.environ.get("VST_SPECULATIVE", "0"))
                if len(chunk) == 1 and spec > 0:
                    # prompt-lookup speculative decoding (greedy-identical
                    # outputs; fewer weight-stream passes per answer)
                    from visionselector_tpu.models.qwen25vl.model import (
                        generate_speculative,
                    )

                    results = [generate_speculative(
                        self.engine, **prepared[0][0], max_new_tokens=mnt,
                        propose_len=spec)]
                elif len(chunk) == 1:
                    results = [self.engine.generate(
                        **prepared[0][0], max_new_tokens=mnt)]
                else:
                    results = self.engine.generate_batch(
                        [p[0] for p in prepared], max_new_tokens=mnt)
                for oi, (kw, grid), res in zip(chunk, prepared, results):
                    out_by_pos[oi] = self._postprocess(
                        requests[oi], res, grid, until)
        finally:
            # shut the prep worker down even when generate/_postprocess
            # raises — otherwise the non-daemon executor thread keeps a
            # pending future alive and delays interpreter exit
            if ex is not None:
                ex.shutdown(cancel_futures=True)
        return out_by_pos

    def loglikelihood(
        self, requests: Sequence[tuple],
    ) -> List[tuple]:
        """Score (Request, continuation_text) pairs: returns
        [(sum log P(continuation | context+visual), is_greedy), ...] — the
        lmms model-ABC ``loglikelihood`` method
        (``lmms-eval/lmms_eval/api/model.py:30-57``). The context is the
        request's full chat-templated prompt (including the image); the
        continuation is tokenized and scored from one compressed prefill."""
        out = []
        for req, continuation in requests:
            kw, _grid = self._prepare_request(req)
            with self._tok_lock:
                cont_ids = np.asarray(
                    self.tokenizer.encode(continuation), np.int64
                )
            ll, greedy = self.engine.loglikelihood(
                continuation_ids=cont_ids, **kw
            )
            out.append((ll, greedy))
        return out

    def predict_multiple_choice(
        self, requests: Sequence[Request],
    ) -> List[str]:
        """Answer MC requests by per-choice loglikelihood (argmax over the
        choices' continuation log-probs) — how lmms-eval scores
        loglikelihood-typed MC tasks. Falls back to A-D letters when the doc
        carries no explicit choices.

        The prediction is the winning OPTION LETTER (A/B/...), never the
        choice text: the multiple_choice metric extracts a standalone letter
        and compares it to the gold letter, so returning full-text choices
        would decouple the score from the ll argmax. The context prefills
        ONCE per request; each choice then costs one tiny chunked forward
        (``run_loglikelihood_choices``) instead of a full vision prefill."""
        from visionselector_tpu.models.qwen25vl.model import (
            run_loglikelihood_choices,
        )

        preds = []
        for req in requests:
            choices = list(req.choices) or ["A", "B", "C", "D"]
            kw, _grid = self._prepare_request(req)
            with self._tok_lock:
                cont_list = [
                    np.asarray(self.tokenizer.encode(" " + c.strip()),
                               np.int64)
                    for c in choices
                ]
            lls = run_loglikelihood_choices(
                self.engine, kw.pop("input_ids"), cont_list, **kw
            )
            best = max(range(len(choices)), key=lambda i: lls[i][0])
            preds.append(chr(ord("A") + best))
        return preds

    def generate_until_multi_round(
        self, requests: Sequence[Request],
        until: Sequence[str] = ("<|im_end|>",),
    ) -> List[str]:
        """Multi-turn generation (lmms ABC ``generate_until_multi_round``,
        ``api/model.py:77-93``): a request whose ``question`` is a LIST of
        per-round questions is answered round by round, each round's answer
        folded back into the next round's prompt. Returns the final round's
        answer per request."""
        import dataclasses as dc

        out = []
        for req in requests:
            rounds = (req.question if isinstance(req.question, list)
                      else [req.question])
            context = ""
            answer = ""
            for q in rounds:
                merged = (context + q) if context else q
                one = dc.replace(req, question=merged)
                answer = self.generate_until([one], until)[0]
                context += f"{q}\n{answer}\n"
            out.append(answer)
        return out


def evaluate(
    adapter: EngineAdapter,
    task_names: Sequence[str],
    data_dir: str,
    limit: Optional[int] = None,
    rank: int = 0,
    world_size: int = 1,
    log_samples_path: Optional[str] = None,
) -> Dict[str, float]:
    """Run tasks and return the aggregated metric dict."""
    from visionselector_tpu.eval.caching import ResponseCache

    cache = ResponseCache()
    engine = adapter.engine
    method = (
        getattr(getattr(engine, "strategy", None), "name", None)
        or ("selector" if getattr(engine, "use_selector", False) else "orig")
    )
    budget = float(getattr(engine, "budget", 0.0))

    results: Dict[str, float] = {}
    samples_log = []
    for name in task_names:
        task = TASKS[name]
        requests = load_task_docs(task, data_dir, limit=limit)
        requests = shard_requests(requests, rank, world_size)
        t0 = time.perf_counter()
        # dispatch by the task's request type (lmms-eval:
        # ``resps = getattr(lm, reqtype)(cloned_reqs)``, evaluator.py:476)
        run = (adapter.predict_multiple_choice
               if task.request_type == "loglikelihood"
               else adapter.generate_until)
        if cache.enabled():
            # LM_HARNESS_CACHE_PATH contract: serve hits from the response
            # cache, generate only the misses (lmms-eval caching/cache.py).
            keys = [
                cache.key(
                    name, r.doc_id, r.question,
                    f"{adapter.model_tag}:{method}:{task.request_type}",
                    budget,
                )
                for r in requests
            ]
            preds = [cache.get(k) for k in keys]
            miss = [i for i, p in enumerate(preds) if p is None]
            if miss:
                fresh = run([requests[i] for i in miss])
                for i, p in zip(miss, fresh):
                    preds[i] = p
                    cache.put(keys[i], p)
        else:
            preds = run(requests)
        results.update(aggregate_scores(task, preds, requests))
        results[f"{name}/wall_s"] = time.perf_counter() - t0
        if log_samples_path:
            for r, p in zip(requests, preds):
                samples_log.append(
                    {"task": name, "doc_id": r.doc_id, "question": r.question,
                     "answers": r.answers, "prediction": p,
                     "is_padding": r.is_padding}
                )
    if adapter.eval_time:
        results.update(adapter.stats.summary())
    if log_samples_path:
        with open(log_samples_path, "w") as f:
            for s in samples_log:
                f.write(json.dumps(s) + "\n")
    return results


def merge_results(sample_log_paths: Sequence[str]) -> Dict[str, float]:
    """Combine per-rank sample logs into one aggregate, each doc counted once.

    The lmms-eval equivalent gathers rank results and drops the tracked
    padding requests before scoring (``lmms-eval/lmms_eval/evaluator.py:
    442-476``); here the per-rank jsonl sample logs (written by ``evaluate``
    with ``log_samples_path``) are deduplicated by (task, doc_id) — padding
    rows and accidental double-runs alike — and rescored.
    """
    from visionselector_tpu.eval.tasks import TASKS, Request, aggregate_scores

    by_task: Dict[str, Dict[int, dict]] = {}
    for path in sample_log_paths:
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("is_padding"):
                    continue
                by_task.setdefault(rec["task"], {}).setdefault(
                    rec["doc_id"], rec
                )
    results: Dict[str, float] = {}
    for name, docs in by_task.items():
        task = TASKS[name]
        requests, preds = [], []
        for doc_id in sorted(docs):
            rec = docs[doc_id]
            requests.append(
                Request(doc_id=doc_id, question=rec["question"],
                        answers=[str(a) for a in rec["answers"]],
                        image_path=None, task=task)
            )
            preds.append(rec["prediction"])
        results.update(aggregate_scores(task, preds, requests))
    return results
