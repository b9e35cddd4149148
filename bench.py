"""Headline benchmark: prefill speedup at 20% token retention.

Mirrors the reference's EVAL_TIME measurement contract
(``qwen-evaluation/token_compression/selector_model.py:229-234, 353-359``; cuda
events -> here ``block_until_ready`` wall clock): time the full forward
(ViT + selection + LLM prefill) for the selector at budget 0.2 vs the
uncompressed model, on a ChartQA-scale single image, Qwen2.5-VL-3B shapes.

Baseline to beat: 1.73x prefill acceleration at 20% retention (README.md:47).

Prints ONE JSON line:
  {"metric": "prefill_speedup_at_20pct_retention", "value": N, "unit": "x",
   "vs_baseline": N / 1.73}
"""

import json
import os
import sys
import time

# "auto" resolves to the Pallas flash kernel on TPU, XLA reference on CPU.
os.environ.setdefault("VST_ATTN_IMPL", os.environ.get("VST_BENCH_IMPL", "auto"))

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SPEEDUP = 1.73


def build_inputs(cfg, budget, use_selector, s_bucket, img_hw=(1036, 1456)):
    """ChartQA-scale image -> all _prefill inputs (mirrors QwenVLEngine)."""
    from visionselector_tpu.preprocess.image import preprocess_image
    from visionselector_tpu.preprocess.indices import build_vision_batch
    from visionselector_tpu.preprocess.rope import (
        expand_vision_tokens,
        get_rope_index,
    )

    rng = np.random.RandomState(0)
    img = (rng.rand(*img_hw, 3) * 255).astype(np.uint8)
    pixels, grid = preprocess_image(img)  # default processor pixel bounds
    align = os.environ.get("VST_ALIGN_WINDOWS", "1") == "1"
    if align:
        from visionselector_tpu.preprocess.indices import aligned_window_len

        need = aligned_window_len(
            grid, window_size=cfg.vision.window_size,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            patch_size=cfg.vision.patch_size,
        )
        s_bucket = max(s_bucket, -(-need // 512) * 512)
    vb = build_vision_batch(
        pixels, grid,
        window_size=cfg.vision.window_size,
        spatial_merge_size=cfg.vision.spatial_merge_size,
        patch_size=cfg.vision.patch_size,
        pad_to=s_bucket,
        align_windows=align,
    )
    n = vb.num_merged
    l_pad = s_bucket // cfg.vision.spatial_merge_unit

    # ~40 text tokens around the image (the paper image suite's prompts are
    # this shape: one question + answer-format instruction). Override with
    # VST_BENCH_TEXT_TOKENS to measure longer task-shaped prompts.
    n_text = int(os.environ.get("VST_BENCH_TEXT_TOKENS", "40"))
    before = list(range(100, 100 + n_text // 2))
    after = list(range(300, 300 + n_text - n_text // 2))
    input_ids = expand_vision_tokens(
        before, after, grid,
        image_token_id=cfg.image_token_id,
        vision_start_token_id=cfg.vision_start_token_id,
        vision_end_token_id=cfg.vision_end_token_id,
    )
    t_orig = len(input_ids)
    image_pos = np.where(input_ids == cfg.image_token_id)[0]
    text_pos = np.where(input_ids != cfg.image_token_id)[0]
    t_text_bucket = max(64, -(-(len(text_pos) + 1) // 64) * 64)
    k_max_for_pad = (
        max(1, int((s_bucket // 4) * budget)) if use_selector else s_bucket // 4
    )
    t_text_bucket += (-(k_max_for_pad + t_text_bucket)) % 128
    image_pos_padded = np.full(l_pad, t_orig, np.int64)
    image_pos_padded[:n] = image_pos
    text_pos_padded = np.full(t_text_bucket, t_orig, np.int64)
    text_pos_padded[: len(text_pos)] = text_pos
    position_ids, _ = get_rope_index(
        input_ids, image_grid_thw=grid,
        tokens_per_second=cfg.vision.tokens_per_second,
        image_token_id=cfg.image_token_id,
        video_token_id=cfg.video_token_id,
        vision_start_token_id=cfg.vision_start_token_id,
    )

    if use_selector:
        k = max(1, int(n * budget))
        k_max = max(1, int(l_pad * budget))
        k = min(k, k_max)
    else:
        k = n
        k_max = l_pad

    args = (
        jnp.asarray(vb.pixel_values, jnp.float32),
        jnp.asarray(vb.rot_pos_ids),
        jnp.asarray(vb.window_seg_ids),
        jnp.asarray(vb.full_seg_ids),
        jnp.asarray(vb.reverse_index),
        jnp.asarray(n),
        jnp.asarray(k),
        jnp.asarray(input_ids),
        jnp.asarray(image_pos_padded),
        jnp.asarray(text_pos_padded),
        jnp.asarray(len(text_pos)),
        jnp.asarray(position_ids),
        jnp.asarray(vb.window_kv_bounds),
        jnp.asarray(vb.full_kv_bounds),
    )
    return args, k_max, n, vb.window_diag


def time_prefill(params, cfg, k_max, use_selector, args, iters=8,
                 window_diag=False):
    """Differential timing: run the prefill chained K times inside one jit
    (serialized by a data dependency) and difference T(K) - T(1).

    Rationale: on the axon-tunneled TPU, ``block_until_ready`` does not block
    and every host fetch carries a ~25ms constant round-trip — differencing
    two chained runs cancels both the fetch overhead and dispatch costs.
    """
    import functools

    from visionselector_tpu.models.qwen25vl.model import _prefill

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(params, n, *args):
        pixels = args[0]

        def body(i, carry):
            px, acc = carry
            out = _prefill(params, cfg, k_max, use_selector, px, *args[1:],
                           window_diag=window_diag)
            tok = out[0]
            # serialize iterations: make the next input depend on this output
            px = px.at[0, 0].add(tok.astype(px.dtype) * 1e-12)
            return px, acc + tok

        _, acc = jax.lax.fori_loop(0, n, body, (pixels, jnp.zeros((), jnp.int32)))
        return acc

    def fetch(n):
        return int(chained(params, n, *args))

    lo = max(2, iters // 2)
    fetch(lo)
    fetch(iters)  # compile both

    def once():
        t0 = time.perf_counter(); fetch(lo); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); fetch(iters); tk = time.perf_counter() - t0
        return (tk - t1) / (iters - lo)

    # The tunnel adds noisy constant overhead per fetch. Differencing two
    # LARGE chained spans (lo, iters) keeps both spans big relative to that
    # noise (a 1-long span can flip a differential negative); median of 5.
    samples = [once() for _ in range(5)]
    ok = sorted(s for s in samples if s > 1e-4)
    if not ok:
        return 1e-9
    return ok[len(ok) // 2]


def peak_memory_bytes():
    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("peak_bytes_in_use", 0)
    except Exception:
        return 0


def measure(cfg, params, budget, s_bucket, img_hw):
    args_sel, k_max_sel, n, diag = build_inputs(cfg, budget, True, s_bucket, img_hw)
    t_sel = time_prefill(params, cfg, k_max_sel, True, args_sel, window_diag=diag)
    args_full, k_max_full, _, diag_f = build_inputs(cfg, budget, False, s_bucket, img_hw)
    t_full = time_prefill(params, cfg, k_max_full, False, args_full,
                          window_diag=diag_f)

    # Optional profiler trace of one prefill each (SURVEY §5.1 tracing):
    # VST_PROFILE=<dir> writes a tensorboard-loadable trace.
    prof_dir = os.environ.get("VST_PROFILE")
    if prof_dir:
        from visionselector_tpu.models.qwen25vl.model import _prefill

        with jax.profiler.trace(prof_dir):
            jax.block_until_ready(
                _prefill(params, cfg, k_max_sel, True, *args_sel,
                         window_diag=diag)
            )
    return t_sel, t_full, n


def kv_cache_reduction(cfg, budget, s_bucket, text_len=64) -> float:
    """Analytic KV-cache HBM reduction at the given retention (the dominant
    term of the reference's 86% peak-memory-reduction claim, README.md:47):
    cache bytes scale with the prefill length."""
    l_pad = s_bucket // cfg.vision.spatial_merge_unit
    full_len = l_pad + text_len
    sel_len = max(1, int(l_pad * budget)) + text_len
    return 1.0 - sel_len / full_len


def time_decode_tok_s(params, cfg, batch, t_ctx=384, steps=48):
    """Decode throughput (tokens/s) at the given micro-batch size via the
    batched on-device decode loop. Differential over step counts cancels the
    tunnel's constant dispatch/fetch overhead (same rationale as
    time_prefill)."""
    from visionselector_tpu.models.qwen25vl import lm as lm_mod
    from visionselector_tpu.models.qwen25vl.model import _decode_loop_batch

    dtype = cfg.jax_dtype
    firsts = jnp.full((batch,), 11, jnp.int32)
    starts = jnp.full((batch,), t_ctx, jnp.int32)
    eos = jnp.asarray([-1], jnp.int32)  # never fires

    def run(n):
        # fresh cache per call: the jitted loop donates its cache argument
        cache = lm_mod.init_kv_cache(cfg.text, batch, t_ctx + steps + 2, dtype)
        cache = lm_mod.KVCache(
            k=cache.k, v=cache.v, length=jnp.full_like(cache.length, t_ctx)
        )
        toks, counts = _decode_loop_batch(
            params, cfg, cache, firsts, starts, eos, n)
        return int(np.asarray(counts).sum())

    lo = steps // 2
    run(lo); run(steps)  # compile both programs
    samples = []
    for _ in range(5):
        t0 = time.perf_counter(); run(lo); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); run(steps); tk = time.perf_counter() - t0
        samples.append((tk - t1) / (steps - lo))
    # Median over differentials of two LARGE spans: per-dispatch tunnel noise
    # is large relative to a 2-step span and flips small differentials.
    ok = sorted(s for s in samples if s > 1e-6)
    per_step = ok[len(ok) // 2] if ok else float("nan")
    return batch / per_step


def init_7b_int8(cfg):
    """7B-shape params: bf16 ViT/scorer + int8 weight-only LM (bf16 7B does
    not fit one 16 GB v5e; int8 halves weight HBM — the deployment-realistic
    single-chip 7B configuration)."""
    from visionselector_tpu.models.qwen25vl import lm as lm_mod
    from visionselector_tpu.models.qwen25vl import vit as vit_mod
    from visionselector_tpu.selector.scorer import init_scorer_params

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    dtype = cfg.jax_dtype
    visual = jax.jit(
        lambda k: vit_mod.init_vit_params(k, cfg.vision, dtype)
    )(k1)
    lm = jax.jit(lambda k: lm_mod.init_lm_params_int8(k, cfg.text, dtype))(k2)
    sel = cfg.with_selector().selector
    scorer = init_scorer_params(k3, sel, jnp.float32)
    return {"visual": visual, "lm": lm, "scorer": scorer}


def main():
    from visionselector_tpu.core.config import qwen25vl_3b, qwen25vl_7b
    from visionselector_tpu.models.qwen25vl.model import init_params

    budget = float(os.environ.get("VST_BENCH_BUDGET", "0.2"))
    preset = os.environ.get("VST_BENCH_PRESET", "3b")
    run_7b = os.environ.get("VST_BENCH_7B", "1") != "0"
    if preset == "tiny":  # fast CPU smoke of the bench harness itself
        from visionselector_tpu.core.config import qwen25vl_tiny

        cfg = qwen25vl_tiny()
        s_bucket = 1024
        img_hw = (252, 364)  # 468 patches
        model_name = "qwen2.5-vl-tiny (smoke)"
        run_7b = False
    else:
        cfg = qwen25vl_3b()
        # ChartQA-scale: ~1292 merged vision tokens under default pixel budget.
        s_bucket = 5632
        img_hw = (1036, 1456)
        model_name = "qwen2.5-vl-3b (random weights)"
    params = jax.jit(lambda key: init_params(key, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    t_sel3, t_full3, n = measure(cfg, params, budget, s_bucket, img_hw)
    speedup3 = t_full3 / t_sel3

    # Preliminary result line: the 7B phase below adds several uncached
    # Mosaic compiles (~2-4 min each through the tunnel); if the harness
    # times out mid-way, this line stands as the last complete JSON. The
    # final line (printed at the end) supersedes it.
    if run_7b:
        print(json.dumps({
            "metric": "prefill_speedup_at_20pct_retention",
            "value": round(speedup3, 4),
            "unit": "x",
            "vs_baseline": round(speedup3 / BASELINE_SPEEDUP, 4),
            "detail": {"model": model_name, "phase": "3b_preliminary",
                       "prefill_ms_selector": round(t_sel3 * 1e3, 2),
                       "prefill_ms_uncompressed": round(t_full3 * 1e3, 2)},
        }), flush=True)

    detail = {
        "prefill_ms_selector": round(t_sel3 * 1e3, 2),
        "prefill_ms_uncompressed": round(t_full3 * 1e3, 2),
        "vision_tokens": int(n),
        "kept_tokens": int(max(1, int(n * budget))),
        "budget": budget,
        "model": model_name,
        "speedup_3b": round(speedup3, 4),
        "kv_cache_reduction_at_budget": round(
            kv_cache_reduction(
                cfg, budget, s_bucket,
                text_len=int(os.environ.get("VST_BENCH_TEXT_TOKENS", "40"))
                + 2,  # + vision_start/end markers (one image)
            ), 4
        ),
        "peak_bytes_in_use": peak_memory_bytes(),
        "attn_impl": os.environ.get("VST_ATTN_IMPL"),
        "platform": jax.devices()[0].platform,
    }

    # Decode-batching throughput (serving): weight-bandwidth-bound decode
    # amortizes the per-step HBM weight stream across the micro-batch.
    # OPT-IN: on this tunneled (time-shared) chip the decode differential
    # is only stable on an otherwise-idle run — quiet-host measurements
    # (IMPLEMENTATION_NOTES.md): 3B b1 8.99 ms/step (111 tok/s), b8 ~660+.
    if os.environ.get("VST_BENCH_DECODE", "0") == "1":
        try:
            detail["decode_tok_s_b1"] = round(
                time_decode_tok_s(params, cfg, 1), 1)
            detail["decode_tok_s_b8"] = round(
                time_decode_tok_s(params, cfg, 8), 1)
        except Exception as e:  # noqa: BLE001
            detail["bench_decode_error"] = repr(e)

    # Headline-comparable 7B measurement: the reference's 1.73x is a 7B
    # figure (README.md:47) where the LM dominates and compression buys more.
    speedup = speedup3
    if run_7b:
        try:
            import gc

            del params
            gc.collect()
            cfg7 = qwen25vl_7b()
            params7 = init_7b_int8(cfg7)
            jax.block_until_ready(params7)
            t_sel7, t_full7, _ = measure(cfg7, params7, budget, s_bucket, img_hw)
            speedup = t_full7 / t_sel7
            detail.update(
                model="qwen2.5-vl-7b int8-LM (random weights)",
                speedup_7b_int8=round(speedup, 4),
                prefill_ms_selector=round(t_sel7 * 1e3, 2),
                prefill_ms_uncompressed=round(t_full7 * 1e3, 2),
                model_3b="qwen2.5-vl-3b (random weights)",
                prefill_ms_selector_3b=round(t_sel3 * 1e3, 2),
                prefill_ms_uncompressed_3b=round(t_full3 * 1e3, 2),
            )
            if os.environ.get("VST_BENCH_DECODE", "0") == "1":
                detail["decode_tok_s_7b_int8_b8"] = round(
                    time_decode_tok_s(params7, cfg7, 8), 1)
        except Exception as e:  # noqa: BLE001 — fall back to the 3B figure
            detail["bench_7b_error"] = repr(e)

    result = {
        "metric": "prefill_speedup_at_20pct_retention",
        "value": round(speedup, 4),
        "unit": "x",
        "vs_baseline": round(speedup / BASELINE_SPEEDUP, 4),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
