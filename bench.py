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


def _setup_compile_cache():
    """Persistent compilation cache: Mosaic/XLA compiles through the axon
    tunnel cost 2-4 min per kernel; the r4 driver capture timed out (rc 124)
    re-paying them all. With the on-disk cache, every driver run after the
    first warm-up pays ~zero compile time. (Same mechanism api/warmup.py
    documents.) Called from main(), NOT at import: tests import this module
    for its helpers and must not have their process's compile behavior
    silently rewired."""
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.environ.get(
        "VST_XLA_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".xla_cache"),
    )
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


import jax.numpy as jnp
import numpy as np

BASELINE_SPEEDUP = 1.73

# Wall-clock budget management: the driver runs this script under a hard
# timeout; every wait/retry below is bounded to a fraction of the remaining
# budget so the measurement phases always get the lion's share.
_START = time.monotonic()


def _remaining_s() -> float:
    deadline = float(os.environ.get("VST_BENCH_DEADLINE_S", "1200"))
    return deadline - (time.monotonic() - _START)


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


class PrefillTimer:
    """Differential timing of one prefill arm: run the prefill chained K
    times inside one jit (serialized by a data dependency) and difference
    T(K) - T(1).

    Rationale: on the axon-tunneled TPU, ``block_until_ready`` does not block
    and every host fetch carries a ~25ms constant round-trip — differencing
    two chained runs cancels both the fetch overhead and dispatch costs.
    Exposed as warmup()/once() so the two arms' samples can be INTERLEAVED
    by the caller (alternating arms within each repeat immunizes the RATIO
    against slow drift in host load / time-shared-chip interference, the
    failure mode that corrupted the r2 driver capture).
    """

    def __init__(self, params, cfg, k_max, use_selector, args, iters=8,
                 window_diag=False):
        import functools

        from visionselector_tpu.models.qwen25vl.model import _prefill

        @functools.partial(jax.jit, static_argnames=("n",))
        def chained(params, n, *args):
            pixels = args[0]

            def body(i, carry):
                px, acc = carry
                out = _prefill(params, cfg, k_max, use_selector, px,
                               *args[1:], window_diag=window_diag)
                tok = out[0]
                # serialize iterations: next input depends on this output
                px = px.at[0, 0].add(tok.astype(px.dtype) * 1e-12)
                return px, acc + tok

            _, acc = jax.lax.fori_loop(
                0, n, body, (pixels, jnp.zeros((), jnp.int32)))
            return acc

        self._chained = chained
        self._params = params
        self._args = args
        self.iters = iters
        self.lo = max(2, iters // 2)

    def _fetch(self, n):
        return int(self._chained(self._params, n, *self._args))

    def warmup(self):
        self._fetch(self.lo)
        self._fetch(self.iters)  # compile both spans

    def once(self):
        """One differential sample (seconds per prefill)."""
        t0 = time.perf_counter(); self._fetch(self.lo)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); self._fetch(self.iters)
        tk = time.perf_counter() - t0
        return (tk - t1) / (self.iters - self.lo)


def _median_positive(samples, floor=1e-4):
    ok = sorted(s for s in samples if s > floor)
    if not ok:
        return 1e-9
    return ok[len(ok) // 2]


# ---------------------------------------------------------------------------
# Analytic plausibility model (v5e single chip)
# ---------------------------------------------------------------------------
# Peak rates; the model is used only for sanity bounds (2x windows), so
# +-20% rate accuracy is plenty.
V5E_BF16_FLOPS = 197e12
V5E_HBM_BYTES_S = 819e9


def _param_bytes(params) -> int:
    return int(sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
        if hasattr(x, "dtype")
    ))


def prefill_flops_model(cfg, s_bucket: int, t_len: int) -> dict:
    """Analytic FLOP/bandwidth estimate of one prefill (ViT @ s_bucket
    patches + LM @ t_len tokens). Returns component FLOPs and the derived
    lower-bound/expected times. Used to sanity-check each measured arm: a
    measured time far outside [0.7x, 2x] of the roofline estimate signals a
    corrupted differential (e.g. another process time-sharing the chip)."""
    vis, txt = cfg.vision, cfg.text
    S, D, Iv = s_bucket, vis.hidden_size, vis.intermediate_size
    # ViT matmuls: patch embed + per-layer qkv/proj/mlp + merger
    vit = 2 * S * vis.patch_dim * D
    vit += vis.depth * (2 * S * D * 3 * D + 2 * S * D * D
                        + 2 * 2 * S * D * Iv)
    # attention scores+pv: full layers S^2-ish, window layers S*window_len
    n_full = len(getattr(vis, "fullatt_block_indexes", (7, 15, 23, 31)))
    win = 64 * vis.spatial_merge_unit  # aligned window slot, patches
    vit += n_full * 4 * S * S * vis.head_dim * vis.num_heads
    vit += (vis.depth - n_full) * 4 * S * win * vis.head_dim * vis.num_heads
    merge_in = D * vis.spatial_merge_unit
    vit += 2 * (S // vis.spatial_merge_unit) * merge_in * merge_in
    vit += 2 * (S // vis.spatial_merge_unit) * merge_in * getattr(
        vis, "out_hidden_size", txt.hidden_size)

    t, d, i = t_len, txt.hidden_size, txt.intermediate_size
    kv_dim = txt.num_key_value_heads * txt.head_dim
    q_dim = txt.num_attention_heads * txt.head_dim
    lm = txt.num_hidden_layers * (
        2 * t * d * (q_dim + 2 * kv_dim) + 2 * t * q_dim * d  # qkv + o
        + 3 * 2 * t * d * i                                   # gate/up/down
        + 2 * 2 * (t * t // 2) * txt.head_dim * txt.num_attention_heads
    )
    lm += 2 * d * txt.vocab_size  # lm_head on the last row only
    return {"vit_flops": vit, "lm_flops": lm}


def arm_model_ms(cfg, params, s_bucket: int, t_len: int) -> float:
    """Roofline time estimate for one prefill arm: max(compute, weight
    stream). Weight bytes come from the actual param tree (so int8 LMs are
    modeled correctly); at these sequence lengths prefill is compute-bound
    and the FLOP term dominates."""
    f = prefill_flops_model(cfg, s_bucket, t_len)
    t_compute = (f["vit_flops"] + f["lm_flops"]) / V5E_BF16_FLOPS
    t_mem = _param_bytes(params) / V5E_HBM_BYTES_S
    return 1e3 * max(t_compute, t_mem)


def hbm_model(cfg, params, s_bucket: int, t_len: int,
              decode_steps: int = 0) -> dict:
    """Analytic peak-HBM model of one generate() arm: weights + KV cache +
    activation high-water of the prefill program.

    The reference measures ``torch.cuda.max_memory_allocated`` around
    generate with a per-sample peak reset
    (``qwen2_5_vl_with_token_compression.py:374-394``) — weights + the
    per-sample activation/KV peak. Activation high-water here = the widest
    live set in a decoder layer (hidden copies + qkv + the two MLP
    intermediates) plus the ViT equivalent; XLA fusion can only shrink it.
    """
    dt = jnp.dtype(cfg.jax_dtype).itemsize
    weights = _param_bytes(params)
    txt = cfg.text
    t_total = t_len + decode_steps
    kv = (txt.num_hidden_layers * t_total * txt.num_key_value_heads
          * txt.head_dim * 2 * dt)
    vis = cfg.vision
    act_vit = s_bucket * max(
        3 * vis.hidden_size + 3 * vis.hidden_size,   # qkv + hidden copies
        2 * vis.intermediate_size + vis.hidden_size,  # mlp intermediates
    ) * dt
    q_dim = txt.num_attention_heads * txt.head_dim
    kv_dim = txt.num_key_value_heads * txt.head_dim
    act_lm = t_len * max(
        q_dim + 2 * kv_dim + 3 * txt.hidden_size,
        2 * txt.intermediate_size + txt.hidden_size,
    ) * dt
    act = max(act_vit, act_lm)
    return {"weights": weights, "kv": kv, "act": act,
            "peak": weights + kv + act, "incremental": kv + act}


def peak_memory_bytes():
    """Best-effort device peak-memory probe: memory_stats keys vary by
    runtime, and through the axon tunnel they can all be absent (then the
    analytic ``hbm_model`` is the evidence)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        for key in ("peak_bytes_in_use", "largest_alloc_size",
                    "bytes_in_use"):
            v = stats.get(key, 0)
            if v:
                return int(v)
        return 0
    except Exception:
        return 0


def measure(cfg, params, budget, s_bucket, img_hw, repeats=5):
    """Measure both arms with INTERLEAVED differential samples and sanity-
    check each against the roofline model.

    Returns (t_sel, t_full, n, check) where check carries the per-arm model
    estimate and a ``suspect`` flag. Interleaving + the model bound address
    the r2 failure mode (one arm's 5 samples all landing in a noisy window
    of the time-shared chip and corrupting the recorded ratio)."""
    args_sel, k_max_sel, n, diag = build_inputs(
        cfg, budget, True, s_bucket, img_hw)
    args_full, k_max_full, _, diag_f = build_inputs(
        cfg, budget, False, s_bucket, img_hw)
    timer_sel = PrefillTimer(params, cfg, k_max_sel, True, args_sel,
                             window_diag=diag)
    timer_full = PrefillTimer(params, cfg, k_max_full, False, args_full,
                              window_diag=diag_f)
    timer_sel.warmup()
    timer_full.warmup()

    sel_samples, full_samples = [], []
    for _ in range(repeats):
        sel_samples.append(timer_sel.once())
        full_samples.append(timer_full.once())
    t_sel = _median_positive(sel_samples)
    t_full = _median_positive(full_samples)

    # Arm plausibility vs the roofline model. t_text for each arm: the
    # compacted length is k_max + text bucket (selector) / l_pad + text
    # (uncompressed).
    n_text = int(os.environ.get("VST_BENCH_TEXT_TOKENS", "40")) + 2
    t_sel_len = k_max_sel + n_text
    t_full_len = k_max_full + n_text
    model_sel = arm_model_ms(cfg, params, s_bucket, t_sel_len)
    model_full = arm_model_ms(cfg, params, s_bucket, t_full_len)

    def out_of_window(measured_ms, model_ms):
        # 5 ms constant slack: grid dispatch / jit glue that the roofline
        # ignores — negligible at 3B/7B scale, dominant on the tiny smoke.
        return (measured_ms > 2.0 * model_ms + 5.0
                or measured_ms < 0.7 * model_ms - 5.0)

    # One re-measure pass for an implausible arm before flagging it.
    if out_of_window(t_sel * 1e3, model_sel):
        sel_samples += [timer_sel.once() for _ in range(repeats)]
        t_sel = _median_positive(sel_samples)
    if out_of_window(t_full * 1e3, model_full):
        full_samples += [timer_full.once() for _ in range(repeats)]
        t_full = _median_positive(full_samples)

    check = {
        "model_ms_selector": round(model_sel, 2),
        "model_ms_uncompressed": round(model_full, 2),
        "suspect_selector": out_of_window(t_sel * 1e3, model_sel),
        "suspect_uncompressed": out_of_window(t_full * 1e3, model_full),
    }
    check["suspect"] = (check["suspect_selector"]
                        or check["suspect_uncompressed"])

    # Single-chip MFU per arm, from the same analytic FLOP model that
    # bounds plausibility (VERDICT r4 item 2: put the roofline occupancy
    # on the artifact, not just in IMPLEMENTATION_NOTES).
    def mfu_entry(t_len, measured_s):
        f = prefill_flops_model(cfg, s_bucket, t_len)
        flops = f["vit_flops"] + f["lm_flops"]
        return {
            "prefill_flops": int(flops),
            "measured_s": round(measured_s, 5),
            "peak_flops": V5E_BF16_FLOPS,
            "mfu": round(flops / max(measured_s, 1e-9) / V5E_BF16_FLOPS, 4),
        }

    check["mfu"] = {
        "selector": mfu_entry(t_sel_len, t_sel),
        "uncompressed": mfu_entry(t_full_len, t_full),
    }

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
    return t_sel, t_full, n, check


def kv_cache_reduction(cfg, budget, s_bucket, text_len=64) -> float:
    """Analytic KV-cache HBM reduction at the given retention (the dominant
    term of the reference's 86% peak-memory-reduction claim, README.md:47):
    cache bytes scale with the prefill length."""
    l_pad = s_bucket // cfg.vision.spatial_merge_unit
    full_len = l_pad + text_len
    sel_len = max(1, int(l_pad * budget)) + text_len
    return 1.0 - sel_len / full_len


def memory_story(cfg, params, budget, text_len) -> dict:
    """The full memory axis, reconciled against the reference's 86.08%
    peak-memory claim (README.md:47, measured via
    ``torch.cuda.max_memory_allocated`` around generate,
    ``qwen2_5_vl_with_token_compression.py:374-394``).

    Reported quantities:
    - ``asymptote``: 1 - budget — the exact supremum of any reduction metric
      that scales linearly with prefill length (KV, flash activations). With
      budget 0.2, >=80% is the unreachable limit; the reference's 86.08%
      therefore measures a SUPERLINEAR uncompressed transient (an eager
      attention T x T map is the only such buffer in its stack) on top of
      persistent weights.
    - ``video_scale``: the same analytic model at the 16384-patch video
      bucket (32-frame clip), where vision tokens dominate and every linear
      metric approaches its asymptote.
    - ``eager_equiv``: what the reference's definition yields from OUR
      analytic model if the uncompressed arm additionally materialized one
      layer's eager attention logits (heads x T x T fp32) — the
      configuration its claim implies. This framework's Pallas flash path
      never allocates that buffer, so its uncompressed arm already runs at
      the memory level the reference only reaches WITH compression.
    """
    txt = cfg.text

    def arm(t_len, eager):
        m = hbm_model(cfg, params, s_bucket_v, t_len)
        if eager:
            m = dict(m)
            eager_map = txt.num_attention_heads * t_len * t_len * 4
            m["act"] = max(m["act"], eager_map)
            m["peak"] = m["weights"] + m["kv"] + m["act"]
            m["incremental"] = m["kv"] + m["act"]
        return m

    # Video-scale bucket: 16384 patches -> 4096 merged vision tokens.
    s_bucket_v = 16384
    l_pad = s_bucket_v // cfg.vision.spatial_merge_unit
    t_sel = max(1, int(l_pad * budget)) + text_len
    t_full = l_pad + text_len
    sel, full = arm(t_sel, eager=False), arm(t_full, eager=False)
    full_eager = arm(t_full, eager=True)
    return {
        "asymptote": 1.0 - budget,
        "video_scale": {
            "s_bucket": s_bucket_v,
            "kv_reduction": round(1 - sel["kv"] / full["kv"], 4),
            "incremental_reduction": round(
                1 - sel["incremental"] / full["incremental"], 4),
            "with_weights_reduction": round(
                1 - sel["peak"] / full["peak"], 4),
        },
        "eager_equiv": {
            "uncompressed_transient_mb": round(
                full_eager["incremental"] / 2**20, 1),
            "selector_transient_mb": round(sel["incremental"] / 2**20, 1),
            "incremental_reduction": round(
                1 - sel["incremental"] / full_eager["incremental"], 4),
            "with_weights_reduction": round(
                1 - sel["peak"] / full_eager["peak"], 4),
        },
    }


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


def init_7b_int8(cfg, bits=8):
    """7B-shape params: bf16 ViT/scorer + int8 (or packed int4) weight-only
    LM (bf16 7B does not fit one 16 GB v5e; int8 halves weight HBM — the
    deployment-realistic single-chip 7B configuration; int4 halves it
    again)."""
    from visionselector_tpu.models.qwen25vl import lm as lm_mod
    from visionselector_tpu.models.qwen25vl import vit as vit_mod
    from visionselector_tpu.selector.scorer import init_scorer_params

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    dtype = cfg.jax_dtype
    visual = jax.jit(
        lambda k: vit_mod.init_vit_params(k, cfg.vision, dtype)
    )(k1)
    if bits == 4:
        # eager: to_int4's layout-pinned production can't run under a trace
        lm = lm_mod.init_lm_params_int8(k2, cfg.text, dtype, bits=4)
    else:
        lm = jax.jit(
            lambda k: lm_mod.init_lm_params_int8(k, cfg.text, dtype))(k2)
    sel = cfg.with_selector().selector
    scorer = init_scorer_params(k3, sel, jnp.float32)
    return {"visual": visual, "lm": lm, "scorer": scorer}


def _backend_alive(timeout_s: int = 180) -> bool:
    """Probe the configured backend in a CHILD with a hard timeout.

    Under the axon preset, the first jax.devices() call opens the TPU
    tunnel; when the tunnel is down it hangs forever. Probing in a
    subprocess lets the bench fail fast with an honest JSON line instead
    of hanging the driver's capture."""
    import subprocess
    import sys

    try:
        res = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        return res.returncode == 0
    except subprocess.TimeoutExpired:
        return False


@jax.jit
def _probe_matmul(a):
    return (a @ a).sum()


def _contention_probe_s() -> float:
    """Seconds for a tiny warm matmul round trip on the configured backend.

    The tunneled v5e is time-shared: a heavy co-tenant stretches this from
    ~50 ms to MINUTES (observed 265 s) and can make well-fitting programs
    fail with RESOURCE_EXHAUSTED while its HBM footprint peaks. The probe
    quantifies contention so the bench can wait it out (bounded) and stamp
    the artifact with the level it actually measured under. (Module-level
    jit: every poll after the first is a single warm dispatch, not a
    recompile through the contended tunnel.)"""
    x = jnp.ones((256, 256), jnp.bfloat16)
    float(_probe_matmul(x))  # compile on first call + absorb dispatch No. 1
    t0 = time.perf_counter()
    float(_probe_matmul(x))
    return time.perf_counter() - t0


def _wait_for_quiet(max_wait_s: float = 300.0,
                    busy_threshold_s: float = 2.0) -> float:
    """Poll the contention probe until the chip looks quiet or the wait
    budget is spent. Returns the last probe reading (seconds).

    The wait is additionally capped to 25% of the remaining bench deadline
    (``VST_BENCH_DEADLINE_S``): better to measure under contention and stamp
    the artifact suspect than to time out with no final line at all (the
    r4 failure)."""
    max_wait_s = min(max_wait_s, max(0.0, 0.25 * _remaining_s()))
    deadline = time.monotonic() + max_wait_s
    probe = _contention_probe_s()
    while probe > busy_threshold_s and time.monotonic() < deadline:
        time.sleep(min(60.0, max(5.0, deadline - time.monotonic())))
        probe = _contention_probe_s()
    return probe


def _retry_contended(fn, attempts: int = 3, backoff_s: float = 90.0):
    """Run ``fn`` retrying RESOURCE_EXHAUSTED (co-tenant HBM spike) with a
    backoff + quiet re-check. Re-raises the final failure; any other error
    propagates immediately (a real bug should crash loudly, not retry).
    Backoffs are bounded by the remaining bench deadline."""
    for i in range(attempts):
        try:
            return fn()
        except jax.errors.JaxRuntimeError as e:
            if "RESOURCE_EXHAUSTED" not in str(e) or i == attempts - 1:
                raise
            if _remaining_s() < 2 * backoff_s:  # no budget left for a retry
                raise
            time.sleep(min(backoff_s, 0.2 * _remaining_s()))
            # the latency probe does not see an idle-but-resident tenant's
            # HBM, but it does catch the active-churn phase — skip it
            _wait_for_quiet(max_wait_s=120.0)


def main():
    from visionselector_tpu.core.config import qwen25vl_3b, qwen25vl_7b
    from visionselector_tpu.models.qwen25vl.model import init_params

    _setup_compile_cache()
    if not _backend_alive():
        print(json.dumps({
            "metric": "prefill_speedup_at_20pct_retention",
            "value": 0.0, "unit": "x", "vs_baseline": 0.0, "suspect": True,
            "detail": {"error": "TPU backend unreachable (tunnel probe "
                                "timed out); no measurement taken"},
        }), flush=True)
        return

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
    # Contention gate: on the time-shared chip a heavy co-tenant stretches
    # dispatch latencies ~1000x and causes transient RESOURCE_EXHAUSTED for
    # programs that fit comfortably. Wait (bounded) for quiet, stamp the
    # level measured under, and retry HBM-spike failures with backoff.
    contention_s = None
    if jax.devices()[0].platform == "tpu":
        contention_s = round(_wait_for_quiet(), 3)
    params = jax.jit(lambda key: init_params(key, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    try:
        t_sel3, t_full3, n, check3 = _retry_contended(
            lambda: measure(cfg, params, budget, s_bucket, img_hw))
    except jax.errors.JaxRuntimeError as e:
        if "RESOURCE_EXHAUSTED" not in str(e):
            raise
        print(json.dumps({
            "metric": "prefill_speedup_at_20pct_retention",
            "value": 0.0, "unit": "x", "vs_baseline": 0.0, "suspect": True,
            "detail": {"error": "persistent RESOURCE_EXHAUSTED (co-tenant "
                                "HBM pressure on the time-shared chip); "
                                "no measurement taken",
                       "contention_probe_s": contention_s},
        }), flush=True)
        return
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
                       "prefill_ms_uncompressed": round(t_full3 * 1e3, 2),
                       **check3},
        }), flush=True)

    # Peak-HBM story (reference claim: 1.73x prefill "with 86.08% memory
    # reduction" at 20% retention, README.md:47, measured via
    # max_memory_allocated with per-sample peak reset). The device probe
    # returns 0 through the axon tunnel, so the evidence is the analytic
    # model: weights + KV + activation high-water per arm. Two reductions
    # are reported: including weights (what max_memory_allocated bounds)
    # and the per-sample incremental (KV+activations — the quantity that
    # actually shrinks with compression; the reference's 86.08% is only
    # reachable on a weights-excluded basis).
    n_text = int(os.environ.get("VST_BENCH_TEXT_TOKENS", "40")) + 2
    l_pad = s_bucket // cfg.vision.spatial_merge_unit
    t_sel_len = max(1, int(l_pad * budget)) + n_text
    t_full_len = l_pad + n_text
    mem_sel = hbm_model(cfg, params, s_bucket, t_sel_len)
    mem_full = hbm_model(cfg, params, s_bucket, t_full_len)
    hbm = {
        "hbm_model_selector_mb": round(mem_sel["peak"] / 2**20, 1),
        "hbm_model_uncompressed_mb": round(mem_full["peak"] / 2**20, 1),
        "hbm_reduction_with_weights": round(
            1 - mem_sel["peak"] / mem_full["peak"], 4),
        "hbm_reduction_incremental": round(
            1 - mem_sel["incremental"] / mem_full["incremental"], 4),
        "memory_story": memory_story(cfg, params, budget, n_text),
    }

    detail = {
        "prefill_ms_selector": round(t_sel3 * 1e3, 2),
        "prefill_ms_uncompressed": round(t_full3 * 1e3, 2),
        "vision_tokens": int(n),
        "kept_tokens": int(max(1, int(n * budget))),
        "budget": budget,
        "model": model_name,
        "speedup_3b": round(speedup3, 4),
        "check_3b": check3,
        "kv_cache_reduction_at_budget": round(
            kv_cache_reduction(cfg, budget, s_bucket, text_len=n_text), 4
        ),
        "peak_bytes_in_use": peak_memory_bytes(),
        "attn_impl": os.environ.get("VST_ATTN_IMPL"),
        "platform": jax.devices()[0].platform,
        "contention_probe_s": contention_s,
        **hbm,
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

    def final_line(speedup, detail):
        """The one-line final artifact. Printed IMMEDIATELY after the
        headline measurement (so a harness timeout during the extras below
        still leaves a final-format record — the r4 capture died with only
        the preliminary line), then reprinted with richer detail at the end;
        the driver records the LAST complete JSON line."""
        headline_check = detail.get("check_7b", detail.get("check_3b", {}))
        print(json.dumps({
            "metric": "prefill_speedup_at_20pct_retention",
            "value": round(speedup, 4),
            "unit": "x",
            "vs_baseline": round(speedup / BASELINE_SPEEDUP, 4),
            "suspect": bool(headline_check.get("suspect", False)),
            "detail": detail,
        }), flush=True)

    # Headline-comparable 7B measurement: the reference's 1.73x is a 7B
    # figure (README.md:47) where the LM dominates and compression buys more.
    speedup = speedup3
    params7 = None
    if run_7b:
        try:
            import gc

            del params
            gc.collect()
            cfg7 = qwen25vl_7b()
            params7 = init_7b_int8(cfg7)
            jax.block_until_ready(params7)
            t_sel7, t_full7, _, check7 = _retry_contended(
                lambda: measure(cfg7, params7, budget, s_bucket, img_hw))
            speedup = t_full7 / t_sel7
            mem_sel7 = hbm_model(cfg7, params7, s_bucket, t_sel_len)
            mem_full7 = hbm_model(cfg7, params7, s_bucket, t_full_len)
            detail.update(
                model="qwen2.5-vl-7b int8-LM (random weights)",
                speedup_7b_int8=round(speedup, 4),
                prefill_ms_selector=round(t_sel7 * 1e3, 2),
                prefill_ms_uncompressed=round(t_full7 * 1e3, 2),
                check_7b=check7,
                model_3b="qwen2.5-vl-3b (random weights)",
                prefill_ms_selector_3b=round(t_sel3 * 1e3, 2),
                prefill_ms_uncompressed_3b=round(t_full3 * 1e3, 2),
                hbm_model_selector_mb=round(mem_sel7["peak"] / 2**20, 1),
                hbm_model_uncompressed_mb=round(
                    mem_full7["peak"] / 2**20, 1),
                hbm_reduction_with_weights=round(
                    1 - mem_sel7["peak"] / mem_full7["peak"], 4),
                hbm_reduction_incremental=round(
                    1 - mem_sel7["incremental"] / mem_full7["incremental"],
                    4),
                memory_story=memory_story(cfg7, params7, budget, n_text),
            )
        except Exception as e:  # noqa: BLE001 — fall back to the 3B figure
            detail["bench_7b_error"] = repr(e)
            params7 = None

    # FINAL-FORMAT line, printed before any optional extras below: this is
    # the record if the harness times out from here on.
    final_line(speedup, detail)

    if params7 is not None:
        try:
            # Task-shaped second line: the same ratio at a realistic
            # 256-token text prompt (the synthetic default is ~40 tokens;
            # longer text dilutes the compressible fraction — this puts the
            # sensitivity on record, VERDICT r2 item 9). Deadline-gated:
            # it adds fresh compiles on a cold cache.
            if (os.environ.get("VST_BENCH_TASK_SHAPED", "1") == "1"
                    and _remaining_s() > 120.0):
                os.environ["VST_BENCH_TEXT_TOKENS"] = "256"
                t_sel_t, t_full_t, _, check_t = measure(
                    cfg7, params7, budget, s_bucket, img_hw, repeats=3)
                detail["task_shaped_256tok"] = {
                    "speedup": round(t_full_t / t_sel_t, 4),
                    "prefill_ms_selector": round(t_sel_t * 1e3, 2),
                    "prefill_ms_uncompressed": round(t_full_t * 1e3, 2),
                    **check_t,
                }
            if os.environ.get("VST_BENCH_DECODE", "0") == "1":
                detail["decode_tok_s_7b_int8_b8"] = round(
                    time_decode_tok_s(params7, cfg7, 8), 1)
                from visionselector_tpu.models.qwen25vl import lm as _lm

                # swap the LM for packed int4 (drop the int8 tree first —
                # int8 8.4 GB + int4 4.2 GB + ViT would crowd 16 GB HBM)
                params7["lm"] = None
                params7["lm"] = _lm.init_lm_params_int8(
                    jax.random.PRNGKey(7), cfg7.text, cfg7.jax_dtype, bits=4)
                detail["decode_tok_s_7b_int4_b8"] = round(
                    time_decode_tok_s(params7, cfg7, 8), 1)
        except Exception as e:  # noqa: BLE001 — keep the headline record
            detail["bench_extras_error"] = repr(e)
        # Superseding final line with the extras folded in (same headline
        # numbers; the value/suspect fields are identical by construction).
        if ("task_shaped_256tok" in detail
                or "decode_tok_s_7b_int8_b8" in detail
                or "bench_extras_error" in detail):
            final_line(speedup, detail)


if __name__ == "__main__":
    main()
