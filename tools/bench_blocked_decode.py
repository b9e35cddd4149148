"""Length-aware (blocked) decode attention vs dense XLA on a slot pool.

The continuous-batching pool is provisioned for its LONGEST admissible
request ([L, S, t_max]); the dense XLA decode attention reads every slot at
t_max per step regardless of how little is live. The blocked Pallas kernel
(``kernels/attention._decode_blocked_kernel``) fetches only each slot's
live prefix (length-clamped tile index map — the pipeline skips the DMA
when the mapped tile is unchanged), so its KV traffic is
sum_s ceil((len_s + chunk)/block) tiles instead of S * t_max/block.

Two workloads x two arms (interleaved chained differentials, the repo's
standard tunnel-immune timing idiom):
  - "short":   slots filled to t_fill_short (default t_max/16) — the win
               case: most of the pool is dead tail.
  - "full":    slots filled to ~t_max — regression check; the blocked
               kernel should be ~neutral vs dense here.

Usage: python tools/bench_blocked_decode.py [t_max] [n_slots] [config]
(config: "3b" default, "tiny" for a CPU smoke run.)
"""

import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from visionselector_tpu.core.config import qwen25vl_3b, qwen25vl_tiny
    from visionselector_tpu.models.qwen25vl import lm as lm_mod
    from visionselector_tpu.models.qwen25vl.continuous import (
        _decode_chunk_slots,
    )
    from visionselector_tpu.models.qwen25vl.model import init_params

    t_max = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    n_slots = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    which = sys.argv[3] if len(sys.argv) > 3 else "3b"
    # optional 4th arg int8/int4: weight-only LM quantization — the
    # deployment-relevant serving config, and the regime where the KV pool
    # is a large share of per-step HBM traffic (so windowing matters)
    quant = sys.argv[4] if len(sys.argv) > 4 else None
    chunk = 8

    if which == "tiny":
        jax.config.update("jax_platforms", "cpu")
        # CPU smoke: interpret-mode Pallas, tile small enough to divide
        # the smoke pool (the env knob is read at trace time)
        os.environ.setdefault("VST_DECODE_BLOCK", "64")
    cfg = qwen25vl_tiny() if which == "tiny" else qwen25vl_3b()
    if quant:
        # decode touches only params["lm"]; random-init DIRECTLY quantized
        # (init-bf16-then-quantize transiently holds bf16+int8+ViT ≈ 13 GB
        # at 3B — on the time-shared chip that window is where co-tenant
        # pressure kills the run)
        bits = 4 if quant.startswith("int4") else 8
        lm_q = lm_mod.init_lm_params_int8(
            jax.random.PRNGKey(0), cfg.text, dtype=cfg.jax_dtype,
            bits=bits)
        jax.block_until_ready(lm_q)
        params = {"lm": lm_q}
    else:
        params = jax.jit(lambda k: init_params(k, cfg))(
            jax.random.PRNGKey(0))
        jax.block_until_ready(params)

    tc = cfg.text
    shape = (tc.num_hidden_layers, n_slots, t_max,
             tc.num_key_value_heads, tc.head_dim)
    rng = jax.random.PRNGKey(1)
    kv_dtype = cfg.jax_dtype
    k_f = (jax.random.normal(rng, shape, jnp.float32) * 0.5).astype(kv_dtype)
    v_f = (jax.random.normal(jax.random.fold_in(rng, 1), shape,
                             jnp.float32) * 0.5).astype(kv_dtype)
    jax.block_until_ready((k_f, v_f))

    temps = jnp.zeros((n_slots,), jnp.float32)
    tps = jnp.ones((n_slots,), jnp.float32)
    tks = jnp.zeros((n_slots,), jnp.int32)
    keys = jnp.zeros((n_slots, 2), jnp.uint32)
    live = jnp.ones((n_slots,), bool)
    cur = jnp.arange(100, 100 + n_slots, dtype=jnp.int32)

    # Chaining happens INSIDE _decode_chunk_slots' own lax.scan (static
    # k = n*chunk steps in ONE dispatch) — the production program shape.
    # NOTE on transient RESOURCE_EXHAUSTED through the axon tunnel: the
    # chip is time-shared, and a heavy co-tenant's HBM spike makes
    # well-fitting programs fail (and a tiny matmul take minutes). An
    # earlier session misattributed this to int8-weights-in-a-fori-loop;
    # A/B tests showed identical programs pass or fail depending on the
    # minute they run. If this bench dies with ResourceExhausted, wait
    # for a quiet chip (see bench.py:_wait_for_quiet) and re-run.
    # Re-jit without the production donate (repeated timing calls reuse
    # the pool).
    raw_chunk_slots = jax.jit(
        _decode_chunk_slots.__wrapped__,
        static_argnames=("cfg", "k", "sampled", "penalized", "attn_impl",
                         "attn_window"))
    pres = jnp.zeros((n_slots, tc.vocab_size), jnp.bool_)
    rps = jnp.ones((n_slots,), jnp.float32)

    def chained(params, pool, pos, n, attn_impl, attn_window=None):
        toks, _, _, _ = raw_chunk_slots(
            params, pool, cur, pos, live, temps, tps, tks, keys, pres,
            rps, cfg, n * chunk, False, attn_impl=attn_impl,
            attn_window=attn_window)
        return jnp.sum(toks[-1])

    lo, hi = 2, 4
    headroom = 64 * ((hi * chunk + chunk + 63) // 64)
    impls = ("xla", "blocked_interpret" if which == "tiny" else "blocked")

    def run_workload(t_fill):
        length = jnp.full((tc.num_hidden_layers, n_slots), t_fill, jnp.int32)
        pool = lm_mod.KVCache(k=k_f, v=v_f, length=length)
        pos = jnp.full((n_slots,), t_fill, jnp.int32)
        # the serving auto_window bucket for this fill — the batcher's own
        # formula, so the measured window shape is what serving dispatches
        from visionselector_tpu.models.qwen25vl.continuous import (
            window_bucket,
        )

        win = window_bucket(t_fill + hi * chunk + chunk, t_max)
        arms = [(impl, None) for impl in impls]
        if win is not None:
            arms.append(("xla", win))

        def once(impl, w):
            t0 = time.perf_counter()
            int(chained(params, pool, pos, lo, impl, w))
            t1 = time.perf_counter()
            int(chained(params, pool, pos, hi, impl, w))
            t2 = time.perf_counter()
            return ((t2 - t1) - (t1 - t0)) / (hi - lo)

        for impl, w in arms:  # compile both spans of every arm
            int(chained(params, pool, pos, lo, impl, w))
            int(chained(params, pool, pos, hi, impl, w))
        samples = {a: [] for a in arms}
        for _ in range(5):  # interleave arms
            for a in arms:
                samples[a].append(once(*a))
        med = {}
        suspect = False
        for a in arms:
            pos_s = [s for s in samples[a] if s > 0]
            if not pos_s:
                med[a] = statistics.median(samples[a])
                suspect = True
            else:
                med[a] = statistics.median(pos_s)
        return med, suspect, win

    out = {"t_max": t_max, "n_slots": n_slots, "chunk": chunk,
           "quant": quant or "bf16",
           "platform": jax.devices()[0].platform,
           "pool_gb": round(2 * k_f.nbytes / 2**30, 2)}
    short_fill = max(chunk, t_max // 16)
    for name, t_fill in (("short", short_fill),
                         ("full", t_max - headroom)):
        med, suspect, win = run_workload(t_fill)
        toks = chunk * n_slots
        dense = med[("xla", None)]
        blk = med[(impls[1], None)]
        ok = dense > 0 and blk > 0
        line = {
            "t_fill": t_fill,
            "chunk_ms_xla": round(dense * 1e3, 2),
            "chunk_ms_blocked": round(blk * 1e3, 2),
            "speedup_blocked": round(dense / blk, 3) if ok else None,
            "tok_per_s_xla": round(toks / dense, 1) if ok else None,
            "tok_per_s_blocked": round(toks / blk, 1) if ok else None,
            "suspect": suspect or not ok,
        }
        if win is not None:
            w = med[("xla", win)]
            line.update({
                "attn_window": win,
                "chunk_ms_windowed": round(w * 1e3, 2),
                "speedup_windowed": (round(dense / w, 3)
                                     if ok and w > 0 else None),
                "tok_per_s_windowed": (round(toks / w, 1)
                                       if w > 0 else None),
            })
        out[name] = line
    print(json.dumps(out))


if __name__ == "__main__":
    main()
