"""Measure the speculative-decoding cost claim on the chip.

Decode is weight-stream bound, so one lm_decode_chunk dispatch over m+1
tokens should cost about one lm_decode_step dispatch — making every
accepted proposal a free token. This bench times both dispatches (3B, B=1,
ctx 384) with chained differential timing and reports the ratio; the
end-to-end speedup is then (1 + accepted_per_step) / ratio, where
acceptance depends on how much real model output echoes the prompt
(VQA-style answers echo heavily; random test weights do not).

Usage: python tools/bench_speculative.py [m]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VST_ATTN_IMPL", "auto")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from visionselector_tpu.core.config import qwen25vl_3b
    from visionselector_tpu.models.qwen25vl import lm as lm_mod
    from visionselector_tpu.models.qwen25vl.model import init_params

    cfg = qwen25vl_3b()
    params = jax.jit(lambda k: init_params(k, cfg, with_selector=False))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    t_ctx, t_max = 384, 384 + 64 + m + 1
    dtype = cfg.jax_dtype

    def fresh_cache():
        c = lm_mod.init_kv_cache(cfg.text, 1, t_max, dtype)
        return lm_mod.KVCache(
            k=c.k, v=c.v, length=jnp.full_like(c.length, t_ctx))

    @functools.partial(jax.jit, static_argnames=("n", "t_c"))
    def chained(params, cache, tok0, n, t_c):
        def body(i, carry):
            tok, cache, acc = carry
            ids = jnp.full((t_c,), tok, jnp.int32)
            embeds = lm_mod.embed_tokens(params["lm"], ids)[None]
            pos = t_ctx + jnp.arange(t_c)
            pos3 = jnp.broadcast_to(pos[None, None, :], (3, 1, t_c))
            if t_c == 1:
                hidden, cache2 = lm_mod.lm_decode_step(
                    params["lm"], cache, embeds, pos3, cfg.text)
            else:
                hidden, cache2 = lm_mod.lm_decode_chunk(
                    params["lm"], cache, embeds, pos3, cfg.text)
            # keep length fixed so every iteration is shape/work-identical
            cache2 = lm_mod.KVCache(k=cache2.k, v=cache2.v,
                                    length=cache.length)
            logits = lm_mod.lm_head(params["lm"], hidden[0, -1], cfg.text)
            tok2 = jnp.argmax(logits).astype(jnp.int32)
            return tok2, cache2, acc + tok2

        tok, cache, acc = jax.lax.fori_loop(
            0, n, body, (tok0, cache, jnp.zeros((), jnp.int32)))
        return acc

    def time_tc(t_c, iters=48):
        cache = fresh_cache()
        tok0 = jnp.asarray(11, jnp.int32)
        f = lambda n: int(chained(params, cache, tok0, n, t_c))
        lo = iters // 2
        f(lo); f(iters)
        samples = []
        for _ in range(5):
            t0 = time.perf_counter(); f(lo); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); f(iters); tk = time.perf_counter() - t0
            samples.append((tk - t1) / (iters - lo))
        ok = sorted(s for s in samples if s > 1e-6)
        return ok[len(ok) // 2] if ok else float("nan")

    t1 = time_tc(1)
    tm = time_tc(m + 1)
    print(json.dumps({
        "m": m,
        "ms_single_step": round(t1 * 1e3, 3),
        "ms_chunk_step": round(tm * 1e3, 3),
        "chunk_over_single": round(tm / t1, 3),
        "breakeven_accept_rate": round(max(tm / t1 - 1.0, 0.0) / m, 3),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
