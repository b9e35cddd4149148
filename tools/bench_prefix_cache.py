"""Serving latency: fresh full request vs cross-request KV prefix-cache hit.

Scenario: one image + fixed system prompt asked several different questions
(the prefix-cache serving pattern). A hit skips the ViT encode and the full
LM prefill — only the question suffix runs one chunked append before decode.
Runs on whatever backend jax picks (the real TPU under axon). Prints one
JSON line with median wall-clock per request.

Usage: python tools/bench_prefix_cache.py [max_new_tokens] [repeats]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    from visionselector_tpu.core.config import qwen25vl_3b
    from visionselector_tpu.models.qwen25vl.model import (
        PrefixCacheStore,
        QwenVLEngine,
        generate_prefix_cached,
        init_params,
    )
    from visionselector_tpu.preprocess.image import preprocess_image
    from visionselector_tpu.preprocess.rope import expand_vision_tokens

    max_new = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    cfg = qwen25vl_3b()
    params = jax.jit(lambda k: init_params(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    engine = QwenVLEngine(cfg, params, use_selector=True, budget=0.2)

    rng = np.random.RandomState(0)
    img = (rng.rand(1036, 1456, 3) * 255).astype(np.uint8)
    pixels, grid = preprocess_image(img)

    def ids_for(q_seed):
        q = list(1000 + np.arange(20) + 50 * q_seed)
        return expand_vision_tokens(
            list(range(100, 120)), q, grid,
            image_token_id=cfg.image_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
            vision_end_token_id=cfg.vision_end_token_id,
        )

    kw = dict(max_new_tokens=max_new, eos_token_ids=(-1,))
    store = PrefixCacheStore(min_prefix=32)

    # warm both programs: fresh prefill+decode, then append+decode on a hit
    engine.generate(ids_for(0), pixels, grid, **kw)
    generate_prefix_cached(engine, store, ids_for(0), pixels, grid, **kw)
    generate_prefix_cached(engine, store, ids_for(1), pixels, grid, **kw)
    assert store.hits >= 1, "warmup did not hit the prefix cache"

    fresh_ms, fresh_prefill_ms = [], []
    for i in range(repeats):
        t0 = time.perf_counter()
        r = engine.generate(ids_for(2 + i), pixels, grid, **kw)
        fresh_ms.append((time.perf_counter() - t0) * 1e3)
        fresh_prefill_ms.append(r.prefill_seconds * 1e3)

    hit_ms, hit_prefill_ms = [], []
    for i in range(repeats):
        t0 = time.perf_counter()
        r = generate_prefix_cached(
            engine, store, ids_for(2 + i), pixels, grid, **kw)
        hit_ms.append((time.perf_counter() - t0) * 1e3)
        hit_prefill_ms.append(r.prefill_seconds * 1e3)
    assert store.hits >= 1 + repeats

    med = statistics.median
    print(json.dumps({
        "max_new_tokens": max_new,
        "repeats": repeats,
        "fresh_ms": round(med(fresh_ms), 1),
        "fresh_prefill_ms": round(med(fresh_prefill_ms), 1),
        "prefix_hit_ms": round(med(hit_ms), 1),
        "hit_append_ms": round(med(hit_prefill_ms), 1),
        "request_speedup": round(med(fresh_ms) / med(hit_ms), 2),
        "prefill_speedup": round(
            med(fresh_prefill_ms) / med(hit_prefill_ms), 2),
        "hits": store.hits,
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
