"""Serving throughput: sequential generate vs decode-batched generate_batch.

Measures end-to-end requests/s for a batch of ChartQA-scale image requests
(prefill is per-request either way; generate_batch joins all decodes into one
weight-bandwidth-bound dispatch). Runs on whatever backend jax picks (the
real TPU under axon). Prints one JSON line.

Usage: python tools/bench_serving.py [n_requests] [max_new_tokens]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    from visionselector_tpu.core.config import qwen25vl_3b
    from visionselector_tpu.models.qwen25vl.model import (
        QwenVLEngine,
        init_params,
    )
    from visionselector_tpu.preprocess.image import preprocess_image
    from visionselector_tpu.preprocess.rope import expand_vision_tokens

    n_req = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    max_new = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    cfg = qwen25vl_3b()
    params = jax.jit(lambda k: init_params(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    engine = QwenVLEngine(cfg, params, use_selector=True, budget=0.2)

    rng = np.random.RandomState(0)
    reqs = []
    for i in range(n_req):
        img = (rng.rand(1036, 1456, 3) * 255).astype(np.uint8)
        pixels, grid = preprocess_image(img)
        ids = expand_vision_tokens(
            list(range(100, 120)), list(range(300, 320)), grid,
            image_token_id=cfg.image_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
            vision_end_token_id=cfg.vision_end_token_id,
        )
        reqs.append(dict(input_ids=ids, pixel_values=pixels, grid_thw=grid))

    kw = dict(max_new_tokens=max_new, eos_token_ids=(-1,))
    # warm compile both paths at the FULL batch size (the decode loop
    # compiles per (B, T); generate_batch pads B to powers of two)
    engine.generate(**reqs[0], **kw)
    engine.generate_batch(reqs, **kw)

    t0 = time.perf_counter()
    seq = [engine.generate(**r, **kw) for r in reqs]
    t_seq = time.perf_counter() - t0

    t0 = time.perf_counter()
    bat = engine.generate_batch(reqs, **kw)
    t_bat = time.perf_counter() - t0

    # bf16 batched matmul tiling differs numerically from B=1; with RANDOM
    # weights argmax over ~uniform logits is knife-edge, so greedy rollouts
    # can diverge — report agreement instead of asserting (the CPU fp32
    # equality tests in test_batch_decode.py pin the semantics).
    agree = sum(s.tokens == b.tokens for s, b in zip(seq, bat))
    print(json.dumps({
        "n_requests": n_req,
        "max_new_tokens": max_new,
        "sequential_req_s": round(n_req / t_seq, 2),
        "batched_req_s": round(n_req / t_bat, 2),
        "speedup": round(t_seq / t_bat, 2),
        "greedy_rollouts_identical": f"{agree}/{n_req}",
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
