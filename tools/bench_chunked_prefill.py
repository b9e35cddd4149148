"""Streaming-stall benefit of chunked admission prefills.

One long-decoding request streams while short vision requests keep
arriving. The fused arm admits each newcomer with a whole-prompt prefill
between two decode chunks — the streamer stalls for the full prefill.
The chunked arm (prefill_chunk > 0) interleaves fixed-size decoder
segments with decode chunks, bounding the stall per iteration.

Metric: ``max_decode_gap_ms`` — the worst wall gap between consecutive
decode dispatches while the pool was live (what a streaming client sees
as its longest inter-chunk hiccup). Prints one JSON line.

Usage: python tools/bench_chunked_prefill.py [n_admissions] [seg]
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    from visionselector_tpu.core.config import qwen25vl_3b
    from visionselector_tpu.models.qwen25vl.continuous import (
        ContinuousBatcher,
    )
    from visionselector_tpu.models.qwen25vl.model import (
        QwenVLEngine,
        init_params,
    )
    from visionselector_tpu.preprocess.image import preprocess_image
    from visionselector_tpu.preprocess.rope import expand_vision_tokens

    n_adm = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    seg = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    cfg = qwen25vl_3b()
    params = jax.jit(lambda k: init_params(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    engine = QwenVLEngine(cfg, params, use_selector=True, budget=0.2)

    rng = np.random.RandomState(0)
    img = (rng.rand(1036, 1456, 3) * 255).astype(np.uint8)
    pixels, grid = preprocess_image(img)

    def ids_for(i):
        return expand_vision_tokens(
            list(range(100, 120)), list(1000 + np.arange(20) + 31 * i),
            grid,
            image_token_id=cfg.image_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
            vision_end_token_id=cfg.vision_end_token_id,
        )

    long_req = dict(input_ids=ids_for(0), pixel_values=pixels,
                    grid_thw=grid)
    short_reqs = [dict(input_ids=ids_for(i + 1), pixel_values=pixels,
                       grid_thw=grid) for i in range(n_adm)]
    long_budget = 160
    short_budget = 8

    def run_arm(prefill_chunk, vit_segments=0):
        bat = ContinuousBatcher(engine, n_slots=4, t_max=2048, chunk=8,
                                prefill_chunk=prefill_chunk,
                                prefill_vit_segments=vit_segments)
        # warm every program this arm uses (admission + decode), then
        # reset the gap stat so compiles don't count as stalls
        bat.submit(short_reqs[0], 4, (-1,))
        bat.stats["max_decode_gap_ms"] = 0.0
        done = []

        def streamer():
            t0 = time.perf_counter()
            bat.submit(long_req, long_budget, (-1,))
            done.append(time.perf_counter() - t0)

        th = threading.Thread(target=streamer)
        th.start()
        time.sleep(1.0)  # let the streamer admit and start decoding
        lat = []
        for r in short_reqs:
            t0 = time.perf_counter()
            bat.submit(r, short_budget, (-1,))
            lat.append(time.perf_counter() - t0)
        th.join()
        stats = dict(bat.stats)
        bat.shutdown()
        return {
            "max_decode_gap_ms": round(stats["max_decode_gap_ms"], 1),
            "short_p50_ms": round(sorted(lat)[len(lat) // 2] * 1e3, 1),
            "streamer_total_s": round(done[0], 2),
            "chunked_admissions": stats["chunked_admissions"],
            "prefill_chunks": stats["prefill_chunks"],
        }

    vseg = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    fused = run_arm(0)
    chunked = run_arm(seg)
    chunked_vit = run_arm(seg, vit_segments=vseg) if vseg > 1 else None
    out = {
        "bench": "chunked_prefill_stall",
        "n_admissions": n_adm,
        "segment_tokens": seg,
        "fused": fused,
        "chunked": chunked,
        "stall_reduction": round(
            1 - chunked["max_decode_gap_ms"]
            / max(fused["max_decode_gap_ms"], 1e-9), 3),
        "platform": jax.devices()[0].platform,
    }
    if chunked_vit is not None:
        out["chunked_vit_segments"] = vseg
        out["chunked_vit"] = chunked_vit
        out["stall_reduction_vit"] = round(
            1 - chunked_vit["max_decode_gap_ms"]
            / max(fused["max_decode_gap_ms"], 1e-9), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
