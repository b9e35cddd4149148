"""Compilation warmup for production serving.

Every (vision bucket, text bucket) pair is a distinct XLA program; the first
request hitting a cold shape pays its compile. This CLI drives one synthetic
generation per requested bucket so a server (api.serve) starts with every
program compiled — and, when ``JAX_COMPILATION_CACHE_DIR`` is set (JAX's
persistent compilation cache), later process restarts load the compiled
binaries from disk instead of recompiling.

Usage:
    JAX_COMPILATION_CACHE_DIR=/var/cache/xla \\
    python -m visionselector_tpu.api.warmup \\
        [--model-path /ckpt] [--method selector] [--budget 0.2] \\
        [--buckets 512,1024,2048] [--max-new-tokens 8]
"""

from __future__ import annotations

import argparse
import json
import time


def synth_image_for_bucket(patches: int, patch_size: int = 14,
                           merge: int = 2):
    """An image whose patch count lands in (not above) the given bucket."""
    import numpy as np

    side_patches = int(np.sqrt(patches))
    side_patches -= side_patches % merge
    side_patches = max(side_patches, merge)
    px = side_patches * patch_size
    rng = np.random.RandomState(patches)
    return (rng.rand(px, px, 3) * 255).astype(np.uint8)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-path", default=None)
    p.add_argument("--method", default="selector")
    p.add_argument("--budget", type=float, default=0.2)
    p.add_argument("--buckets", default="512,1024",
                   help="vision buckets (patch counts) to precompile")
    p.add_argument("--max-new-tokens", type=int, default=4)
    p.add_argument("--micro-batch", type=int, default=1,
                   help="also precompile the decode-batch programs "
                        "(powers of two up to this size) for serve "
                        "--micro-batch")
    args = p.parse_args(argv)

    import jax

    from visionselector_tpu.core.config import qwen25vl_tiny
    from visionselector_tpu.models.qwen25vl.model import (
        QwenVLEngine,
        init_params,
    )
    from visionselector_tpu.preprocess.image import preprocess_image
    from visionselector_tpu.preprocess.rope import expand_vision_tokens

    if args.model_path:
        from visionselector_tpu.models.qwen25vl.weights import (
            config_from_hf,
            load_hf_checkpoint,
        )

        cfg = config_from_hf(args.model_path)
        params = load_hf_checkpoint(args.model_path, cfg)
    else:
        cfg = qwen25vl_tiny()
        params = init_params(jax.random.PRNGKey(0), cfg)

    strategy = None
    if args.method not in ("orig", "selector"):
        from visionselector_tpu.selector.baselines import get_baseline

        strategy = get_baseline(args.method)
    engine = QwenVLEngine(
        cfg, params, use_selector=(args.method == "selector"),
        budget=args.budget, strategy=strategy,
    )

    for bucket in [int(b) for b in args.buckets.split(",")]:
        img = synth_image_for_bucket(bucket, cfg.vision.patch_size,
                                     cfg.vision.spatial_merge_size)
        pixels, grid = preprocess_image(
            img, min_pixels=1, max_pixels=10**9,
            patch_size=cfg.vision.patch_size,
            temporal_patch_size=cfg.vision.temporal_patch_size,
            merge_size=cfg.vision.spatial_merge_size,
        )
        ids = expand_vision_tokens(
            [100, 200], [300, 400], grid,
            image_token_id=cfg.image_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
            vision_end_token_id=cfg.vision_end_token_id,
        )
        t0 = time.perf_counter()
        engine.generate(ids, pixels, grid,
                        max_new_tokens=args.max_new_tokens)
        print(json.dumps({
            "bucket": bucket, "patches": int(pixels.shape[0]),
            "warmup_s": round(time.perf_counter() - t0, 2),
        }))
    # text-only program too
    import numpy as np

    t0 = time.perf_counter()
    engine.generate(np.asarray([100, 200, 300], np.int64),
                    max_new_tokens=args.max_new_tokens)
    print(json.dumps({"bucket": "text_only",
                      "warmup_s": round(time.perf_counter() - t0, 2)}))

    # decode-batch programs (generate_batch pads B to powers of two; the
    # batched loop compiles per (B, T) — precompile each size the server's
    # --micro-batch can produce at the default generation length)
    if args.micro_batch > 1:
        req = dict(input_ids=ids, pixel_values=pixels, grid_thw=grid)
        b = 2
        while b <= args.micro_batch:
            t0 = time.perf_counter()
            engine.generate_batch([req] * b,
                                  max_new_tokens=args.max_new_tokens)
            print(json.dumps({"decode_batch": b,
                              "warmup_s": round(time.perf_counter() - t0, 2)}))
            b *= 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
