"""ViT micro-benchmark on the real TPU (differential timing; see bench.py).

Usage: VST_WINDOW_BLOCK=128 python tools/bench_vit.py [s_bucket]
Prints one JSON line with per-variant times.
"""

import functools
import json
import os
import sys
import time

# NOTE: do NOT use PYTHONPATH for this — the env var breaks the axon TPU
# plugin discovery in this environment; an in-process sys.path insert is fine.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VST_ATTN_IMPL", "auto")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from visionselector_tpu.core.config import qwen25vl_3b
    from visionselector_tpu.preprocess.image import preprocess_image
    from visionselector_tpu.preprocess.indices import build_vision_batch
    from visionselector_tpu.models.qwen25vl import vit as vit_mod

    s_bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 5632
    cfg = qwen25vl_3b()
    rng = np.random.RandomState(0)
    img = (rng.rand(1036, 1456, 3) * 255).astype(np.uint8)
    pixels, grid = preprocess_image(img)
    align = os.environ.get("VST_ALIGN_WINDOWS") == "1"
    if align:
        from visionselector_tpu.preprocess.indices import aligned_window_len

        need = aligned_window_len(
            grid, window_size=cfg.vision.window_size,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            patch_size=cfg.vision.patch_size,
        )
        s_bucket = max(s_bucket, -(-need // 512) * 512)
    vb = build_vision_batch(
        pixels, grid, window_size=cfg.vision.window_size,
        spatial_merge_size=cfg.vision.spatial_merge_size,
        patch_size=cfg.vision.patch_size, pad_to=s_bucket,
        align_windows=align,
    )

    from visionselector_tpu.models.qwen25vl.model import init_params
    params = jax.jit(lambda k: init_params(k, cfg, with_selector=False))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    int8_vit = os.environ.get("VST_INT8_VIT") == "1"
    if int8_vit:
        params = dict(params)
        params["visual"] = jax.jit(vit_mod.quantize_vit_params)(
            params["visual"])
        jax.block_until_ready(params)

    base_args = dict(
        rot_pos_ids=jnp.asarray(vb.rot_pos_ids),
        window_seg_ids=jnp.asarray(vb.window_seg_ids),
        full_seg_ids=jnp.asarray(vb.full_seg_ids),
        reverse_index=jnp.asarray(vb.reverse_index),
    )
    px = jnp.asarray(vb.pixel_values, jnp.float32)
    wb = jnp.asarray(vb.window_kv_bounds)
    fb = jnp.asarray(vb.full_kv_bounds)

    @functools.partial(jax.jit, static_argnames=("n", "use_bounds"))
    def chained(params, px, n, use_bounds):
        def body(i, carry):
            p, acc = carry
            out = vit_mod.vit_forward(
                params["visual"], p, base_args["rot_pos_ids"],
                base_args["window_seg_ids"], base_args["full_seg_ids"],
                base_args["reverse_index"], cfg.vision,
                window_kv_bounds=wb if use_bounds else None,
                full_kv_bounds=fb if use_bounds else None,
                window_diag=vb.window_diag,
            )
            s = out[0, 0]
            p = p.at[0, 0].add(s.astype(p.dtype) * 1e-20)
            return p, acc + s
        _, acc = jax.lax.fori_loop(0, n, body, (px, jnp.zeros((), jnp.float32)))
        return acc

    def timeit(use_bounds, iters=8):
        f = lambda n: float(chained(params, px, n, use_bounds))
        f(1); f(iters)
        t0 = time.perf_counter(); f(1); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); f(iters); tk = time.perf_counter() - t0
        return (tk - t1) / (iters - 1)

    t_bounds = timeit(True)
    result = {
        "s_bucket": s_bucket,
        "window_block": os.environ.get("VST_WINDOW_BLOCK", "128"),
        "aligned": align,
        "int8_vit": int8_vit,
        "window_diag": bool(vb.window_diag),
        "vit_ms_bounds": round(t_bounds * 1e3, 2),
        "platform": jax.devices()[0].platform,
    }
    if os.environ.get("VST_BENCH_NOBOUNDS") == "1":
        result["vit_ms_nobounds"] = round(timeit(False) * 1e3, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
