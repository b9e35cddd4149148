"""Decompose the 3B ViT time by layer type + isolate the attention ops.

Three full-ViT variants (all-window / mixed / all-full) give a linear system
for (base matmul+glue, per-window-layer, per-full-layer) costs; two isolated
attention chains measure the attention ops alone (no qkv/proj/mlp). This is
the measurement base for deciding whether the remaining ViT gap is
reducible on v5e (VERDICT r3 item 4).

Usage: python tools/bench_vit_layers.py [s_bucket]
"""

import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VST_ATTN_IMPL", "auto")
os.environ.setdefault("VST_ALIGN_WINDOWS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from visionselector_tpu.core.config import qwen25vl_3b
    from visionselector_tpu.models.qwen25vl import vit as vit_mod
    from visionselector_tpu.preprocess.image import preprocess_image
    from visionselector_tpu.preprocess.indices import (
        aligned_window_len,
        build_vision_batch,
    )

    s_bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 5632
    cfg0 = qwen25vl_3b()
    rng = np.random.RandomState(0)
    img = (rng.rand(1036, 1456, 3) * 255).astype(np.uint8)
    pixels, grid = preprocess_image(img)
    need = aligned_window_len(
        grid, window_size=cfg0.vision.window_size,
        spatial_merge_size=cfg0.vision.spatial_merge_size,
        patch_size=cfg0.vision.patch_size,
    )
    s_bucket = max(s_bucket, -(-need // 512) * 512)
    vb = build_vision_batch(
        pixels, grid, window_size=cfg0.vision.window_size,
        spatial_merge_size=cfg0.vision.spatial_merge_size,
        patch_size=cfg0.vision.patch_size, pad_to=s_bucket,
        align_windows=True,
    )

    from visionselector_tpu.models.qwen25vl.model import init_params
    params = jax.jit(lambda k: init_params(k, cfg0, with_selector=False))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)

    rot = jnp.asarray(vb.rot_pos_ids)
    wseg = jnp.asarray(vb.window_seg_ids)
    fseg = jnp.asarray(vb.full_seg_ids)
    rev = jnp.asarray(vb.reverse_index)
    px = jnp.asarray(vb.pixel_values, jnp.float32)
    wb = jnp.asarray(vb.window_kv_bounds)
    fb = jnp.asarray(vb.full_kv_bounds)

    def make_chained(vcfg):
        @functools.partial(jax.jit, static_argnames=("n",))
        def chained(params, px, n):
            def body(i, carry):
                p, acc = carry
                out = vit_mod.vit_forward(
                    params["visual"], p, rot, wseg, fseg, rev, vcfg,
                    window_kv_bounds=wb, full_kv_bounds=fb,
                    window_diag=vb.window_diag,
                )
                s = out[0, 0]
                p = p.at[0, 0].add(s.astype(p.dtype) * 1e-20)
                return p, acc + s
            _, acc = jax.lax.fori_loop(
                0, n, body, (px, jnp.zeros((), jnp.float32)))
            return acc
        return chained

    def timeit(fn, *args, iters=8):
        f = lambda n: float(fn(params, *args, n))
        f(1); f(iters)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter(); f(1); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); f(iters); tk = time.perf_counter() - t0
            samples.append((tk - t1) / (iters - 1))
        return sorted(samples)[1]

    result = {"s_bucket": s_bucket, "platform": jax.devices()[0].platform}

    variants = {
        "mixed": cfg0.vision,
        "all_window": dataclasses.replace(
            cfg0.vision, fullatt_block_indexes=()),
        "all_full": dataclasses.replace(
            cfg0.vision,
            fullatt_block_indexes=tuple(range(cfg0.vision.depth))),
    }
    times = {}
    for name, vcfg in variants.items():
        t = timeit(make_chained(vcfg), px)
        times[name] = t
        result[f"vit_ms_{name}"] = round(t * 1e3, 2)
        print(f"[{name}] {t*1e3:.2f} ms", flush=True)

    # Solve: mixed = B + 28w + 4f; all_window = B + 32w; all_full = B + 32f
    d = cfg0.vision.depth
    nf = len(cfg0.vision.fullatt_block_indexes)
    w_minus_f = (times["all_window"] - times["all_full"]) / d
    # mixed - all_window = nf*(f - w)
    f_minus_w = (times["mixed"] - times["all_window"]) / nf
    result["per_layer_full_minus_window_ms"] = round(f_minus_w * 1e3, 3)
    result["consistency_ms"] = round((w_minus_f + f_minus_w) * 1e3, 3)

    # Isolated attention ops (no projections): q,k,v random [1, S, H, D].
    from visionselector_tpu.kernels.attention import attention, attention_diag

    h, dh = cfg0.vision.num_heads, cfg0.vision.head_dim
    q = jnp.asarray(rng.randn(1, s_bucket, h, dh) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, s_bucket, h, dh) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, s_bucket, h, dh) * 0.1, jnp.bfloat16)

    fblock = s_bucket // fb.shape[0]
    wblock = s_bucket // wb.shape[0]

    @functools.partial(jax.jit, static_argnames=("n", "kind"))
    def attn_chained(params, q, n, kind):
        def body(i, carry):
            qq, acc = carry
            if kind == "full":
                out = attention(qq, k, v, fseg[None], fseg[None],
                                causal=False, kv_bounds=fb,
                                block_q=fblock, block_k=fblock)
            else:
                out = attention_diag(qq, k, v, wseg[None], block_q=wblock)
            s = out[0, 0, 0, 0].astype(jnp.float32)
            qq = qq.at[0, 0, 0, 0].add(s.astype(qq.dtype) * 1e-6)
            return qq, acc + s
        _, acc = jax.lax.fori_loop(
            0, n, body, (q, jnp.zeros((), jnp.float32)))
        return acc

    for kind in ("full", "window"):
        f = lambda n: float(attn_chained(params, q, n, kind))
        f(1); f(32)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter(); f(1); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); f(32); tk = time.perf_counter() - t0
            samples.append((tk - t1) / 31)
        result[f"attn_only_ms_{kind}"] = round(sorted(samples)[1] * 1e3, 3)
        print(f"[attn {kind}] {result[f'attn_only_ms_{kind}']} ms",
              flush=True)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
