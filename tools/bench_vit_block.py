"""Per-component cost of ONE ViT window block (3B shapes) on the chip.

Variants (DCE does the isolation):
  real    — full block with the diag window attention
  sumqkv  — attn := q+k+v   (rotary alive, no attention kernel/transposes)
  vonly   — attn := v       (rotary dead-coded away too)

  real - sumqkv  ~= attention kernel + its layout boundary
  sumqkv - vonly ~= rotary application cost
  vonly          ~= matmuls + norms + mlp glue (the irreducible-ish core)

Usage: python tools/bench_vit_block.py [s_bucket]
"""

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
    from visionselector_tpu.kernels.attention import DIAG_BLOCK, attention_diag
    from visionselector_tpu.models.qwen25vl import vit as vit_mod
    from visionselector_tpu.preprocess.image import preprocess_image
    from visionselector_tpu.preprocess.indices import (
        aligned_window_len,
        build_vision_batch,
    )

    s_bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 5632
    cfg = qwen25vl_3b().vision
    rng = np.random.RandomState(0)
    img = (rng.rand(1036, 1456, 3) * 255).astype(np.uint8)
    pixels, grid = preprocess_image(img)
    need = aligned_window_len(grid)
    s_bucket = max(s_bucket, -(-need // 512) * 512)
    vb = build_vision_batch(pixels, grid, pad_to=s_bucket, align_windows=True)

    from visionselector_tpu.models.qwen25vl.model import init_params
    full = jax.jit(
        lambda k: init_params(k, qwen25vl_3b(), with_selector=False)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(full)
    blocks = full["visual"]["blocks"]
    p0 = jax.tree.map(lambda a: a[0], blocks)  # layer 0 params

    wseg = jnp.asarray(vb.window_seg_ids)
    x0 = jnp.asarray(rng.randn(s_bucket, cfg.hidden_size) * 0.02,
                     jnp.bfloat16)
    # rope tables like vit_forward builds them
    rot = jnp.asarray(vb.rot_pos_ids)
    inv = 1.0 / 10000 ** (jnp.arange(0, cfg.head_dim // 2, 2,
                                     dtype=jnp.float32)
                          / (cfg.head_dim // 2))
    freqs = jnp.concatenate(
        [rot[:, 0:1] * inv[None], rot[:, 1:2] * inv[None]], axis=-1)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    cos, sin = jnp.cos(emb), jnp.sin(emb)

    wblock = min(DIAG_BLOCK, s_bucket)

    def attn_real(q, k, v):
        return attention_diag(q[None], k[None], v[None], wseg[None],
                              scale=cfg.head_dim**-0.5, block_q=wblock)[0]

    variants = {
        "real": attn_real,
        "sumqkv": lambda q, k, v: q + k + v,
        "vonly": lambda q, k, v: v,
    }

    result = {"s_bucket": s_bucket, "platform": jax.devices()[0].platform}
    for name, attn_fn in variants.items():
        @functools.partial(jax.jit, static_argnames=("n",))
        def chained(x, n, attn_fn=attn_fn):
            def body(i, carry):
                xx, acc = carry
                out = vit_mod._block(xx, p0, None, cos, sin, cfg,
                                     attn_fn=attn_fn)
                sc = out[0, 0].astype(jnp.float32)
                xx = xx.at[0, 0].add(sc.astype(xx.dtype) * 1e-6)
                return xx, acc + sc
            _, acc = jax.lax.fori_loop(0, n, body,
                                       (x, jnp.zeros((), jnp.float32)))
            return acc

        f = lambda n: float(chained(x0, n))
        f(1); f(32)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter(); f(1); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); f(32); tk = time.perf_counter() - t0
            samples.append((tk - t1) / 31)
        result[f"ms_{name}"] = round(sorted(samples)[1] * 1e3, 3)
        print(f"[{name}] {result[f'ms_{name}']} ms", flush=True)

    result["ms_attention_boundary"] = round(
        result["ms_real"] - result["ms_sumqkv"], 3)
    result["ms_rotary"] = round(
        result["ms_sumqkv"] - result["ms_vonly"], 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
