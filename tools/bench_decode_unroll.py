"""Decode-step KV traffic: stacked-pool layer scan vs unrolled per-layer
buffers.

`bench_decode_attrib.py` measured the production decode chunk at **2.33x the
read-only KV roofline slope** (ms per pool-GB) while the matmul-only arm sits
~16% over the weight-stream floor. The remaining suspect is the stacked
[L, B, T, H, D] pool carried through the layer `lax.scan`: each iteration
scatter-writes one row then reads its layer via ``dynamic_index_in_dim`` —
if XLA materializes that slice (to keep the in-place carry update legal),
every layer pays a full layer-pool COPY (read+write) on top of the attention
read, i.e. ~3x traffic on the sliced layer, ~2-2.5x overall.

This tool times the same decode math two ways, chained k steps inside one
jit (differential k_hi - k_lo cancels dispatch/fetch overhead):

- ``scan``: the production ``lm_decode_step`` (stacked pools, layer scan).
- ``unroll``: layer loop unrolled in Python over per-layer [B, T, H, D]
  cache buffers — no stacked pool, no dynamic layer slice; the scatter
  write and the attention read hit each buffer directly.

If the unrolled slope lands ~1x the read-only roofline, the scan's layer
slice is the copy and the fix is worth productionizing; if it stays ~2x,
the traffic is inherent to the attention read pattern and the question is
closed.

Usage: bench_decode_unroll.py [which] [variants] [t_max ...]
Defaults: 3b scan,unroll 2048 8192. On CPU use ``tiny``.
"""

import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


B = 8
CHUNK = 8


def time_arm(fn):
    lo, hi = 2, 4
    for n in (lo, hi):
        jax.block_until_ready(fn(n * CHUNK))

    def once():
        t0 = time.perf_counter()
        int(fn(lo * CHUNK))
        t1 = time.perf_counter()
        int(fn(hi * CHUNK))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / ((hi - lo) * CHUNK)

    s = [once() for _ in range(5)]
    pos = [x for x in s if x > 0]
    return statistics.median(pos or s), not pos


def main():
    from visionselector_tpu.core.config import qwen25vl_3b, qwen25vl_tiny
    from visionselector_tpu.kernels.attention import decode_attention
    from visionselector_tpu.models.qwen25vl import lm as lm_mod
    from visionselector_tpu.models.qwen25vl.model import init_params
    from visionselector_tpu.models.qwen25vl.vit import rms_norm

    which = sys.argv[1] if len(sys.argv) > 1 else "3b"
    variants = (sys.argv[2].split(",") if len(sys.argv) > 2
                else ["scan", "unroll"])
    t_maxes = ([int(a) for a in sys.argv[3:]]
               or ([64, 128] if which == "tiny" else [2048, 8192]))

    if which == "tiny":
        jax.config.update("jax_platforms", "cpu")
    cfg = qwen25vl_tiny() if which == "tiny" else qwen25vl_3b()
    tc = cfg.text
    if which == "tiny":
        lm = jax.jit(lambda k: init_params(k, cfg))(
            jax.random.PRNGKey(0))["lm"]
    else:
        lm = lm_mod.init_lm_params_int8(
            jax.random.PRNGKey(0), tc, dtype=cfg.jax_dtype)
    jax.block_until_ready(lm)
    params = {"lm": lm}

    out = {"n_slots": B, "chunk": CHUNK,
           "platform": jax.devices()[0].platform, "full": {}}

    # ---- scan variant: production lm_decode_step chained ----------------
    @functools.partial(jax.jit, static_argnames=("k", "t_max"))
    def scan_chain(params, cache, tok0, k: int, t_max: int):
        del t_max

        def body(i, carry):
            cache, tok = carry
            x = lm_mod.embed_tokens(params["lm"], tok)[:, None]
            pos = cache.length[0]  # [B]
            pid = jnp.broadcast_to(pos[None, :, None], (3, B, 1))
            h, cache = lm_mod.lm_decode_step(
                params["lm"], cache, x, pid, tc)
            logits = lm_mod.lm_head(params["lm"], h[:, 0], tc)
            return cache, jnp.argmax(logits, -1).astype(jnp.int32)

        cache, tok = jax.lax.fori_loop(0, k, body, (cache, tok0))
        return jnp.sum(tok)

    # ---- unroll variant: per-layer buffers, Python layer loop -----------
    @functools.partial(jax.jit, static_argnames=("k", "t_max"))
    def unroll_chain(layers_list, rest, ks, vs, tok0, len0, k: int,
                     t_max: int):
        del t_max
        rows = jnp.arange(B)

        def body(i, carry):
            ks, vs, tok, length = carry
            x = lm_mod.embed_tokens(rest, tok)[:, None]
            pid = jnp.broadcast_to(length[None, :, None], (3, B, 1))
            cos, sin = lm_mod.mrope_cos_sin(pid, tc)
            new_k, new_v = [], []
            for p, k_all, v_all in zip(layers_list, ks, vs):
                h = rms_norm(x, p["input_ln_scale"], tc.rms_norm_eps)
                q, kk, vv = lm_mod._qkv(h, p, tc)
                q, kk = lm_mod._apply_mrope(q, kk, cos, sin)
                k_all = k_all.at[rows, length].set(
                    kk[:, 0], unique_indices=True)
                v_all = v_all.at[rows, length].set(
                    vv[:, 0], unique_indices=True)
                attn = decode_attention(q, k_all, v_all, length + 1)
                x = x + lm_mod._dense(attn.reshape(B, 1, -1), p, "o_kernel")
                h2 = rms_norm(x, p["post_ln_scale"], tc.rms_norm_eps)
                x = x + lm_mod._mlp(h2, p, tc)
                new_k.append(k_all)
                new_v.append(v_all)
            x = rms_norm(x, rest["final_ln_scale"], tc.rms_norm_eps)
            logits = lm_mod.lm_head(rest, x[:, 0], tc)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            return tuple(new_k), tuple(new_v), tok, length + 1

        ks, vs, tok, _ = jax.lax.fori_loop(
            0, k, body, (tuple(ks), tuple(vs), tok0, len0))
        return jnp.sum(tok)

    tok0 = jnp.full((B,), 11, jnp.int32)
    layers_list = None
    if "unroll" in variants:
        layers_list = [
            jax.tree.map(lambda a, i=i: a[i], lm["layers"])
            for i in range(tc.num_hidden_layers)
        ]
        rest = {k: v for k, v in lm.items() if k != "layers"}

    for t_max in t_maxes:
        t_fill = min(256, t_max // 2)
        row = {}
        shape = (tc.num_hidden_layers, B, t_max,
                 tc.num_key_value_heads, tc.head_dim)
        kv_gb = 2 * (jnp.dtype(cfg.jax_dtype).itemsize
                     * int(jnp.prod(jnp.asarray(shape)))) / 2**30
        row["pool_gb"] = round(float(kv_gb), 2)
        row["kv_read_ms"] = round(float(kv_gb) * 2**30 / 819e9 * 1e3, 2)

        if "scan" in variants:
            cache = lm_mod.init_kv_cache(tc, B, t_max, cfg.jax_dtype)
            cache = lm_mod.KVCache(
                k=cache.k, v=cache.v,
                length=jnp.full_like(cache.length, t_fill))
            jax.block_until_ready(cache)
            ms, sus = time_arm(
                lambda n: scan_chain(params, cache, tok0, n, t_max))
            row["scan_ms_per_step"] = round(ms * 1e3, 2)
            row["scan_suspect"] = sus
            del cache

        if "unroll" in variants:
            per = (B, t_max, tc.num_key_value_heads, tc.head_dim)
            ks = [jnp.zeros(per, cfg.jax_dtype)
                  for _ in range(tc.num_hidden_layers)]
            vs = [jnp.zeros(per, cfg.jax_dtype)
                  for _ in range(tc.num_hidden_layers)]
            len0 = jnp.full((B,), t_fill, jnp.int32)
            jax.block_until_ready((ks, vs))
            ms, sus = time_arm(
                lambda n: unroll_chain(layers_list, rest, ks, vs, tok0,
                                       len0, n, t_max))
            row["unroll_ms_per_step"] = round(ms * 1e3, 2)
            row["unroll_suspect"] = sus
            del ks, vs

        out["full"][str(t_max)] = row

    # slopes: ms/step per pool-GB, vs the 819 GB/s read-only floor
    ts = sorted(out["full"], key=int)
    if len(ts) >= 2:
        a, b = out["full"][ts[0]], out["full"][ts[-1]]
        dgb = b["pool_gb"] - a["pool_gb"]
        for v in ("scan", "unroll"):
            ka = f"{v}_ms_per_step"
            if ka in a and dgb > 0:
                slope = (b[ka] - a[ka]) / dgb
                out[f"{v}_ms_per_pool_gb"] = round(slope, 2)
                out[f"{v}_kv_traffic_x"] = round(
                    slope / (2**30 / 819e9 * 1e3), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
