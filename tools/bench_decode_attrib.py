"""Attribute the batched decode step's time: weights vs KV vs glue.

The continuous chunk program measures ~2.5x its W+KV bandwidth roofline at
B=8 (IMPLEMENTATION_NOTES: 16.6 ms/step int8 @8192x8 vs ~7 ms modeled).
Hypotheses this tool separates:

1. **Pool rewrite**: ``lm_decode_step`` threads the KV pool through
   ``lax.scan`` as xs/ys — if XLA cannot alias the ys output to the xs
   input, every step WRITES the whole pool back (2.25 GB at 8192x8 bf16)
   on top of reading it. Signature: full-arm ms/step grows ~2x the
   KV-read slope with t_max.
2. **Matvec efficiency**: the [B, D] x [D, F] weight-streaming matmuls
   run below HBM peak at B=8. Signature: the matmul-only arm already
   sits far above the weight roofline.

Arms (B slots, chunk 8, greedy):
- ``mm``: scan over the stacked layer params doing ONLY the 7 decode
  matmuls (qkv/o/gate/up/down) + rms norms — no cache, no attention.
- ``full@T``: the production ``_decode_chunk_slots`` at pool length T,
  for each T in the sweep (fill 256 rows).

Usage: bench_decode_attrib.py [n_slots] [which] [quant] [t_max ...]
Defaults: 8 3b int8 1024 2048 4096 8192. On CPU use ``tiny``.
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


def main():
    from visionselector_tpu.core.config import qwen25vl_3b, qwen25vl_tiny
    from visionselector_tpu.models.qwen25vl import lm as lm_mod
    from visionselector_tpu.models.qwen25vl.continuous import (
        _decode_chunk_slots,
    )
    from visionselector_tpu.models.qwen25vl.model import init_params

    n_slots = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    which = sys.argv[2] if len(sys.argv) > 2 else "3b"
    quant = sys.argv[3] if len(sys.argv) > 3 else "int8"
    t_maxes = ([int(a) for a in sys.argv[4:]]
               or ([64, 128] if which == "tiny"
                   else [1024, 2048, 4096, 8192]))
    chunk = 8

    if which == "tiny":
        jax.config.update("jax_platforms", "cpu")
    cfg = qwen25vl_tiny() if which == "tiny" else qwen25vl_3b()
    tc = cfg.text
    if quant in ("int8", "int4"):
        lm = lm_mod.init_lm_params_int8(
            jax.random.PRNGKey(0), tc, dtype=cfg.jax_dtype,
            bits=4 if quant == "int4" else 8)
    else:
        lm = jax.jit(lambda k: init_params(k, cfg))(
            jax.random.PRNGKey(0))["lm"]
    jax.block_until_ready(lm)
    params = {"lm": lm}

    # --- weight bytes actually streamed per step (for the roofline) ---
    def _tree_bytes(t):
        return sum(x.nbytes for x in jax.tree_util.tree_leaves(t))

    w_bytes = _tree_bytes(lm["layers"]) + _tree_bytes(
        {k: v for k, v in lm.items() if k != "layers"})

    # --- arm: matmuls-only layer scan (weights + norms, no cache) -------
    @functools.partial(jax.jit, static_argnames=("k",))
    def mm_chain(params, x0, k: int):
        lp = params["lm"]["layers"]

        def step(x, _):
            def layer(h, p):
                hn = lm_mod.rms_norm(h, p["input_ln_scale"],
                                     tc.rms_norm_eps)
                q, kk, v = lm_mod._qkv(hn, p, tc)
                attn = q.reshape(h.shape[0], 1, -1)  # stand-in, no kv
                h = h + lm_mod._dense(attn, p, "o_kernel")
                hn = lm_mod.rms_norm(h, p["post_ln_scale"],
                                     tc.rms_norm_eps)
                h = h + lm_mod._mlp(hn, p, tc)
                return h, kk.sum() + v.sum()

            x, _ = jax.lax.scan(layer, x, lp)
            x = lm_mod.rms_norm(x, params["lm"]["final_ln_scale"],
                                tc.rms_norm_eps)
            logits = lm_mod.lm_head(params["lm"], x[:, 0], tc)
            tok = jnp.argmax(logits, axis=-1)
            x = lm_mod.embed_tokens(params["lm"], tok)[:, None]
            return x, tok

        x, toks = jax.lax.scan(step, x0, None, length=k)
        return jnp.sum(toks[-1])

    def time_arm(fn, *args):
        lo, hi = 2, 4
        for n in (lo, hi):
            jax.block_until_ready(fn(*args, n * chunk))

        def once():
            t0 = time.perf_counter()
            int(fn(*args, lo * chunk))
            t1 = time.perf_counter()
            int(fn(*args, hi * chunk))
            t2 = time.perf_counter()
            return ((t2 - t1) - (t1 - t0)) / ((hi - lo) * chunk)

        s = [once() for _ in range(5)]
        pos = [x for x in s if x > 0]
        return statistics.median(pos or s), not pos

    out = {"n_slots": n_slots, "chunk": chunk, "quant": quant,
           "platform": jax.devices()[0].platform,
           "weight_gb": round(w_bytes / 2**30, 2),
           # v5e HBM ~819 GB/s: pure weight-stream floor per step
           "w_roofline_ms": round(w_bytes / 819e9 * 1e3, 2)}

    x0 = jnp.zeros((n_slots, 1, tc.hidden_size), cfg.jax_dtype)
    mm_wrapped = lambda p, k: mm_chain(p, x0, k)  # noqa: E731
    ms, sus = time_arm(mm_wrapped, params)
    out["mm_only_ms_per_step"] = round(ms * 1e3, 2)
    out["mm_suspect"] = sus

    @functools.partial(jax.jit, static_argnames=("k", "t_max"))
    def full_chain(params, pool, cur, pos, live, temps, tps, tks, keys,
                   pres, rps, k: int, t_max: int):
        del t_max  # distinct cache keys per pool shape
        toks, _, _, _ = _decode_chunk_slots.__wrapped__(
            params, pool, cur, pos, live, temps, tps, tks, keys, pres,
            rps, cfg, k)
        return jnp.sum(toks[-1])

    cur = jnp.arange(100, 100 + n_slots, dtype=jnp.int32)
    live = jnp.ones((n_slots,), bool)
    temps = jnp.zeros((n_slots,), jnp.float32)
    tps = jnp.ones((n_slots,), jnp.float32)
    tks = jnp.zeros((n_slots,), jnp.int32)
    keys = jnp.zeros((n_slots, 2), jnp.uint32)
    pres = jnp.zeros((n_slots, tc.vocab_size), jnp.bool_)
    rps = jnp.ones((n_slots,), jnp.float32)

    full = {}
    for t_max in t_maxes:
        t_fill = min(256, t_max // 2)
        shape = (tc.num_hidden_layers, n_slots, t_max,
                 tc.num_key_value_heads, tc.head_dim)
        k_f = (jax.random.normal(jax.random.PRNGKey(1), shape,
                                 jnp.float32) * 0.5).astype(cfg.jax_dtype)
        v_f = (jax.random.normal(jax.random.PRNGKey(2), shape,
                                 jnp.float32) * 0.5).astype(cfg.jax_dtype)
        pool = lm_mod.KVCache(
            k=k_f, v=v_f,
            length=jnp.full((tc.num_hidden_layers, n_slots), t_fill,
                            jnp.int32))
        jax.block_until_ready(pool)
        pos = jnp.full((n_slots,), t_fill, jnp.int32)

        def fn(p, n):
            return full_chain(p, pool, cur, pos, live, temps, tps, tks,
                              keys, pres, rps, n, t_max)

        ms, sus = time_arm(fn, params)
        kv_gb = 2 * k_f.nbytes / 2**30
        full[str(t_max)] = {
            "ms_per_step": round(ms * 1e3, 2),
            "pool_gb": round(kv_gb, 2),
            # roofline if the pool is READ once per step
            "kv_read_ms": round(kv_gb * 2**30 / 819e9 * 1e3, 2),
            "suspect": sus,
        }
        del pool, k_f, v_f

    out["full"] = full
    # slope of ms/step vs pool GB: ~1x kv_read slope = read-only;
    # ~2x = the scan is writing the pool back too
    ts = sorted(full, key=int)
    if len(ts) >= 2:
        a, b = full[ts[0]], full[ts[-1]]
        dms = a["ms_per_step"], b["ms_per_step"]
        dgb = a["pool_gb"], b["pool_gb"]
        if dgb[1] > dgb[0]:
            slope = (dms[1] - dms[0]) / (dgb[1] - dgb[0])
            out["ms_per_pool_gb"] = round(slope, 2)
            out["kv_traffic_x"] = round(slope / (2**30 / 819e9 * 1e3), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
