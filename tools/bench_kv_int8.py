"""int8 slot-pool decode vs bf16: KV read-bandwidth and memory on chip.

Builds a full continuous-batching slot pool (3B config, 8 slots, long
contexts) twice — bf16 and int8-quantized — and times the SAME chunked
decode program against each with interleaved chained-differential samples
(the repo's standard timing idiom: the tunnel's fetch latency and dispatch
overhead cancel between two chained spans, and alternating arms immunizes
the ratio against time-shared-chip drift).

Decode at long context reads weights + the valid KV every step, so the
expected ceiling is (W + KV16) / (W + KV8); at 3B/7680 tokens that is
~1.16x. The pool memory halving is exact and printed alongside.

Usage: python tools/bench_kv_int8.py [t_fill] [n_slots] [config] [quant]
(config: "3b" default, "tiny" for a CPU smoke run; quant: "int8" default
or "int4" — packed S4 pool, quarter the bf16 bytes.)
"""

import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from visionselector_tpu.core.config import qwen25vl_3b, qwen25vl_tiny
    from visionselector_tpu.models.qwen25vl import lm as lm_mod
    from visionselector_tpu.models.qwen25vl.continuous import (
        _decode_chunk_slots,
    )
    from visionselector_tpu.models.qwen25vl.model import init_params

    t_fill = int(sys.argv[1]) if len(sys.argv) > 1 else 7680
    n_slots = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    which = sys.argv[3] if len(sys.argv) > 3 else "3b"
    quant = sys.argv[4] if len(sys.argv) > 4 else "int8"
    qdt_name = quant
    chunk = 8
    t_max = t_fill + 256  # headroom for the timed chunks

    if which == "tiny":
        # CPU smoke run: env vars alone don't override the axon preset
        jax.config.update("jax_platforms", "cpu")
    cfg = qwen25vl_tiny() if which == "tiny" else qwen25vl_3b()
    params = jax.jit(lambda k: init_params(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    tc = cfg.text
    shape = (tc.num_hidden_layers, n_slots, t_max, tc.num_key_value_heads,
             tc.head_dim)
    rng = jax.random.PRNGKey(1)
    kv_dtype = cfg.jax_dtype  # the pool matches the model compute dtype
    k_f = (jax.random.normal(rng, shape, jnp.float32) * 0.5).astype(kv_dtype)
    v_f = (jax.random.normal(jax.random.fold_in(rng, 1), shape,
                             jnp.float32) * 0.5).astype(kv_dtype)
    length = jnp.full((tc.num_hidden_layers, n_slots), t_fill, jnp.int32)
    pool16 = lm_mod.KVCache(k=k_f, v=v_f, length=length)
    qdt = jnp.int4 if quant == "int4" else jnp.int8
    k8, ks = lm_mod.quantize_kv(k_f, qdt)
    v8, vs = lm_mod.quantize_kv(v_f, qdt)
    pool8 = lm_mod.QuantKVCache(k=k8, v=v8, k_scale=ks, v_scale=vs,
                                length=length)
    jax.block_until_ready((pool16, pool8))

    cur = jnp.arange(100, 100 + n_slots, dtype=jnp.int32)
    pos = jnp.full((n_slots,), t_fill, jnp.int32)
    live = jnp.ones((n_slots,), bool)
    temps = jnp.zeros((n_slots,), jnp.float32)
    tps = jnp.ones((n_slots,), jnp.float32)
    tks = jnp.zeros((n_slots,), jnp.int32)
    keys = jnp.zeros((n_slots, 2), jnp.uint32)
    pres = jnp.zeros((n_slots, tc.vocab_size), jnp.bool_)
    rps = jnp.ones((n_slots,), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(params, pool, n):
        def body(i, carry):
            cur_c, pos_c, pool_c, acc = carry
            toks, pool_c, _, _ = _decode_chunk_slots(
                params, pool_c, cur_c, pos_c, live, temps, tps, tks, keys,
                pres, rps, cfg, chunk, False)
            return (toks[-1], pos_c + chunk, pool_c,
                    acc + jnp.sum(toks[-1]))

        _, _, _, acc = jax.lax.fori_loop(
            0, n, body, (cur, pos, pool, jnp.zeros((), jnp.int32)))
        return acc

    lo, hi = 2, 4

    def once(pool):
        t0 = time.perf_counter()
        int(chained(params, pool, lo))
        t1 = time.perf_counter()
        int(chained(params, pool, hi))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (hi - lo)  # seconds per chunk

    for pool in (pool16, pool8):  # compile both spans of both arms
        int(chained(params, pool, lo))
        int(chained(params, pool, hi))

    s16, s8 = [], []
    for _ in range(5):  # interleaved arms
        s16.append(once(pool16))
        s8.append(once(pool8))

    def med_pos(samples):
        pos = [s for s in samples if s > 0]
        if not pos:  # noise-dominated (tiny smoke): report raw median
            return statistics.median(samples), True
        return statistics.median(pos), False

    t16, suspect16 = med_pos(s16)
    t8, suspect8 = med_pos(s8)
    if t16 <= 0 or t8 <= 0:
        print(json.dumps({"suspect": True, "error": "non-positive "
                          "differential medians (noise-dominated run)",
                          "samples_bf16_ms": [round(s * 1e3, 3) for s in s16],
                          "samples_int8_ms": [round(s * 1e3, 3) for s in s8],
                          "platform": jax.devices()[0].platform}))
        return

    def nbytes(p):
        # device bytes from size*itemsize; S4 packs 2 elems/byte (host
        # ml_dtypes int4 itemsize is 1, which would double-count)
        total = 0
        for x in p[:-1]:
            if x.dtype == jnp.int4:
                total += x.size // 2
            else:
                total += x.size * x.dtype.itemsize
        return total

    toks = chunk * n_slots
    print(json.dumps({
        "suspect": suspect16 or suspect8,
        "t_fill": t_fill, "n_slots": n_slots, "chunk": chunk,
        "chunk_ms_bf16": round(t16 * 1e3, 2),
        "quant": qdt_name,
        "chunk_ms_quant": round(t8 * 1e3, 2),
        "decode_speedup_quant": round(t16 / t8, 3),
        "tok_per_s_bf16": round(toks / t16, 1),
        "tok_per_s_quant": round(toks / t8, 1),
        "pool_gb_bf16": round(nbytes(pool16) / 2**30, 2),
        "pool_gb_quant": round(nbytes(pool8) / 2**30, 2),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
