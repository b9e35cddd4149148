"""Length-aware (blocked) decode attention vs dense XLA on a slot pool.

The continuous-batching pool is provisioned for its LONGEST admissible
request ([L, S, t_max]); the dense XLA decode attention reads every slot at
t_max per step regardless of how little is live. The blocked Pallas kernel
(``kernels/attention._decode_blocked_kernel``) fetches only each slot's
live prefix (length-clamped tile index map — the pipeline skips the DMA
when the mapped tile is unchanged), so its KV traffic is
sum_s ceil((len_s + chunk)/block) tiles instead of S * t_max/block.

Two workloads x two arms (interleaved chained differentials, the repo's
standard tunnel-immune timing idiom):
  - "short":   slots filled to t_fill_short (default t_max/16) — the win
               case: most of the pool is dead tail.
  - "full":    slots filled to ~t_max — regression check; the blocked
               kernel should be ~neutral vs dense here.

Usage: python tools/bench_blocked_decode.py [t_max] [n_slots] [config]
(config: "3b" default, "tiny" for a CPU smoke run.)
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


def main():
    from visionselector_tpu.core.config import qwen25vl_3b, qwen25vl_tiny
    from visionselector_tpu.models.qwen25vl import lm as lm_mod
    from visionselector_tpu.models.qwen25vl.continuous import (
        _decode_chunk_slots,
    )
    from visionselector_tpu.models.qwen25vl.model import init_params

    t_max = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    n_slots = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    which = sys.argv[3] if len(sys.argv) > 3 else "3b"
    chunk = 8

    if which == "tiny":
        jax.config.update("jax_platforms", "cpu")
        # CPU smoke: interpret-mode Pallas, tile small enough to divide
        # the smoke pool (the env knob is read at trace time)
        os.environ.setdefault("VST_DECODE_BLOCK", "64")
    cfg = qwen25vl_tiny() if which == "tiny" else qwen25vl_3b()
    params = jax.jit(lambda k: init_params(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    tc = cfg.text
    shape = (tc.num_hidden_layers, n_slots, t_max,
             tc.num_key_value_heads, tc.head_dim)
    rng = jax.random.PRNGKey(1)
    kv_dtype = cfg.jax_dtype
    k_f = (jax.random.normal(rng, shape, jnp.float32) * 0.5).astype(kv_dtype)
    v_f = (jax.random.normal(jax.random.fold_in(rng, 1), shape,
                             jnp.float32) * 0.5).astype(kv_dtype)
    jax.block_until_ready((k_f, v_f))

    temps = jnp.zeros((n_slots,), jnp.float32)
    tps = jnp.ones((n_slots,), jnp.float32)
    keys = jnp.zeros((n_slots, 2), jnp.uint32)
    live = jnp.ones((n_slots,), bool)
    cur = jnp.arange(100, 100 + n_slots, dtype=jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n", "attn_impl"))
    def chained(params, pool, pos, n, attn_impl):
        def body(i, carry):
            cur_c, pos_c, pool_c, acc = carry
            toks, pool_c, _ = _decode_chunk_slots(
                params, pool_c, cur_c, pos_c, live, temps, tps, keys,
                cfg, chunk, False, attn_impl=attn_impl)
            return (toks[-1], pos_c + chunk, pool_c,
                    acc + jnp.sum(toks[-1]))

        _, _, _, acc = jax.lax.fori_loop(
            0, n, body, (cur, pos, pool, jnp.zeros((), jnp.int32)))
        return acc

    lo, hi = 2, 4
    headroom = 64 * ((hi * chunk + chunk + 63) // 64)
    impls = ("xla", "blocked_interpret" if which == "tiny" else "blocked")

    def run_workload(t_fill):
        length = jnp.full((tc.num_hidden_layers, n_slots), t_fill, jnp.int32)
        pool = lm_mod.KVCache(k=k_f, v=v_f, length=length)
        pos = jnp.full((n_slots,), t_fill, jnp.int32)

        def once(impl):
            t0 = time.perf_counter()
            int(chained(params, pool, pos, lo, impl))
            t1 = time.perf_counter()
            int(chained(params, pool, pos, hi, impl))
            t2 = time.perf_counter()
            return ((t2 - t1) - (t1 - t0)) / (hi - lo)

        for impl in impls:  # compile both spans of both arms
            int(chained(params, pool, pos, lo, impl))
            int(chained(params, pool, pos, hi, impl))
        samples = {impl: [] for impl in impls}
        for _ in range(5):  # interleave arms
            for impl in impls:
                samples[impl].append(once(impl))
        med = {}
        suspect = False
        for impl in impls:
            pos_s = [s for s in samples[impl] if s > 0]
            if not pos_s:
                med[impl] = statistics.median(samples[impl])
                suspect = True
            else:
                med[impl] = statistics.median(pos_s)
        return med, suspect

    out = {"t_max": t_max, "n_slots": n_slots, "chunk": chunk,
           "platform": jax.devices()[0].platform,
           "pool_gb": round(2 * k_f.nbytes / 2**30, 2)}
    short_fill = max(chunk, t_max // 16)
    for name, t_fill in (("short", short_fill),
                         ("full", t_max - headroom)):
        med, suspect = run_workload(t_fill)
        toks = chunk * n_slots
        blk = impls[1]
        ok = med["xla"] > 0 and med[blk] > 0
        out[name] = {
            "t_fill": t_fill,
            "chunk_ms_xla": round(med["xla"] * 1e3, 2),
            "chunk_ms_blocked": round(med[blk] * 1e3, 2),
            "speedup_blocked": (round(med["xla"] / med[blk], 3)
                                if ok else None),
            "tok_per_s_xla": round(toks / med["xla"], 1) if ok else None,
            "tok_per_s_blocked": (round(toks / med[blk], 1)
                                  if ok else None),
            "suspect": suspect or not ok,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
