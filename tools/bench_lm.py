"""LM prefill micro-benchmark (differential timing; see bench.py).

Usage: VST_LM_BLOCK=256 python tools/bench_lm.py [t_len]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VST_ATTN_IMPL", "auto")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from visionselector_tpu.core.config import qwen25vl_3b
    from visionselector_tpu.models.qwen25vl import lm as lm_mod

    t = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
    cfg = qwen25vl_3b().text
    params = jax.jit(
        lambda k: lm_mod.init_lm_params(k, cfg, jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    rng = np.random.RandomState(0)
    embeds = jnp.asarray(rng.randn(1, t, cfg.hidden_size), jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(t), (3, 1, t))
    seg = jnp.ones((1, t), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(params, x, n):
        def body(i, carry):
            e, acc = carry
            h, _ = lm_mod.lm_prefill(params, e, pos, seg, cfg)
            s = h[0, 0, 0].astype(jnp.float32)
            e = e.at[0, 0, 0].add(s.astype(e.dtype) * 1e-20)
            return e, acc + s
        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.zeros((), jnp.float32)))
        return acc

    def fetch(n):
        return float(chained(params, embeds, n))

    fetch(1); fetch(8)
    t0 = time.perf_counter(); fetch(1); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); fetch(8); tk = time.perf_counter() - t0
    ms = (tk - t1) / 7 * 1e3
    print(json.dumps({"t": t, "lm_block": os.environ.get("VST_LM_BLOCK", "256"),
                      "lm_prefill_ms": round(ms, 2),
                      "platform": jax.devices()[0].platform}))


if __name__ == "__main__":
    main()
