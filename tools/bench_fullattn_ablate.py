"""Ablate the full-attention flash kernel's in-kernel costs on the chip.

The ViT decomposition (tools/bench_vit_layers.py) shows the 4 full-attention
layers' kernel at ~2.85 ms/call vs a 0.84 ms MXU roofline, and bf16-exp is
NEUTRAL — so which in-kernel component owns the ~2 ms? This bench compiles
stripped kernel variants (same grid/blocks/DMAs as production):

  prod    — the production attention() path (baseline)
  nomask  — no segment/mask work (exp + online softmax kept)
  noexp   — mask kept, exp replaced by identity (no transcendentals)
  bare    — matmuls + accumulate only (the DMA + MXU floor)

Usage: python tools/bench_fullattn_ablate.py [s_bucket]
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
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref, *, scale,
            block_k, num_heads, do_mask, do_exp):
    q_seg = qseg_ref[0]
    for hh in range(num_heads):
        q = q_ref[0, hh]
        bq = q.shape[0]

        def body(j, carry, hh=hh):
            acc, m_prev, l_prev = carry
            k = k_ref[0, hh, pl.ds(j * block_k, block_k)]
            v = v_ref[0, hh, pl.ds(j * block_k, block_k)]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if do_mask:
                k_seg = kseg_ref[0, pl.ds(j * block_k, block_k)]
                mask = (q_seg[:, None] == k_seg[None, :]) & (
                    k_seg[None, :] > 0)
                s = jnp.where(mask, s, NEG_INF)
            if do_exp:
                m_cur = jnp.max(s, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_prev, m_cur)
                p = jnp.exp(s - m_new)
                if do_mask:
                    p = jnp.where(mask, p, 0.0)
                alpha = jnp.exp(m_prev - m_new)
                l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            else:
                p = jnp.where(mask, s, 0.0) if do_mask else s
                alpha = jnp.float32(1.0)
                m_new = m_prev
                l_new = l_prev + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc * alpha + pv
            return acc, m_new, l_new

        d = q.shape[-1]
        acc = jnp.zeros((bq, d), jnp.float32)
        m0 = jnp.full((bq, 1), NEG_INF if do_exp else 0.0, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        nkv = k_ref.shape[2] // block_k
        acc, m, l = jax.lax.fori_loop(0, nkv, body, (acc, m0, l0))
        out = acc / jnp.where(l == 0.0, 1.0, l) if do_exp else acc
        o_ref[0, hh] = out.astype(o_ref.dtype)


def variant(q, k, v, qseg, kseg, do_mask, do_exp, block=512, hpp=2):
    b, s, h, d = q.shape
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    grid = (b, h // hpp, s // block)
    kernel = functools.partial(
        _kernel, scale=d**-0.5, block_k=block, num_heads=hpp,
        do_mask=do_mask, do_exp=do_exp,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hpp, block, d), lambda ib, ih, iq: (ib, ih, iq, 0)),
            pl.BlockSpec((1, hpp, s, d), lambda ib, ih, iq: (ib, ih, 0, 0)),
            pl.BlockSpec((1, hpp, s, d), lambda ib, ih, iq: (ib, ih, 0, 0)),
            pl.BlockSpec((1, block), lambda ib, ih, iq: (ib, iq)),
            pl.BlockSpec((1, s), lambda ib, ih, iq: (ib, 0)),
        ],
        out_specs=pl.BlockSpec((1, hpp, block, d),
                               lambda ib, ih, iq: (ib, ih, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
    )(qt, kt, vt, qseg.astype(jnp.int32), kseg.astype(jnp.int32))
    return out.transpose(0, 2, 1, 3)


def main():
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 5632
    h, d = 16, 80
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, s, h, d) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, s, h, d) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, s, h, d) * 0.1, jnp.bfloat16)
    seg = np.ones(s, np.int32)
    seg[-128:] = 0
    segj = jnp.asarray(seg)[None]

    from visionselector_tpu.kernels.attention import attention

    def time_fn(make_out, iters=32):
        @functools.partial(jax.jit, static_argnames=("n",))
        def chained(q, n):
            def body(i, carry):
                qq, acc = carry
                out = make_out(qq)
                sc = out[0, 0, 0, 0].astype(jnp.float32)
                qq = qq.at[0, 0, 0, 0].add(sc.astype(qq.dtype) * 1e-6)
                return qq, acc + sc
            _, acc = jax.lax.fori_loop(0, n, body,
                                       (q, jnp.zeros((), jnp.float32)))
            return acc

        f = lambda n: float(chained(q, n))
        f(1); f(iters)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter(); f(1); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); f(iters); tk = time.perf_counter() - t0
            samples.append((tk - t1) / (iters - 1))
        return sorted(samples)[1]

    result = {"s": s, "platform": jax.devices()[0].platform}
    cases = {
        "prod": lambda qq: attention(qq, k, v, segj, segj, causal=False,
                                     block_q=512, block_k=512),
        "full_ablate": lambda qq: variant(qq, k, v, segj, segj, True, True),
        "nomask": lambda qq: variant(qq, k, v, segj, segj, False, True),
        "noexp": lambda qq: variant(qq, k, v, segj, segj, True, False),
        "bare": lambda qq: variant(qq, k, v, segj, segj, False, False),
    }
    for name, fn in cases.items():
        t = time_fn(fn)
        result[f"ms_{name}"] = round(t * 1e3, 3)
        print(f"[{name}] {t*1e3:.3f} ms", flush=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
