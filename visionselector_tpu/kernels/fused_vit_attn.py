"""Fused ViT attention: rotary + multi-head flash attention in one kernel.

Motivation (measured on v5e, Qwen2.5-VL ViT S=5632): the per-head-grid flash
kernel costs ~0.9 ms/window-layer *in context* vs ~0.3 ms standalone — the
difference is q/k/v preparation traffic (split copies, rotary pass, layout
moves). This kernel consumes the qkv projection output [S, 3*H*d] directly:

- grid = (num_q_blocks,); each program handles ALL heads of its query block,
- the q slab arrives via BlockSpec (block [bq, 3*H*d] — legal since the last
  dim equals the full array dim); k/v slabs are DMA'd from HBM per kv block
  (kv-range limited by the host-computed block bounds),
- **double-buffered kv DMA**: block j+1's copy is issued before block j's
  compute, so HBM reads overlap the per-head matmuls (the round-1 version
  serialized start();wait() per block and measured 90.8 ms vs 78 ms — this
  rewrite is the "round 2" of IMPLEMENTATION_NOTES' roadmap),
- rotary is applied in-kernel: q once per program (hoisted out of the kv
  loop), k once per (kv block, head),
- online-softmax state lives in VMEM scratch [H, bq, d],
- output is written as one [bq, H*d] slab — ready for the proj matmul.

No HBM round trips for split/rotary/transposes at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _fused_kernel(
    bounds_ref,  # SMEM [nq, 2]
    q_slab_ref,  # VMEM [bq, 3*H*d] (this q block's qkv rows)
    qkv_hbm_ref,  # ANY/HBM [S, 3*H*d] (for kv DMA)
    seg_ref,  # VMEM [1, S]
    cos_ref,  # VMEM [S, d]
    sin_ref,  # VMEM [S, d]
    o_ref,  # VMEM [bq, H*d]
    kv_scratch,  # VMEM [2, bk, 2*H*d] (double buffer)
    q_rot_ref,  # VMEM [H, bq, d] (rotated q, hoisted)
    acc_ref,  # VMEM [H, bq, d] f32
    m_ref,  # VMEM [H, bq, 1] f32
    l_ref,  # VMEM [H, bq, 1] f32
    dma_sems,  # DMA semaphores [2]
    *,
    num_heads,
    head_dim,
    scale,
    block_q,
    block_k,
):
    h_count, d = num_heads, head_dim
    iq = pl.program_id(0)
    lo = bounds_ref[iq, 0]
    hi = bounds_ref[iq, 1]

    q_rows = pl.ds(iq * block_q, block_q)
    cos_q = cos_ref[q_rows].astype(q_slab_ref.dtype)  # [bq, d]
    sin_q = sin_ref[q_rows].astype(q_slab_ref.dtype)
    q_seg = seg_ref[0, q_rows]  # [bq]

    half = d // 2

    def rotate(x, cos, sin):
        x1 = x[:, :half]
        x2 = x[:, half:]
        rot = jnp.concatenate([-x2, x1], axis=-1)
        return x * cos + rot * sin

    # rotated q, once per program (round-1 re-rotated q per kv block)
    for h in range(h_count):
        q_rot_ref[h] = rotate(q_slab_ref[:, h * d : (h + 1) * d], cos_q, sin_q)

    acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
    m_ref[...] = jnp.full(m_ref.shape, NEG_INF, m_ref.dtype)
    l_ref[...] = jnp.zeros(l_ref.shape, l_ref.dtype)

    kv_cols = pl.ds(h_count * d, 2 * h_count * d)

    def _copy(j, slot):
        return pltpu.make_async_copy(
            qkv_hbm_ref.at[pl.ds(j * block_k, block_k), kv_cols],
            kv_scratch.at[slot],
            dma_sems.at[slot],
        )

    @pl.when(lo < hi)
    def _prologue():
        _copy(lo, lo % 2).start()

    def kv_body(j, _):
        slot = jax.lax.rem(j, 2)
        _copy(j, slot).wait()

        @pl.when(j + 1 < hi)
        def _prefetch():
            _copy(j + 1, jax.lax.rem(j + 1, 2)).start()

        k_rows = pl.ds(j * block_k, block_k)
        cos_k = cos_ref[k_rows].astype(q_slab_ref.dtype)
        sin_k = sin_ref[k_rows].astype(q_slab_ref.dtype)
        k_seg = seg_ref[0, k_rows]  # [bk]
        base_mask = (q_seg[:, None] == k_seg[None, :]) & (k_seg[None, :] > 0)

        for h in range(h_count):
            q_h = q_rot_ref[h]  # [bq, d]
            k_h = rotate(kv_scratch[slot, :, h * d : (h + 1) * d], cos_k, sin_k)
            v_h = kv_scratch[slot, :, (h_count + h) * d : (h_count + h + 1) * d]

            s = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = jnp.where(base_mask, s, NEG_INF)

            m_prev = m_ref[h]
            l_prev = l_ref[h]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.where(base_mask, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[h] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_h.dtype), v_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[h] = acc_ref[h] * alpha + pv
            m_ref[h] = m_new
        return 0

    jax.lax.fori_loop(lo, hi, kv_body, 0)

    for h in range(h_count):
        l = l_ref[h]
        out_h = acc_ref[h] / jnp.where(l == 0.0, 1.0, l)
        o_ref[:, h * d : (h + 1) * d] = out_h.astype(o_ref.dtype)


def fused_vit_attention(
    qkv: jax.Array,  # [S, 3*H*d] (projection output, pre-rotary)
    seg_ids: jax.Array,  # [S] int32 (passed to the kernel as [1, S])
    cos: jax.Array,  # [S, d] fp32
    sin: jax.Array,  # [S, d] fp32
    kv_bounds: jax.Array,  # [num_q_blocks, 2] (at block granularity below)
    num_heads: int,
    head_dim: int,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Returns attention output [S, H*d] (proj-matmul ready)."""
    s, width = qkv.shape
    assert width == 3 * num_heads * head_dim, (width, num_heads, head_dim)
    assert s % block_q == 0 and s % block_k == 0, (s, block_q, block_k)
    if scale is None:
        scale = head_dim**-0.5
    nq = s // block_q

    out = pl.pallas_call(
        functools.partial(
            _fused_kernel,
            num_heads=num_heads,
            head_dim=head_dim,
            scale=scale,
            block_q=block_q,
            block_k=block_k,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nq,),
            in_specs=[
                pl.BlockSpec(
                    (block_q, width), lambda iq, bounds: (iq, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (block_q, num_heads * head_dim), lambda iq, bounds: (iq, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, block_k, 2 * num_heads * head_dim), qkv.dtype),
                pltpu.VMEM((num_heads, block_q, head_dim), qkv.dtype),
                pltpu.VMEM((num_heads, block_q, head_dim), jnp.float32),
                pltpu.VMEM((num_heads, block_q, 1), jnp.float32),
                pltpu.VMEM((num_heads, block_q, 1), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((s, num_heads * head_dim), qkv.dtype),
        interpret=interpret,
    )(
        kv_bounds.astype(jnp.int32),
        qkv,
        qkv,
        seg_ids.astype(jnp.int32)[None],
        cos.astype(qkv.dtype),
        sin.astype(qkv.dtype),
    )
    return out
