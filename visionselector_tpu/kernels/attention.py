"""Flash attention for TPU with segment-id (varlen) support.

Replaces the reference's CUDA ``flash_attn_varlen_func`` calls
(``qwen-evaluation/qwen25vl/modeling_qwen2_5_vl.py:208``,
``qwen-vl-finetune/qwenvl/train/trainer.py:101-113``) with a TPU-native design:

- variable-length packing is expressed with **segment ids** instead of
  ``cu_seqlens`` (block-diagonal attention = ``seg_q == seg_k``). Padding rows
  carry segment id 0 and attend to nothing.
- ViT window attention (``cu_window_seqlens``) and per-image full attention are
  the *same kernel* with different segment arrays.
- causal LLM prefill over the compressed sequence is the same kernel with
  ``causal=True``.

Two interchangeable implementations:
- ``mha_reference``: pure-jnp masked attention (XLA fuses well; used on CPU for
  tests and as the numerics oracle).
- Pallas online-softmax kernel (``_flash_pallas``) for TPU.

Dispatch via ``attention(..., impl=...)`` or the ``VST_ATTN_IMPL`` env var.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _mask(q_seg, kv_seg, causal: bool, q_offset=0):
    """[Sq, Sk] boolean validity mask from segment ids (+ causal)."""
    m = (q_seg[:, None] == kv_seg[None, :]) & (kv_seg[None, :] > 0)
    if causal:
        sq, sk = q_seg.shape[0], kv_seg.shape[0]
        qi = jnp.arange(sq) + q_offset
        ki = jnp.arange(sk)
        m = m & (qi[:, None] >= ki[None, :])
    return m


def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_seg: jax.Array,
    kv_seg: jax.Array,
    causal: bool = False,
    scale: float | None = None,
) -> jax.Array:
    """Masked multi-head attention, fp32 softmax.

    Args:
        q: [B, Sq, H, D]; k, v: [B, Sk, H, D] (H already GQA-expanded or equal).
        q_seg: [B, Sq] int32; kv_seg: [B, Sk] int32. 0 = padding.
    Returns: [B, Sq, H, D] in q.dtype.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    mask = jax.vmap(lambda a, b: _mask(a, b, causal))(q_seg, kv_seg)
    logits = jnp.where(mask[:, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    # Rows with no valid keys (padding queries) become uniform after softmax of
    # all -inf; zero them out.
    any_valid = mask.any(axis=-1)[:, None, :, None]
    probs = jnp.where(any_valid, probs, 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, qseg_ref, kseg_ref, bounds_ref, o_ref,
                  *, scale, causal, block_k, kv_len, packed=False,
                  num_heads=1):
    """Online-softmax flash attention body. Grid: (B, head_groups,
    num_q_blocks); ``num_heads`` heads per program (head-grouping amortizes
    the per-program dispatch overhead — an LM prefill at t=1536 is otherwise
    ~1700 programs across the 36 layers).

    ``bounds_ref`` (SMEM, [num_q_blocks, 2]) gives each query block its
    [lo, hi) kv-block range — computed on the host from the segment layout.
    Window attention has ~64-token contiguous segments, so a query block only
    overlaps 1-2 kv blocks: skipping the rest turns the window layers from
    O(S^2) into O(S * window). This block-skip + online softmax is the
    TPU-native replacement for ``flash_attn_varlen_func``.
    """
    # NOTE (r3): a kv-outer/heads-inner inversion (one mask per (iq, j)
    # shared by the head group) was measured perf-NEUTRAL — Mosaic already
    # CSEs the loop-invariant mask — and its per-head fori_loop carries
    # blew scoped VMEM at the 16-heads-per-program LM shapes. Heads stay
    # OUTER (one head's accumulators live at a time).
    iq = pl.program_id(2)
    q_seg = qseg_ref[0]  # [bq]

    lo_block = bounds_ref[iq, 0]
    hi_block = bounds_ref[iq, 1]

    for hh in range(num_heads):
        q = q_ref[0] if packed else q_ref[0, hh]  # [bq, d]
        bq = q.shape[0]
        num_kv_blocks = hi_block
        if causal:
            # Only blocks whose start can be <= last query row.
            last_q = (iq + 1) * bq - 1
            num_kv_blocks = jnp.minimum(num_kv_blocks, (last_q // block_k) + 1)

        def body(j, carry, hh=hh):
            acc, m_prev, l_prev = carry
            if packed:
                k = k_ref[0, pl.ds(j * block_k, block_k)]  # [bk, d]
                v = v_ref[0, pl.ds(j * block_k, block_k)]
            else:
                k = k_ref[0, hh, pl.ds(j * block_k, block_k)]  # [bk, d]
                v = v_ref[0, hh, pl.ds(j * block_k, block_k)]
            k_seg = kseg_ref[0, pl.ds(j * block_k, block_k)]

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [bq, bk]

            mask = (q_seg[:, None] == k_seg[None, :]) & (k_seg[None, :] > 0)
            if causal:
                qi = iq * bq + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, block_k), 0)
                ki = j * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, block_k), 1)
                mask = mask & (qi >= ki)
            s = jnp.where(mask, s, NEG_INF)

            m_cur = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
            m_new = jnp.maximum(m_prev, m_cur)
            # Explicit mask on p: for fully-masked rows m_new == NEG_INF and
            # exp(s - m_new) would be exp(0) == 1 instead of 0.
            if EXP_BF16:
                # bf16 exponent (see EXP_BF16): p stays bf16 into the pv
                # matmul; the l sum accumulates in fp32.
                p = jnp.where(
                    mask,
                    jnp.exp((s - m_new).astype(jnp.bfloat16)),
                    jnp.bfloat16(0.0),
                )
                l_sum = jnp.sum(p.astype(jnp.float32), axis=-1,
                                keepdims=True)
            else:
                p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
                l_sum = jnp.sum(p, axis=-1, keepdims=True)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + l_sum
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc * alpha + pv
            return acc, m_new, l_new

        d = q.shape[-1]
        acc = jnp.zeros((bq, d), jnp.float32)
        m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        acc, m, l = jax.lax.fori_loop(
            lo_block, num_kv_blocks, body, (acc, m0, l0))

        out = acc / jnp.where(l == 0.0, 1.0, l)
        if packed:
            o_ref[0] = out.astype(o_ref.dtype)
        else:
            o_ref[0, hh] = out.astype(o_ref.dtype)


# LM causal prefill: 512 measured ~9% faster than 256 at t=1536 on v5e
# (51.3 ms vs 56.5 ms; whole-bench wall-clock better at every model size).
DEFAULT_BLOCK = int(os.environ.get("VST_LM_BLOCK", "512"))
# ViT layers prefer bigger blocks (full-attn layers ~2x faster at 512 on v5e).
VIT_BLOCK = int(os.environ.get("VST_VIT_BLOCK", "512"))
# Window-attention layers: segments are only 64 patches, so smaller blocks do
# ~4x less masked-block work in theory — but MEASURED SLOWER on v5e (128:
# 81.8 ms vs 512: 79.2 ms full ViT; grid/launch overhead dominates the saved
# flops). Kept as a tuning knob; default matches the full-attention block.
WINDOW_BLOCK = int(os.environ.get("VST_WINDOW_BLOCK", "512"))
# Block-diagonal window kernel (window-aligned layout): 16 heads x 256 block
# measured best on v5e (69.1 ms full 3B ViT vs 70.8 at 8x512 and 79.8 for the
# per-head flash path; 16x512 overflows scoped VMEM).
DIAG_BLOCK = int(os.environ.get("VST_DIAG_BLOCK", "256"))
DIAG_HPP = int(os.environ.get("VST_DIAG_HPP", "16"))
# Reduced-precision softmax exponent in the flash kernel: the 4 full-attn
# ViT layers are transcendental-bound (S^2*H fp32 exps, measured 3.4 ms/layer
# vs 0.82 ideal); a bf16 exp halves VPU lanes per element at ~0.4% relative
# error on attention weights. Opt-in (perf experiment knob).
EXP_BF16 = os.environ.get("VST_EXP_BF16", "0") == "1"
# Window attention implementation under the aligned layout:
#   "diag"  — block-diagonal Pallas kernel (r2 default)
#   "slots" — window-batched dense XLA einsums (no Pallas grid/transposes)
WINDOW_IMPL = os.environ.get("VST_WINDOW_IMPL", "diag")


def _flash_pallas(
    q, k, v, q_seg, kv_seg, causal, scale, block_q=DEFAULT_BLOCK,
    block_k=DEFAULT_BLOCK, kv_bounds=None, interpret=False,
    kv_iters=None,
):
    """q: [B, Sq, H, D] -> [B, Sq, H, D]. Sq/Sk must be multiples of blocks.

    ``kv_bounds``: optional [num_q_blocks, 2] int32 (lo, hi) kv-block ranges
    per query block (see ``segment_block_bounds``); defaults to the full range.
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    # Mosaic requires dynamic-slice offsets provably 128-aligned: a block
    # clamped to a non-128-multiple sequence length (e.g. a FastV full-seq
    # prefill of 318, or a short OV prefill of 98) would emit misaligned loads
    # inside the kv loop. When the caller didn't supply kv_bounds (whose
    # granularity must match the block), snap blocks to 128 multiples — the
    # padding branch below then absorbs the remainder.
    if kv_bounds is None:
        if block_q % 128:
            block_q = 128 if block_q < 128 else block_q - block_q % 128
        if block_k % 128:
            block_k = 128 if block_k < 128 else block_k - block_k % 128
    if sq % block_q or sk % block_k:
        # Pad to block multiples (padding rows get segment id 0 -> inert).
        assert kv_bounds is None, "kv_bounds require block-aligned lengths"
        pq = -sq % block_q
        pk = -sk % block_k
        q2 = jnp.pad(q, ((0, 0), (0, pq), (0, 0), (0, 0)))
        k2 = jnp.pad(k, ((0, 0), (0, pk), (0, 0), (0, 0)))
        v2 = jnp.pad(v, ((0, 0), (0, pk), (0, 0), (0, 0)))
        qs2 = jnp.pad(q_seg, ((0, 0), (0, pq)))
        ks2 = jnp.pad(kv_seg, ((0, 0), (0, pk)))
        out = _flash_pallas(q2, k2, v2, qs2, ks2, causal, scale,
                            block_q, block_k, None, interpret)
        return out[:, :sq]
    num_q_blocks = sq // block_q
    num_kv_blocks = sk // block_k
    if kv_bounds is None:
        kv_bounds = jnp.stack(
            [jnp.zeros(num_q_blocks, jnp.int32),
             jnp.full(num_q_blocks, num_kv_blocks, jnp.int32)], axis=1
        )

    # Whole-kv-in-VMEM overflows scoped VMEM at large sequences — measured:
    # 16384 x 80 whole-kv = 10.5 MB double-buffered + ~6 MB of q/out/scratch
    # > the 16 MB limit. Stream kv tiles (bounds-driven data-dependent
    # fetching) once the double-buffered kv alone exceeds ~8 MB.
    kv_vmem = sk * d * q.dtype.itemsize * 2  # one head's k+v, one buffer
    if kv_vmem * 2 > 8 * 2**20:
        return _flash_pallas_streamed(
            q, k, v, q_seg, kv_seg, causal, scale, block_q, block_k,
            kv_bounds, interpret=interpret, kv_iters=kv_iters,
        )

    # [B, H, S, D] layout: Mosaic requires the last block dim divisible by 128
    # or equal to the array dim, so a head-sliced [S, H*D] layout is illegal at
    # d=80 — the head axis must be a leading grid dim (transpose in HBM).
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    # Head grouping: as many heads per program as the kv double-buffer
    # budget allows (amortizes per-program dispatch; see _flash_kernel).
    kv_bytes = sk * d * q.dtype.itemsize * 2  # one head's k+v
    hpp = max(1, min(h, int(10 * 2**20) // (kv_bytes * 2)))
    while h % hpp:
        hpp -= 1

    grid = (b, h // hpp, num_q_blocks)
    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, block_k=block_k,
        kv_len=sk, num_heads=hpp,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hpp, block_q, d),
                         lambda ib, ih, iq: (ib, ih, iq, 0)),
            pl.BlockSpec((1, hpp, sk, d), lambda ib, ih, iq: (ib, ih, 0, 0)),
            pl.BlockSpec((1, hpp, sk, d), lambda ib, ih, iq: (ib, ih, 0, 0)),
            pl.BlockSpec((1, block_q), lambda ib, ih, iq: (ib, iq)),
            pl.BlockSpec((1, sk), lambda ib, ih, iq: (ib, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, hpp, block_q, d), lambda ib, ih, iq: (ib, ih, iq, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=2 * (qt.size + kt.size + vt.size) * qt.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(
        qt,
        kt,
        vt,
        q_seg.astype(jnp.int32),
        kv_seg.astype(jnp.int32),
        kv_bounds.astype(jnp.int32),
    )
    return out.transpose(0, 2, 1, 3)


def _flash_kernel_streamed(bounds_ref, q_ref, k_ref, v_ref, qseg_ref,
                           kseg_ref, o_ref, acc_ref, m_ref, l_ref,
                           *, scale, causal, block_k, num_heads, nkv_iters,
                           block_q):
    """Streamed flash body. Grid: (B, head_groups, num_q_blocks, nkv_iters).

    kv tiles are fetched DATA-DEPENDENTLY: the BlockSpec index map reads this
    q-block's [lo, hi) range from the scalar-prefetched ``bounds_ref`` and
    fetches tile ``lo + ikv`` — so only the tiles a q block actually attends
    to are ever DMA'd (for video, full-attention segments are per-frame:
    ~2 tiles instead of 32 at the 16384 bucket), and VMEM holds one kv tile
    instead of the whole sequence (the whole-kv layout overflows scoped VMEM
    beyond ~14k patches). Accumulators persist in VMEM scratch across the
    innermost kv grid axis; the output block is (re)written each step and
    flushed when the q block changes.
    """
    iq = pl.program_id(2)
    ikv = pl.program_id(3)
    lo = bounds_ref[2 * iq]
    hi = bounds_ref[2 * iq + 1]
    j = jnp.minimum(lo + ikv, jnp.maximum(hi - 1, 0))  # fetched tile index
    q_seg = qseg_ref[0]

    @pl.when(ikv == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    active = (lo + ikv) < hi
    if causal:
        last_q = (iq + 1) * block_q - 1
        active = active & (j * block_k <= last_q)

    @pl.when(active)
    def _compute():
        k_seg = kseg_ref[0]
        # mask depends only on (iq, j): build once for the whole head group
        mask = (q_seg[:, None] == k_seg[None, :]) & (k_seg[None, :] > 0)
        if causal:
            qi = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            ki = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            mask = mask & (qi >= ki)
        for hh in range(num_heads):
            q = q_ref[0, hh]
            k = k_ref[0, hh]
            v = v_ref[0, hh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = jnp.where(mask, s, NEG_INF)
            m_prev = m_ref[hh]
            l_prev = l_ref[hh]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[hh] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[hh] = acc_ref[hh] * alpha + pv
            m_ref[hh] = m_new

    @pl.when(ikv == nkv_iters - 1)
    def _finalize():
        for hh in range(num_heads):
            l = l_ref[hh]
            o_ref[0, hh] = (
                acc_ref[hh] / jnp.where(l == 0.0, 1.0, l)
            ).astype(o_ref.dtype)


def _flash_pallas_streamed(
    q, k, v, q_seg, kv_seg, causal, scale, block_q, block_k,
    kv_bounds, interpret=False, kv_iters: int | None = None,
    heads_per_program: int | None = None,
):
    """Large-sequence flash attention: kv streamed tile-by-tile (see
    ``_flash_kernel_streamed``). Requires block-aligned shapes and bounds.

    ``kv_iters``: static max tiles any q block needs (host-computed from the
    bounds; defaults to the full tile count). Contract: a q block attends to
    kv tiles ``[lo, min(hi, lo + kv_iters))`` — the bounds are explicitly
    clamped below, so an undersized ``kv_iters`` truncates attention by
    construction rather than silently (callers compute it as max(hi-lo) or
    round up; see ``preprocess.indices._stable_kv_iters``)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    assert sq % block_q == 0 and sk % block_k == 0, (sq, sk, block_q, block_k)
    num_q_blocks = sq // block_q
    num_kv_blocks = sk // block_k
    if kv_iters is None:
        kv_iters = num_kv_blocks
    kv_iters = max(1, min(kv_iters, num_kv_blocks))
    kv_bounds = jnp.stack(
        [kv_bounds[:, 0],
         jnp.minimum(kv_bounds[:, 1], kv_bounds[:, 0] + kv_iters)], axis=1
    )
    if heads_per_program is None:
        heads_per_program = int(os.environ.get("VST_STREAM_HPP", "4"))
    hpp = min(heads_per_program, h)
    while h % hpp:
        hpp -= 1

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    bounds_flat = kv_bounds.astype(jnp.int32).reshape(-1)

    kernel = functools.partial(
        _flash_kernel_streamed, scale=scale, causal=causal, block_k=block_k,
        num_heads=hpp, nkv_iters=kv_iters, block_q=block_q,
    )

    def kv_index(ib, ih, iq, ikv, bounds):
        lo = bounds[2 * iq]
        hi = bounds[2 * iq + 1]
        j = jnp.minimum(lo + ikv, jnp.maximum(hi - 1, 0))
        return (ib, ih, j, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h // hpp, num_q_blocks, kv_iters),
        in_specs=[
            pl.BlockSpec((1, hpp, block_q, d),
                         lambda ib, ih, iq, ikv, bounds: (ib, ih, iq, 0)),
            pl.BlockSpec((1, hpp, block_k, d), kv_index),
            pl.BlockSpec((1, hpp, block_k, d), kv_index),
            pl.BlockSpec((1, block_q),
                         lambda ib, ih, iq, ikv, bounds: (ib, iq)),
            pl.BlockSpec((1, block_k),
                         lambda ib, ih, iq, ikv, bounds: (
                             ib, kv_index(ib, ih, iq, ikv, bounds)[2])),
        ],
        out_specs=pl.BlockSpec(
            (1, hpp, block_q, d),
            lambda ib, ih, iq, ikv, bounds: (ib, ih, iq, 0)),
        scratch_shapes=[
            pltpu.VMEM((hpp, block_q, d), jnp.float32),
            pltpu.VMEM((hpp, block_q, 1), jnp.float32),
            pltpu.VMEM((hpp, block_q, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * min(sk, kv_iters * block_k) * d,
            bytes_accessed=(qt.size + 2 * kt.size // max(1, num_kv_blocks //
                                                         kv_iters)) * 2,
            transcendentals=b * h * sq * kv_iters * block_k,
        ),
    )(
        bounds_flat,
        qt,
        kt,
        vt,
        q_seg.astype(jnp.int32),
        kv_seg.astype(jnp.int32),
    )
    return out.transpose(0, 2, 1, 3)


def segment_block_bounds(seg_ids, block_q: int, block_k: int,
                         num_segments_hint: int | None = None):
    """Per-query-block [lo, hi) kv-block ranges from contiguous segment ids.

    Works on host numpy or jnp arrays. Requires the packed layout this
    framework produces: same-segment tokens contiguous, padding (seg 0) at the
    end. A query block's kv range spans the first to last token of the
    segments it touches.
    """
    import numpy as np

    seg = np.asarray(seg_ids)
    s = len(seg)
    nq = s // block_q
    # Vectorized: segments are contiguous and ascending with 0-padding at the
    # end, so a block's kv range spans first(min nonzero seg in block) ..
    # last(max seg in block).
    vals, first_idx = np.unique(seg, return_index=True)
    vals_r, first_r = np.unique(seg[::-1], return_index=True)
    last_idx = s - 1 - first_r  # vals_r == vals (both sorted unique)
    max_id = int(vals.max(initial=0))
    first_arr = np.zeros(max_id + 1, np.int64)
    last_arr = np.zeros(max_id + 1, np.int64)
    first_arr[vals] = first_idx
    last_arr[vals_r] = last_idx

    blocks = seg.reshape(nq, block_q)
    has_valid = (blocks > 0).any(axis=1)
    bmin = np.where(blocks == 0, max_id + 1, blocks).min(axis=1)
    bmax = blocks.max(axis=1)
    bmin = np.where(has_valid, bmin, 0)
    lo = first_arr[bmin] // block_k
    hi = last_arr[bmax] // block_k + 1
    bounds = np.stack([
        np.where(has_valid, lo, 0), np.where(has_valid, hi, 0)
    ], axis=1).astype(np.int32)
    return bounds


def _flash_pallas_packed(
    q, k, v, q_seg, kv_seg, causal, scale, block_q=DEFAULT_BLOCK,
    block_k=DEFAULT_BLOCK, kv_bounds=None, interpret=False, head_dim=128,
):
    """Transpose-free flash attention for 128-multiple head dims.

    q, k, v: [B, S, H, dp] with dp % 128 == 0 — viewed as [B, S, H*dp], each
    grid program slices its head's dp columns via the BlockSpec index map, so
    no HBM transposes happen (the [B, H, S, D] layout costs ~0.7 ms/layer in
    transposes for the ViT; this path removes them). For the Qwen ViT (d=80),
    heads are zero-padded to 128 in the WEIGHTS (see
    ``models.qwen25vl.weights.pad_vit_head_dim``) — logits/outputs are exactly
    equal because the pad columns are zero; ``scale`` must be the REAL
    head_dim**-0.5.
    """
    b, sq, h, dp = q.shape
    sk = k.shape[1]
    assert dp % 128 == 0, dp
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    if sq % block_q or sk % block_k:
        assert kv_bounds is None, "kv_bounds require block-aligned lengths"
        pq = -sq % block_q
        pk = -sk % block_k
        out = _flash_pallas_packed(
            jnp.pad(q, ((0, 0), (0, pq), (0, 0), (0, 0))),
            jnp.pad(k, ((0, 0), (0, pk), (0, 0), (0, 0))),
            jnp.pad(v, ((0, 0), (0, pk), (0, 0), (0, 0))),
            jnp.pad(q_seg, ((0, 0), (0, pq))),
            jnp.pad(kv_seg, ((0, 0), (0, pk))),
            causal, scale, block_q, block_k, None, interpret, head_dim,
        )
        return out[:, :sq]
    num_q_blocks = sq // block_q
    num_kv_blocks = sk // block_k
    if kv_bounds is None:
        kv_bounds = jnp.stack(
            [jnp.zeros(num_q_blocks, jnp.int32),
             jnp.full(num_q_blocks, num_kv_blocks, jnp.int32)], axis=1
        )

    qf = q.reshape(b, sq, h * dp)
    kf = k.reshape(b, sk, h * dp)
    vf = v.reshape(b, sk, h * dp)

    grid = (b, h, num_q_blocks)
    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, block_k=block_k, kv_len=sk,
        packed=True,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda ib, ih, iq: (ib, iq, ih)),
            pl.BlockSpec((1, sk, dp), lambda ib, ih, iq: (ib, 0, ih)),
            pl.BlockSpec((1, sk, dp), lambda ib, ih, iq: (ib, 0, ih)),
            pl.BlockSpec((1, block_q), lambda ib, ih, iq: (ib, iq)),
            pl.BlockSpec((1, sk), lambda ib, ih, iq: (ib, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dp), lambda ib, ih, iq: (ib, iq, ih)
        ),
        out_shape=jax.ShapeDtypeStruct((b, sq, h * dp), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * head_dim,
            bytes_accessed=2 * (qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(
        qf, kf, vf,
        q_seg.astype(jnp.int32),
        kv_seg.astype(jnp.int32),
        kv_bounds.astype(jnp.int32),
    )
    return out.reshape(b, sq, h, dp)


def _diag_kernel(q_ref, k_ref, v_ref, seg_ref, o_ref, *, scale, num_heads):
    """Block-diagonal attention, several heads per program.
    Grid: (B, head_groups, num_q_blocks).

    Each program's queries attend only to keys in the SAME block (the
    window-aligned ViT layout guarantees no window straddles a block
    boundary), so there is no kv loop and no online softmax — one exact
    fp32 softmax per head over a [bq, bq] tile. Folding heads into the
    program removes the per-(head, block) grid dispatch overhead that
    dominates the 28 window layers (kv per block is only bq tokens, so a
    head group's k/v fits VMEM — unlike full-attention layers). 8 heads per
    program measured as the VMEM sweet spot (16 heads x 512 x 80 double
    buffered overflows the 16 MB scoped vmem limit by 4 KB).
    """
    seg = seg_ref[0]  # [bq]
    mask = (seg[:, None] == seg[None, :]) & (seg[None, :] > 0)

    for h in range(num_heads):  # static unroll: Mosaic-friendly head indexing
        q = q_ref[0, h]  # [bq, d]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.where(mask, jnp.exp(s - m), 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p / jnp.where(l == 0.0, 1.0, l)
        out = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h] = out.astype(o_ref.dtype)


def window_attention_slots(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    seg: jax.Array,
    slot: int,
    scale: float | None = None,
) -> jax.Array:
    """Window attention as a window-batched dense XLA computation.

    Requires the window-aligned layout (``VisionBatch.window_diag``): every
    window lives inside its own ``slot``-patch group, so attention factors
    into ``S/slot`` independent [slot, slot] problems. Expressed as batched
    einsums + a fused softmax, XLA maps them straight onto MXU tiles with no
    Pallas program grid and no [B,H,S,D] HBM transposes — attacking the
    per-program overhead that dominates the 28 window layers (measured
    ~0.87 ms/layer under the diag Pallas kernel vs ~0.1 ms of roofline).

    q, k, v: [B, S, H, D]; seg: [B, S] (0 = padding). Matches
    ``attention(..., causal=False)`` on aligned layouts.
    """
    b, s, h, d = q.shape
    if scale is None:
        scale = d**-0.5
    assert s % slot == 0, (s, slot)
    nw = s // slot
    qw = q.reshape(b, nw, slot, h, d)
    kw = k.reshape(b, nw, slot, h, d)
    vw = v.reshape(b, nw, slot, h, d)
    segw = seg.reshape(b, nw, slot)
    logits = jnp.einsum(
        "bwqhd,bwkhd->bwhqk", qw, kw, preferred_element_type=jnp.float32
    ) * scale
    mask = (segw[:, :, None, :, None] == segw[:, :, None, None, :]) & (
        segw[:, :, None, None, :] > 0
    )  # [b, nw, 1, slot, slot]
    logits = jnp.where(mask, logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    # padding-query rows (all keys masked) softmax to uniform; zero them
    p = jnp.where(mask.any(axis=-1, keepdims=True), p, 0.0)
    out = jnp.einsum("bwhqk,bwkhd->bwqhd", p.astype(v.dtype), vw)
    return out.reshape(b, s, h, d)


def attention_diag(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    seg: jax.Array,
    scale: float | None = None,
    block_q: int | None = None,
    interpret: bool = False,
    heads_per_program: int | None = None,
) -> jax.Array:
    """Block-diagonal segment attention (window-aligned ViT layout).

    q, k, v: [B, S, H, D]; seg: [B, S]. Requires every segment to live inside
    one ``block_q``-aligned block (``VisionBatch.window_diag``). Equivalent to
    ``attention(..., causal=False)`` on such layouts; far fewer programs.
    """
    b, s, h, d = q.shape
    if scale is None:
        scale = d**-0.5
    if block_q is None:
        # Must mirror the block used for the ``window_diag`` layout decision
        # in ``build_vision_batch`` (wblock = min(DIAG_BLOCK, s_pad)).
        block_q = DIAG_BLOCK
    block_q = min(block_q, s)
    assert s % block_q == 0, (s, block_q)
    if heads_per_program is None:
        heads_per_program = DIAG_HPP
    hpp = min(heads_per_program, h)
    while h % hpp:
        hpp -= 1

    grid = (b, h // hpp, s // block_q)
    kernel = functools.partial(_diag_kernel, scale=scale, num_heads=hpp)
    spec = pl.BlockSpec((1, hpp, block_q, d), lambda ib, ih, iq: (ib, ih, iq, 0))

    def pallas_fn(q, k, v, seg, _kv_seg, _bounds):
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                spec,
                spec,
                spec,
                pl.BlockSpec((1, block_q), lambda ib, ih, iq: (ib, iq)),
            ],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * s * block_q * d,
                bytes_accessed=2 * (qt.size + kt.size + vt.size)
                * qt.dtype.itemsize,
                transcendentals=b * h * s * block_q,
            ),
        )(qt, kt, vt, seg.astype(jnp.int32))
        return out.transpose(0, 2, 1, 3)

    return _with_reference_vjp(pallas_fn, q, k, v, seg, seg, False, scale)


def default_impl() -> str:
    impl = os.environ.get("VST_ATTN_IMPL", "auto")
    if impl != "auto":
        return impl
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        platform = "cpu"
    return "pallas" if platform in ("tpu", "axon") else "xla"


def _flash_stats_blocked(q, k, q_seg, kv_seg, causal, scale, block):
    """Row softmax stats (m [B,H,Sq], l [B,H,Sq]) via a kv-block scan.

    Memory O(Sq * block) instead of O(Sq * Sk): the streaming backward
    below needs each row's max and normalizer without materializing logits.
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    nb = sk // block
    qt = q.astype(jnp.float32).transpose(0, 2, 1, 3)  # [B,H,Sq,D]
    kt = k.astype(jnp.float32).transpose(0, 2, 1, 3)
    qi = jnp.arange(sq)

    def body(carry, j):
        m, l = carry  # [B,H,Sq]
        ks = jax.lax.dynamic_slice_in_dim(kt, j * block, block, axis=2)
        s = jnp.einsum("bhqd,bhkd->bhqk", qt, ks) * scale
        kseg = jax.lax.dynamic_slice_in_dim(kv_seg, j * block, block, axis=1)
        mask = (q_seg[:, :, None] == kseg[:, None, :]) & (kseg[:, None, :] > 0)
        if causal:
            ki = j * block + jnp.arange(block)
            mask = mask & (qi[None, :, None] >= ki[None, None, :])
        s = jnp.where(mask[:, None], s, NEG_INF)
        m_cur = s.max(-1)
        m_new = jnp.maximum(m, m_cur)
        l = l * jnp.exp(m - m_new) + jnp.where(
            mask[:, None], jnp.exp(s - m_new[..., None]), 0.0
        ).sum(-1)
        return (m_new, l), None

    m0 = jnp.full((b, h, sq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, sq), jnp.float32)
    (m, l), _ = jax.lax.scan(body, (m0, l0), jnp.arange(nb))
    return m, l


def _mha_backward_blocked(q, k, v, q_seg, kv_seg, causal, scale, out, g,
                          block: int = 512):
    """Flash-attention backward, streamed over kv blocks (O(S*block) memory).

    Standard formulas: with P = softmax(S), delta = rowsum(dO * O),
    dV = P^T dO; dS = P * (dO V^T - delta); dQ = dS K * scale;
    dK = dS^T Q * scale. The T x T probability matrix is never materialized —
    the reference-trace backward would need ~16 GB at the 16384 packed
    training bucket; this stays at the block working set.
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block = min(block, sk)
    if sk % block:
        block = next((bb for bb in (384, 256, 128, 64) if sk % bb == 0), 0)
    if not block or sq != sk:
        # unaligned/unequal cases fall back to the reference trace (small)
        _, vjp = jax.vjp(
            lambda a, bb, c: mha_reference(a, bb, c, q_seg, kv_seg, causal,
                                           scale), q, k, v)
        return vjp(g.astype(q.dtype))

    qf = q.astype(jnp.float32).transpose(0, 2, 1, 3)  # [B,H,S,D]
    kf = k.astype(jnp.float32).transpose(0, 2, 1, 3)
    vf = v.astype(jnp.float32).transpose(0, 2, 1, 3)
    gf = g.astype(jnp.float32).transpose(0, 2, 1, 3)
    of = out.astype(jnp.float32).transpose(0, 2, 1, 3)

    m, l = _flash_stats_blocked(q, k, q_seg, kv_seg, causal, scale, block)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    delta = (gf * of).sum(-1)  # [B,H,Sq]
    qi = jnp.arange(sq)

    def body(carry, j):
        dq = carry
        ks = jax.lax.dynamic_slice_in_dim(kf, j * block, block, axis=2)
        vs = jax.lax.dynamic_slice_in_dim(vf, j * block, block, axis=2)
        kseg = jax.lax.dynamic_slice_in_dim(kv_seg, j * block, block, axis=1)
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, ks) * scale
        mask = (q_seg[:, :, None] == kseg[:, None, :]) & (kseg[:, None, :] > 0)
        if causal:
            ki = j * block + jnp.arange(block)
            mask = mask & (qi[None, :, None] >= ki[None, None, :])
        p = jnp.where(mask[:, None], jnp.exp(s - m[..., None]), 0.0)
        p = p / l_safe[..., None]
        dv_j = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
        dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vs)
        ds = p * (dp - delta[..., None])
        dq = dq + jnp.einsum("bhqk,bhkd->bhqd", ds, ks) * scale
        dk_j = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * scale
        return dq, (dk_j, dv_j)

    nb = sk // block
    dq0 = jnp.zeros_like(qf)
    dq, (dk_blocks, dv_blocks) = jax.lax.scan(body, dq0, jnp.arange(nb))
    dk = dk_blocks.transpose(1, 2, 0, 3, 4).reshape(b, h, sk, d)
    dv = dv_blocks.transpose(1, 2, 0, 3, 4).reshape(b, h, sk, d)
    return (
        dq.transpose(0, 2, 1, 3).astype(q.dtype),
        dk.transpose(0, 2, 1, 3).astype(k.dtype),
        dv.transpose(0, 2, 1, 3).astype(v.dtype),
    )


def attention_with_received(q, k, v, seg, scale=None, block: int = 512):
    """Masked attention + per-key received-mass, streamed over kv blocks.

    q, k, v: [S, H, D] (one image batch); seg: [S] (0 = padding).
    Returns (out [S, H, D] in q.dtype,
             recv [S] fp32 = sum over valid queries of head-mean prob,
             normalized by the valid query count) — exactly the statistics
    the ViT-side training-free baselines consume (VisionZip / PruMerge+ /
    HoloV capture semantics), without materializing the [H, S, S] map
    (~17 GB at the 16384 vision bucket).
    """
    s, h, d = q.shape
    if scale is None:
        scale = d**-0.5
    block = min(block, s)
    if s % block:
        block = next((bb for bb in (384, 256, 128, 64, 32, 16, 8, 4, 2, 1)
                      if s % bb == 0))
    m, l = _flash_stats_blocked(
        q[None], k[None], seg[None], seg[None], False, scale, block
    )  # [1, H, S]
    m = m[0].transpose(1, 0)  # [S, H]
    l_safe = jnp.where(l[0] == 0.0, 1.0, l[0]).transpose(1, 0)  # [S, H]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    n_valid = jnp.maximum((seg > 0).sum().astype(jnp.float32), 1.0)

    def body(out_acc, j):
        ks = jax.lax.dynamic_slice_in_dim(kf, j * block, block, axis=0)
        vs = jax.lax.dynamic_slice_in_dim(vf, j * block, block, axis=0)
        kseg = jax.lax.dynamic_slice_in_dim(seg, j * block, block, axis=0)
        s_ = jnp.einsum("qhd,khd->qhk", qf, ks) * scale
        mask = (seg[:, None] == kseg[None, :]) & (kseg[None, :] > 0)
        p = jnp.where(mask[:, None, :], jnp.exp(s_ - m[:, :, None]), 0.0)
        p = p / l_safe[:, :, None]  # [Sq, H, bk]
        out_acc = out_acc + jnp.einsum("qhk,khd->qhd", p, vs)
        recv_j = p.mean(axis=1).sum(axis=0) / n_valid  # [bk]
        return out_acc, recv_j

    out0 = jnp.zeros((s, h, d), jnp.float32)
    out, recv_blocks = jax.lax.scan(body, out0, jnp.arange(s // block))
    recv = recv_blocks.reshape(-1)
    return out.astype(q.dtype), recv


def _with_reference_vjp(pallas_fn, q, k, v, q_seg, kv_seg, causal, scale,
                        kv_bounds=None):
    """Differentiable wrapper: Pallas forward, XLA-reference backward.

    ``pallas_call`` has no autodiff rule, so training through a Pallas
    attention forward would fail. Both paths compute the same exact masked
    softmax attention, so the mathematically correct cotangents are those of
    the reference math — computed by ``_mha_backward_blocked`` (streamed,
    O(S*block) memory; unaligned/unequal shapes fall back to XLA autodiff of
    ``mha_reference``). Inference-only callers never hit the backward.

    All array inputs are explicit primals (closing over them would leak
    tracers under vmap, e.g. the batched train loss); integer primals get
    float0 cotangents. ``pallas_fn(q, k, v, q_seg, kv_seg, kv_bounds)``.
    """
    import numpy as _np

    has_bounds = kv_bounds is not None
    if not has_bounds:
        kv_bounds = jnp.zeros((1, 2), jnp.int32)

    @jax.custom_vjp
    def f(q, k, v, q_seg, kv_seg, kv_bounds):
        return pallas_fn(q, k, v, q_seg, kv_seg,
                         kv_bounds if has_bounds else None)

    def fwd(q, k, v, q_seg, kv_seg, kv_bounds):
        out = pallas_fn(q, k, v, q_seg, kv_seg,
                        kv_bounds if has_bounds else None)
        return out, (q, k, v, q_seg, kv_seg, kv_bounds, out)

    def bwd(res, g):
        qr, kr, vr, q_seg, kv_seg, kv_bounds, out = res
        dq, dk, dv = _mha_backward_blocked(
            qr, kr, vr, q_seg, kv_seg, causal, scale, out, g
        )
        f0 = jax.dtypes.float0
        return (dq, dk, dv,
                _np.zeros(q_seg.shape, f0),
                _np.zeros(kv_seg.shape, f0),
                _np.zeros(kv_bounds.shape, f0))

    f.defvjp(fwd, bwd)
    return f(q, k, v, q_seg.astype(jnp.int32), kv_seg.astype(jnp.int32),
             kv_bounds.astype(jnp.int32))


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_seg: jax.Array,
    kv_seg: jax.Array,
    causal: bool = False,
    scale: float | None = None,
    impl: str | None = None,
    kv_bounds: jax.Array | None = None,
    block_q: int = DEFAULT_BLOCK,
    block_k: int = DEFAULT_BLOCK,
    kv_iters: int | None = None,
) -> jax.Array:
    """Segment-masked multi-head attention. See ``mha_reference`` for shapes.

    ``kv_bounds``: optional per-query-block kv ranges (Pallas block skipping);
    the XLA fallback masks instead and ignores them. Block sizes are tuning
    knobs: 512 measured ~2x faster for the ViT full-attention layers on v5e.
    Differentiable under every impl (Pallas forwards carry an XLA-reference
    custom VJP).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    impl = impl or default_impl()
    if impl == "xla":
        return mha_reference(q, k, v, q_seg, kv_seg, causal, scale)
    if impl in ("pallas", "pallas_interpret"):
        interpret = impl == "pallas_interpret"
        # NOTE: the transpose-free packed layout (_flash_pallas_packed)
        # measured SLOWER on v5e (strided per-head kv DMA beats the one-time
        # HBM transposes it avoids) — opt in via VST_PACKED_ATTN=1.
        if q.shape[-1] % 128 == 0 and os.environ.get("VST_PACKED_ATTN") == "1":
            def pallas_fn(q, k, v, q_seg, kv_seg, kv_bounds):
                return _flash_pallas_packed(
                    q, k, v, q_seg, kv_seg, causal, scale, block_q, block_k,
                    kv_bounds=kv_bounds, interpret=interpret,
                )
        else:
            def pallas_fn(q, k, v, q_seg, kv_seg, kv_bounds):
                return _flash_pallas(
                    q, k, v, q_seg, kv_seg, causal, scale, block_q, block_k,
                    kv_bounds=kv_bounds, interpret=interpret,
                    kv_iters=kv_iters,
                )
        return _with_reference_vjp(
            pallas_fn, q, k, v, q_seg, kv_seg, causal, scale,
            kv_bounds=kv_bounds,
        )
    raise ValueError(f"unknown attention impl {impl!r}")


def _decode_blocked_kernel(lens_ref, q_ref, k_ref, v_ref, *rest,
                           scale, block_k, h_kv, n_rep, t_c, n_iters, d,
                           quant=False):
    """Length-aware decode attention body. Grid: (B, n_iters).

    kv tiles beyond this slot's live length are never DMA'd: the BlockSpec
    index map clamps to the last live tile (the pipeline skips the copy when
    the mapped block is unchanged — same mechanism as
    ``_flash_kernel_streamed``) and their compute is skipped with
    ``pl.when``. HBM traffic per slot is ceil((len + t_c)/block_k) tiles
    instead of T_max/block_k — the whole point: a continuous-batching slot
    pool is provisioned for its LONGEST request, and the dense XLA decode
    attention reads every slot at T_max regardless of how little of it is
    live.

    ``quant=True``: k/v refs are int8 and two extra [block_k, h_kv] f32
    per-row scale refs follow — dequant folds into the logits and probs
    exactly like the dense XLA path, so the int8 pool's halved tile bytes
    combine with the tail skipping."""
    if quant:
        ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest
        ks_ref = vs_ref = None
    ib = pl.program_id(0)
    ikv = pl.program_id(1)
    base = lens_ref[ib]

    @pl.when(ikv == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    active = (ikv * block_k) < (base + t_c)

    @pl.when(active)
    def _compute():
        rows = t_c * n_rep
        # chunk row i's kv sits at cache position base + i, and row i
        # attends causally: positions < base + i + 1. Rows are grouped
        # [t_c, n_rep] -> row r belongs to chunk position r // n_rep.
        ki = ikv * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (rows, block_k), 1)
        row_pos = jax.lax.broadcasted_iota(
            jnp.int32, (rows, block_k), 0) // n_rep
        mask = ki < (base + row_pos + 1)
        for hh in range(h_kv):
            qh = q_ref[0, hh]                          # [rows, D]
            kh = k_ref[0][:, hh * d:(hh + 1) * d]      # [block_k, D]
            vh = v_ref[0][:, hh * d:(hh + 1) * d]
            if quant:
                kh = kh.astype(qh.dtype)
                vh = vh.astype(qh.dtype)
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if ks_ref is not None:
                s = s * ks_ref[0][:, hh][None, :]
            s = jnp.where(mask, s, NEG_INF)
            m_prev = m_ref[hh]
            l_prev = l_ref[hh]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[hh] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            if vs_ref is not None:
                p = p * vs_ref[0][:, hh][None, :]
            acc_ref[hh] = acc_ref[hh] * alpha + jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[hh] = m_new

    @pl.when(ikv == n_iters - 1)
    def _finalize():
        for hh in range(h_kv):
            l = l_ref[hh]
            o_ref[0, hh] = (
                acc_ref[hh] / jnp.where(l == 0.0, 1.0, l)
            ).astype(o_ref.dtype)


def _decode_blocked_pallas(q, k_cache, v_cache, base_len, scale, block_k,
                           interpret=False, k_scale=None, v_scale=None):
    """Blocked GQA decode attention over an unexpanded [B, T_max, H_kv, D]
    cache; reads only the live prefix of each slot (see kernel docstring).

    ``base_len`` [B]: pre-chunk lengths; row i attends to < base_len + i + 1.
    ``k_scale``/``v_scale`` ([B, T_max, H_kv] f32): int8-cache dequant
    scales, folded into logits/probs in-kernel.
    """
    b, t_c, hq, d = q.shape
    t_max, h_kv = k_cache.shape[1], k_cache.shape[2]
    n_rep = hq // h_kv
    assert t_max % block_k == 0, (t_max, block_k)
    n_iters = t_max // block_k
    rows = t_c * n_rep
    quant = k_scale is not None
    # [B, H_kv, t_c*n_rep, D]: per kv head, its query group as dense rows
    qg = (q.reshape(b, t_c, h_kv, n_rep, d)
           .transpose(0, 2, 1, 3, 4).reshape(b, h_kv, rows, d))
    # flatten (H_kv, D) so the per-head slice is a minor-dim slice at
    # d-alignment (no strided sublane loads in the kernel)
    kf = k_cache.reshape(b, t_max, h_kv * d)
    vf = v_cache.reshape(b, t_max, h_kv * d)
    lens = base_len.astype(jnp.int32)

    def kv_index(ib, ikv, lens):
        last = jnp.maximum(
            (lens[ib] + t_c + block_k - 1) // block_k - 1, 0)
        return (ib, jnp.minimum(ikv, last), 0)

    in_specs = [
        pl.BlockSpec((1, h_kv, rows, d),
                     lambda ib, ikv, lens: (ib, 0, 0, 0)),
        pl.BlockSpec((1, block_k, h_kv * d), kv_index),
        pl.BlockSpec((1, block_k, h_kv * d), kv_index),
    ]
    operands = [lens, qg, kf, vf]
    if quant:
        in_specs += [pl.BlockSpec((1, block_k, h_kv), kv_index)] * 2
        operands += [k_scale.astype(jnp.float32),
                     v_scale.astype(jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_iters),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h_kv, rows, d),
                               lambda ib, ikv, lens: (ib, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h_kv, rows, d), jnp.float32),
            pltpu.VMEM((h_kv, rows, 1), jnp.float32),
            pltpu.VMEM((h_kv, rows, 1), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_blocked_kernel, scale=scale, block_k=block_k, h_kv=h_kv,
        n_rep=n_rep, t_c=t_c, n_iters=n_iters, d=d, quant=quant)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h_kv, rows, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * t_c * t_max * d,
            # the honest traffic is data-dependent; report the worst case,
            # using each operand's real itemsize (int8 caches + f32 scales)
            bytes_accessed=(
                qg.size * qg.dtype.itemsize
                + kf.size * kf.dtype.itemsize
                + vf.size * vf.dtype.itemsize
                + ((k_scale.size + v_scale.size) * 4 if quant else 0)
            ),
            transcendentals=b * hq * t_c * t_max,
        ),
    )(*operands)
    return (out.reshape(b, h_kv, t_c, n_rep, d)
               .transpose(0, 2, 1, 3, 4).reshape(b, t_c, hq, d))


def _decode_impl(impl: str | None) -> str:
    """Decode-attention impl: explicit arg > VST_DECODE_ATTN env > xla.

    Like every VST_* knob, the env var is read at TRACE time — flipping it
    after a program compiled does not retrace."""
    return impl or os.environ.get("VST_DECODE_ATTN", "xla")


def _blocked_ok(k_cache, k_scale, v_scale, block_k: int) -> bool:
    # int8 caches need BOTH scales (the kernel folds k into logits and v
    # into probs); mixed/missing scales fall back to the dense path.
    # Packed-S4 (int4 pools) stays on the XLA path: Mosaic has no S4
    # tile-load for this kernel's block spec.
    quant_ok = (k_scale is None) == (v_scale is None)
    return (quant_ok and k_cache.ndim == 4
            and k_cache.dtype != jnp.int4
            and k_cache.shape[1] % block_k == 0
            and k_cache.shape[1] >= 2 * block_k)


def chunk_decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    base_len: jax.Array,
    scale: float | None = None,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    impl: str | None = None,
    block_k: int | None = None,
) -> jax.Array:
    """Multi-token decode attention (speculative verification chunk).

    q: [B, T_c, H, D]; k_cache/v_cache: [B, T_max, H, D]; base_len: [B]
    pre-chunk cache lengths. Chunk row i's kv was just written at position
    base_len + i, so row i attends to cache positions < base_len + i + 1
    (causal within the chunk, full view of the committed cache). Like
    ``decode_attention``, XLA handles this well — decode is weight-stream
    bound, which is exactly why verifying T_c tokens costs about one step.

    GQA is handled WITHOUT head expansion: the caches stay [B, T_max, H_kv,
    D] and q is grouped to [B, T_c, H_kv, n_rep, D], so each decode step
    streams the KV pool exactly once at its true size. (``_repeat_kv`` before
    the dot materializes the n_rep-times-larger expanded cache — at 3B's
    n_rep=8 that is 8x the KV HBM traffic, measured ~4x off the roofline at
    long context.) Passing already-expanded caches still works (n_rep=1).

    With ``k_scale``/``v_scale`` ([B, T_max, H_kv], f32) the caches are int8
    and the per-row dequant scales fold into the logits / probs instead of
    materializing a dequantized bf16 cache: the int8->bf16 convert fuses into
    the dot's operand read, so the step's KV HBM traffic really halves (a
    separate dequantize writes + re-reads a bf16 copy, tripling it).

    ``impl``: "xla" (default) or "blocked" / "blocked_interpret" — the
    length-aware Pallas kernel (``_decode_blocked_kernel``) that reads only
    each slot's live prefix instead of the full T_max pool. Falls back to
    the XLA path when the cache is quantized or T_max is not tile-aligned.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    impl = _decode_impl(impl)
    if impl.startswith("blocked"):
        blk = block_k or int(os.environ.get("VST_DECODE_BLOCK", "512"))
        blk = min(blk, k_cache.shape[1])
        if _blocked_ok(k_cache, k_scale, v_scale, blk):
            return _decode_blocked_pallas(
                q, k_cache, v_cache, base_len, scale, blk,
                interpret=impl == "blocked_interpret",
                k_scale=k_scale, v_scale=v_scale,
            )
    b, t_c, hq, d = q.shape
    h_kv = k_cache.shape[2]
    n_rep = hq // h_kv
    qg = q.reshape(b, t_c, h_kv, n_rep, d)
    logits = jnp.einsum(
        "bqgrd,bkgd->bgrqk", qg, k_cache.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    if k_scale is not None:
        logits = logits * k_scale.transpose(0, 2, 1)[:, :, None, None, :]
    limit = base_len[:, None, None] + jnp.arange(t_c)[None, :, None] + 1
    valid = jnp.arange(k_cache.shape[1])[None, None, :] < limit  # [B, Tc, T]
    logits = jnp.where(valid[:, None, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        probs = probs * v_scale.transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum(
        "bgrqk,bkgd->bqgrd", probs.astype(q.dtype), v_cache.astype(q.dtype))
    return out.reshape(b, t_c, hq, d).astype(q.dtype)


def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    cache_len: jax.Array,
    scale: float | None = None,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    impl: str | None = None,
    block_k: int | None = None,
) -> jax.Array:
    """Single-step decode attention against a KV cache.

    q: [B, 1, H, D]; k_cache/v_cache: [B, T_max, H_kv, D]; cache_len: [B]
    valid lengths (query attends to cache positions < cache_len). XLA handles
    this well (it is bandwidth-bound) at near-full pools; when per-slot
    lengths sit well below T_max (continuous-batching slot pools) the
    ``impl="blocked"`` Pallas kernel skips the dead tail's HBM reads (see
    ``chunk_decode_attention``).

    GQA without expansion and optional int8-cache ``k_scale``/``v_scale``
    ([B, T_max, H_kv], f32) folded into logits/probs — see
    ``chunk_decode_attention``.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    impl = _decode_impl(impl)
    if impl.startswith("blocked"):
        blk = block_k or int(os.environ.get("VST_DECODE_BLOCK", "512"))
        blk = min(blk, k_cache.shape[1])
        if _blocked_ok(k_cache, k_scale, v_scale, blk):
            # row limit = base + i + 1 with t_c = 1 -> attends < cache_len
            return _decode_blocked_pallas(
                q, k_cache, v_cache, cache_len - 1, scale, blk,
                interpret=impl == "blocked_interpret",
                k_scale=k_scale, v_scale=v_scale,
            )
    b, t_q, hq, d = q.shape
    h_kv = k_cache.shape[2]
    n_rep = hq // h_kv
    qg = q.reshape(b, t_q, h_kv, n_rep, d)
    logits = jnp.einsum(
        "bqgrd,bkgd->bgrqk", qg, k_cache.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    if k_scale is not None:
        logits = logits * k_scale.transpose(0, 2, 1)[:, :, None, None, :]
    valid = jnp.arange(k_cache.shape[1])[None, :] < cache_len[:, None]  # [B, T]
    logits = jnp.where(valid[:, None, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        probs = probs * v_scale.transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum(
        "bgrqk,bkgd->bqgrd", probs.astype(q.dtype), v_cache.astype(q.dtype))
    return out.reshape(b, t_q, hq, d).astype(q.dtype)
