"""Host-side index construction for the dynamic-resolution ViT.

Re-implements (in vectorized numpy) the shape-dependent index logic of the
reference vision tower:

- window permutation + per-window boundaries
  (``qwen-evaluation/qwen25vl/modeling_qwen2_5_vl.py:470-509`` get_window_index)
- per-image full-attention boundaries (``:542-550``)
- 2D rotary position ids in merge-block order (``:441-468`` rot_pos_emb)

Instead of shipping ``cu_seqlens`` into a CUDA varlen kernel, we convert the
boundaries into **segment ids** — the natural masking currency for a Pallas
flash-attention kernel and for XLA-friendly static shapes. Padding rows get
segment id 0; real segments start at 1.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import numpy as np


def cu_seqlens_to_segment_ids(cu_seqlens: np.ndarray, total_len: int) -> np.ndarray:
    """[0, a, b, ..., total] boundaries -> int32 segment ids (1-based)."""
    seg = np.zeros(total_len, dtype=np.int32)
    cu = np.asarray(cu_seqlens)
    for i in range(len(cu) - 1):
        seg[cu[i] : cu[i + 1]] = i + 1
    return seg


def get_window_index(
    grid_thw: np.ndarray,
    window_size: int = 112,
    spatial_merge_size: int = 2,
    patch_size: int = 14,
) -> Tuple[np.ndarray, np.ndarray]:
    """Window permutation over merged positions + cumulative window lengths.

    Returns:
        window_index: int64 [num_merged_total] permutation of merged positions,
            grouping positions window-by-window (ragged edge windows included).
        cu_window_seqlens: int32 cumulative *patch-level* boundaries per window
            (duplicates from empty windows removed), starting at 0.
    """
    window_index = []
    cu_window_seqlens = [0]
    window_index_id = 0
    merge_unit = spatial_merge_size * spatial_merge_size
    vit_merger_window_size = window_size // spatial_merge_size // patch_size

    for grid_t, grid_h, grid_w in np.asarray(grid_thw):
        llm_grid_h = grid_h // spatial_merge_size
        llm_grid_w = grid_w // spatial_merge_size
        index = np.arange(grid_t * llm_grid_h * llm_grid_w).reshape(
            grid_t, llm_grid_h, llm_grid_w
        )
        pad_h = vit_merger_window_size - llm_grid_h % vit_merger_window_size
        pad_w = vit_merger_window_size - llm_grid_w % vit_merger_window_size
        num_windows_h = (llm_grid_h + pad_h) // vit_merger_window_size
        num_windows_w = (llm_grid_w + pad_w) // vit_merger_window_size
        index_padded = np.pad(
            index, ((0, 0), (0, pad_h), (0, pad_w)), constant_values=-100
        )
        index_padded = index_padded.reshape(
            grid_t,
            num_windows_h,
            vit_merger_window_size,
            num_windows_w,
            vit_merger_window_size,
        )
        index_padded = index_padded.transpose(0, 1, 3, 2, 4).reshape(
            grid_t,
            num_windows_h * num_windows_w,
            vit_merger_window_size,
            vit_merger_window_size,
        )
        seqlens = (index_padded != -100).sum(axis=(2, 3)).reshape(-1)
        index_padded = index_padded.reshape(-1)
        index_new = index_padded[index_padded != -100]
        window_index.append(index_new + window_index_id)
        cu_seqlens_tmp = np.cumsum(seqlens) * merge_unit + cu_window_seqlens[-1]
        cu_window_seqlens.extend(cu_seqlens_tmp.tolist())
        window_index_id += int(grid_t * llm_grid_h * llm_grid_w)

    window_index = np.concatenate(window_index, axis=0)
    cu_window_seqlens = np.asarray(cu_window_seqlens, dtype=np.int32)
    # unique_consecutive: drop zero-length windows.
    keep = np.ones(len(cu_window_seqlens), dtype=bool)
    keep[1:] = cu_window_seqlens[1:] != cu_window_seqlens[:-1]
    return window_index, cu_window_seqlens[keep]


def full_attn_cu_seqlens(grid_thw: np.ndarray) -> np.ndarray:
    """Per-image (per-frame for video) patch-level boundaries for the
    full-attention layers (``modeling_qwen2_5_vl.py:542-550``)."""
    g = np.asarray(grid_thw)
    lens = np.repeat(g[:, 1] * g[:, 2], g[:, 0])
    return np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)


def vision_rot_pos_ids(grid_thw: np.ndarray, spatial_merge_size: int = 2) -> np.ndarray:
    """(h, w) rotary position ids per patch, in merge-block order.

    Matches ``rot_pos_emb`` (``modeling_qwen2_5_vl.py:441-468``): positions are
    emitted block-by-block (2x2 merge blocks, row-major inside each block).
    Returns int32 [total_patches, 2].
    """
    out = []
    m = spatial_merge_size
    for t, h, w in np.asarray(grid_thw):
        hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
        wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))

        def blockify(x):
            return (
                x.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
            )

        pos = np.stack([blockify(hpos), blockify(wpos)], axis=-1)
        out.append(np.tile(pos, (t, 1)))
    return np.concatenate(out, axis=0).astype(np.int32)


@dataclasses.dataclass
class VisionBatch:
    """Statically-shaped device inputs for one ViT forward.

    All arrays are padded to ``padded_len`` patches (a bucket size); padding
    rows carry segment id 0 in both segment arrays and are ignored by the
    attention kernel and downstream masking.
    """

    pixel_values: np.ndarray      # [S_pad, patch_dim] float32
    rot_pos_ids: np.ndarray       # [S_pad, 2] int32 (h, w)
    window_seg_ids: np.ndarray    # [S_pad] int32, window-attention segments
    full_seg_ids: np.ndarray      # [S_pad] int32, per-image segments
    window_index: np.ndarray      # [L_pad] int64 merged-position permutation
    reverse_index: np.ndarray     # [L_pad] int64 inverse permutation
    grid_thw: np.ndarray          # [n, 3]
    num_patches: int              # real S
    num_merged: int               # real L = S / merge_unit
    # per-query-block kv-block ranges for the Pallas flash kernel (block
    # skipping; see kernels.attention.segment_block_bounds)
    window_kv_bounds: np.ndarray = None  # [num_q_blocks, 2] int32
    full_kv_bounds: np.ndarray = None    # [num_q_blocks, 2] int32
    # True when every window occupies its own 64-patch-aligned slot (see
    # ``align_windows``): window attention is then strictly block-diagonal at
    # any block size that is a multiple of 64, enabling the all-heads
    # diagonal Pallas kernel (kernels.attention.attention_diag).
    window_diag: bool = False
    # Static max kv tiles any query block needs (host-computed
    # max(hi - lo) over the bounds): lets the streamed large-sequence kernel
    # fetch only the tiles actually attended to (per-frame full-attention
    # segments at video scale -> ~2 of 32 tiles).
    window_kv_iters: int = 0
    full_kv_iters: int = 0


def aligned_window_len(
    grid_thw: np.ndarray,
    window_size: int = 112,
    spatial_merge_size: int = 2,
    patch_size: int = 14,
) -> int:
    """Patch count of the window-aligned layout: 64 slots per (nonempty)
    window. Used for bucket selection before ``build_vision_batch``."""
    win = window_size // spatial_merge_size // patch_size
    slot = win * win * spatial_merge_size * spatial_merge_size
    total = 0
    for t, h, w in np.asarray(grid_thw):
        lh = h // spatial_merge_size
        lw = w // spatial_merge_size
        total += int(t) * (-(-int(lh) // win)) * (-(-int(lw) // win))
    return total * slot


def build_vision_batch(
    pixel_values: np.ndarray,
    grid_thw: np.ndarray,
    window_size: int = 112,
    spatial_merge_size: int = 2,
    patch_size: int = 14,
    pad_to: int | None = None,
    align_windows: bool = False,
) -> VisionBatch:
    """Assemble all index arrays for one ViT call, applying the window
    permutation on the host and padding everything to a static bucket.

    ``align_windows``: place every (ragged) window in its own 64-patch-aligned
    slot, with inert padding rows (segment id 0) filling the remainder of each
    slot. The bucket already pays for padding-row matmuls, so this costs
    nothing extra when the aligned length fits the same bucket — and it makes
    window attention strictly block-diagonal at any block size that is a
    multiple of the slot, enabling the all-heads diagonal kernel
    (``kernels.attention.attention_diag``) that removes the per-head grid
    dispatch overhead dominating the 28 window layers.
    """
    merge_unit = spatial_merge_size * spatial_merge_size
    seq_len = int(pixel_values.shape[0])
    assert seq_len % merge_unit == 0
    num_merged = seq_len // merge_unit

    window_index, cu_window = get_window_index(
        grid_thw, window_size, spatial_merge_size, patch_size
    )
    cu_full = full_attn_cu_seqlens(grid_thw)
    rot_ids = vision_rot_pos_ids(grid_thw, spatial_merge_size)

    # Permute patches and rope ids into window order (merge-block granularity),
    # mirroring modeling_qwen2_5_vl.py:532-540.
    perm = (
        window_index[:, None] * merge_unit + np.arange(merge_unit)[None, :]
    ).reshape(-1)
    pixels_w = pixel_values[perm]
    rot_ids_w = rot_ids[perm]

    window_seg = cu_seqlens_to_segment_ids(cu_window, seq_len)
    # Full-attention segments are defined on the *unpermuted* order; map them
    # through the permutation so both segment arrays index window-ordered rows.
    full_seg = cu_seqlens_to_segment_ids(cu_full, seq_len)[perm]

    def pad_rows(x, total, fill=0):
        if x.shape[0] == total:
            return x
        pad_shape = (total - x.shape[0],) + x.shape[1:]
        return np.concatenate([x, np.full(pad_shape, fill, dtype=x.dtype)], axis=0)

    from visionselector_tpu.kernels.attention import (
        DIAG_BLOCK,
        VIT_BLOCK,
        WINDOW_BLOCK,
        segment_block_bounds,
    )

    if align_windows:
        win = window_size // spatial_merge_size // patch_size
        slot = win * win * merge_unit  # patches per window slot (64)
        wlen = np.diff(cu_window)  # patches per nonempty window
        nw = len(wlen)
        aligned_len = nw * slot
        s_pad = pad_to if pad_to is not None else aligned_len
        assert s_pad >= aligned_len and s_pad % merge_unit == 0, (
            s_pad, aligned_len)
        l_pad = s_pad // merge_unit
        # Destination row for each window-ordered patch: window base + offset.
        win_of = np.repeat(np.arange(nw), wlen)
        dst = win_of * slot + (np.arange(seq_len) - np.repeat(cu_window[:-1], wlen))

        pixels_a = np.zeros((s_pad, pixel_values.shape[1]), np.float32)
        pixels_a[dst] = pixels_w
        rot_a = np.zeros((s_pad, 2), rot_ids_w.dtype)
        rot_a[dst] = rot_ids_w
        wseg_a = np.zeros(s_pad, np.int32)
        wseg_a[dst] = window_seg
        fseg_a = np.zeros(s_pad, np.int32)
        fseg_a[dst] = full_seg

        # Merged-token slots: window w's merged tokens at w*(slot/mu) + offset.
        mslot = slot // merge_unit
        wlen_m = wlen // merge_unit
        win_of_m = np.repeat(np.arange(nw), wlen_m)
        dst_m = win_of_m * mslot + (
            np.arange(num_merged) - np.repeat((cu_window[:-1] // merge_unit), wlen_m)
        )
        # reverse_index[j] = slot of the j-th ORIGINAL merged token; padding
        # output rows (>= num_merged) point at unused (inert) slots.
        reverse_real = np.empty(num_merged, np.int64)
        reverse_real[window_index] = dst_m
        unused = np.setdiff1d(np.arange(l_pad, dtype=np.int64), dst_m)
        reverse_index = np.concatenate([reverse_real, unused])
        # window_index over slots (original merged position per slot; padding
        # slots get their own identity-ish fill so the array stays total).
        window_index_padded = np.full(l_pad, 0, np.int64)
        window_index_padded[dst_m] = window_index
        window_index_padded[unused] = np.arange(num_merged, l_pad)

        wblock = min(DIAG_BLOCK, s_pad)
        fblock = min(VIT_BLOCK, s_pad)
        window_diag = (
            s_pad % wblock == 0 and (wblock % slot == 0 or wblock == s_pad)
        )
        if not window_diag:
            # Flash fallback reads bounds at WINDOW_BLOCK granularity.
            wblock = min(WINDOW_BLOCK, s_pad)
        return VisionBatch(
            pixel_values=pixels_a,
            rot_pos_ids=rot_a,
            window_seg_ids=wseg_a,
            full_seg_ids=fseg_a,
            window_index=window_index_padded,
            reverse_index=reverse_index,
            grid_thw=np.asarray(grid_thw),
            num_patches=seq_len,
            num_merged=num_merged,
            window_kv_bounds=(wb := segment_block_bounds(wseg_a, wblock, wblock)),
            full_kv_bounds=(fb := segment_block_bounds(fseg_a, fblock, fblock)),
            window_diag=window_diag,
            window_kv_iters=_stable_kv_iters(
                int((wb[:, 1] - wb[:, 0]).max(initial=0)),
                s_pad // wblock, s_pad),
            full_kv_iters=_stable_kv_iters(
                int((fb[:, 1] - fb[:, 0]).max(initial=0)),
                s_pad // fblock, s_pad),
        )

    s_pad = pad_to if pad_to is not None else seq_len
    assert s_pad >= seq_len and s_pad % merge_unit == 0
    l_pad = s_pad // merge_unit

    window_index_padded = pad_rows(
        window_index.astype(np.int64), l_pad, fill=l_pad - 1 if l_pad > num_merged else 0
    )
    # Extend the permutation identity-style over padding merged positions so
    # argsort stays a true inverse.
    if l_pad > num_merged:
        window_index_padded[num_merged:] = np.arange(num_merged, l_pad)
    reverse_index = np.argsort(window_index_padded, kind="stable")

    window_seg_padded = pad_rows(window_seg, s_pad)
    full_seg_padded = pad_rows(full_seg, s_pad)
    # Window layers use a smaller block (their segments are ~64 patches);
    # full-attention layers keep the large block (better MXU utilization).
    wblock = min(WINDOW_BLOCK, s_pad)
    fblock = min(VIT_BLOCK, s_pad)
    return VisionBatch(
        pixel_values=pad_rows(pixels_w.astype(np.float32), s_pad),
        rot_pos_ids=pad_rows(rot_ids_w, s_pad),
        window_seg_ids=window_seg_padded,
        full_seg_ids=full_seg_padded,
        window_index=window_index_padded,
        reverse_index=reverse_index,
        grid_thw=np.asarray(grid_thw),
        num_patches=seq_len,
        num_merged=num_merged,
        window_kv_bounds=(wb := segment_block_bounds(window_seg_padded, wblock, wblock)),
        full_kv_bounds=(fb := segment_block_bounds(full_seg_padded, fblock, fblock)),
        window_kv_iters=_stable_kv_iters(
            int((wb[:, 1] - wb[:, 0]).max(initial=0)), s_pad // wblock, s_pad),
        full_kv_iters=_stable_kv_iters(
            int((fb[:, 1] - fb[:, 0]).max(initial=0)), s_pad // fblock, s_pad),
    )


def _stable_kv_iters(raw: int, num_blocks: int, s_pad: int,
                     head_dim: int = 80, itemsize: int = 2) -> int:
    """Stabilize the streamed-kernel tile count used as a static jit arg.

    ``raw`` (max(hi-lo) over the kv bounds) is content-dependent: it varies
    with image aspect ratio even within one bucket, and since it is threaded
    as a static argnum into the jitted prefill programs, each distinct value
    retriggers a full-program compile. Below the streaming VMEM threshold
    (mirrors kernels/attention.py: whole-kv fits when
    ``s_pad*head_dim*itemsize*4 <= 8 MiB``) the kernel never streams and the
    value is unused — return 0 (-> kernel default) so there is exactly one
    program per bucket. Above it, round up to the next power of two (capped
    at the full tile count) to bound the number of program variants.
    Rounding up is always safe: extra tiles are masked inactive in-kernel.
    """
    if s_pad * head_dim * itemsize * 4 <= 8 * 2**20:
        return 0
    p = 1
    while p < raw:
        p *= 2
    return min(p, num_blocks)


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n; falls back to rounding up to the largest stride."""
    for b in buckets:
        if n <= b:
            return b
    step = buckets[-1]
    return ((n + step - 1) // step) * step
