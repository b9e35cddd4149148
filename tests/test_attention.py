"""Attention kernel tests: reference vs brute force, pallas-interpret vs ref."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionselector_tpu.kernels.attention import (
    _flash_pallas,
    decode_attention,
    mha_reference,
)


def brute_force(q, k, v, q_seg, kv_seg, causal):
    """Straightforward per-element masked softmax attention in numpy fp64."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    out = np.zeros_like(np.asarray(q, np.float64))
    scale = d**-0.5
    for bi in range(b):
        for hi in range(h):
            logits = (
                np.asarray(q[bi, :, hi], np.float64)
                @ np.asarray(k[bi, :, hi], np.float64).T
                * scale
            )
            mask = (np.asarray(q_seg[bi])[:, None] == np.asarray(kv_seg[bi])[None, :]) & (
                np.asarray(kv_seg[bi])[None, :] > 0
            )
            if causal:
                mask &= np.arange(sq)[:, None] >= np.arange(sk)[None, :]
            logits = np.where(mask, logits, -np.inf)
            with np.errstate(invalid="ignore"):
                p = np.exp(logits - logits.max(-1, keepdims=True))
                p = np.nan_to_num(p / p.sum(-1, keepdims=True))
            out[bi, :, hi] = p @ np.asarray(v[bi, :, hi], np.float64)
    return out


def make_inputs(b, sq, sk, h, d, segments, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, sq, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, sk, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, sk, h, d), jnp.float32)
    q_seg = jnp.asarray(segments[:sq])[None].repeat(b, 0)
    kv_seg = jnp.asarray(segments[:sk])[None].repeat(b, 0)
    return q, k, v, q_seg, kv_seg


SEGMENTS = np.array([1] * 5 + [2] * 7 + [3] * 2 + [0] * 2, dtype=np.int32)


class TestReference:
    @pytest.mark.parametrize("causal", [False, True])
    def test_vs_brute_force(self, causal):
        q, k, v, qs, ks = make_inputs(2, 16, 16, 3, 8, SEGMENTS)
        got = mha_reference(q, k, v, qs, ks, causal=causal)
        want = brute_force(q, k, v, qs, ks, causal)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    def test_padding_rows_zero(self):
        q, k, v, qs, ks = make_inputs(1, 16, 16, 2, 8, SEGMENTS)
        got = np.asarray(mha_reference(q, k, v, qs, ks))
        np.testing.assert_array_equal(got[0, 14:], 0.0)

    def test_single_segment_equals_dense(self):
        seg = np.ones(32, np.int32)
        q, k, v, qs, ks = make_inputs(1, 32, 32, 2, 16, seg)
        got = mha_reference(q, k, v, qs, ks)
        want = brute_force(q, k, v, qs, ks, False)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class TestPallasInterpret:
    """Pallas kernel correctness via interpret mode (runs on CPU)."""

    @pytest.mark.parametrize("causal", [False, True])
    def test_vs_reference(self, causal):
        seg = np.concatenate(
            [
                np.repeat(np.arange(1, 6), 100),
                np.zeros(12, np.int32),
            ]
        ).astype(np.int32)
        q, k, v, qs, ks = make_inputs(1, 512, 512, 2, 32, seg)
        want = mha_reference(q, k, v, qs, ks, causal=causal)
        got = _flash_pallas(
            q, k, v, qs, ks, causal, 32**-0.5, block_q=128, block_k=128,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4
        )

    def test_blocks_not_dividing_segments(self):
        """Segment boundaries intentionally misaligned with block boundaries."""
        seg = np.concatenate(
            [np.repeat([1, 2, 3], [37, 200, 19]), np.zeros(
                256 - 256, np.int32)]
        ).astype(np.int32)
        q, k, v, qs, ks = make_inputs(1, 256, 256, 2, 16, seg, seed=3)
        want = mha_reference(q, k, v, qs, ks)
        got = _flash_pallas(
            q, k, v, qs, ks, False, 16**-0.5, block_q=64, block_k=64,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4
        )


class TestBlockBounds:
    def test_segment_block_bounds(self):
        from visionselector_tpu.kernels.attention import segment_block_bounds

        seg = np.asarray([1] * 64 + [2] * 64 + [3] * 64 + [0] * 64)
        b = segment_block_bounds(seg, 64, 64)
        np.testing.assert_array_equal(b, [[0, 1], [1, 2], [2, 3], [0, 0]])
        # coarser kv blocks
        b = segment_block_bounds(seg, 64, 128)
        np.testing.assert_array_equal(b, [[0, 1], [0, 1], [1, 2], [0, 0]])

    def test_pallas_with_bounds_matches_reference(self):
        from visionselector_tpu.kernels.attention import segment_block_bounds

        seg = np.concatenate([
            np.repeat(np.arange(1, 9), 60),  # 8 segments of 60 (misaligned)
            np.zeros(32, np.int32),
        ]).astype(np.int32)
        q, k, v, qs, ks = make_inputs(1, 512, 512, 2, 32, seg, seed=11)
        want = mha_reference(q, k, v, qs, ks)
        bounds = jnp.asarray(segment_block_bounds(seg, 64, 64))
        got = _flash_pallas(
            q, k, v, qs, ks, False, 32**-0.5, block_q=64, block_k=64,
            kv_bounds=bounds, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4
        )


class TestDecode:
    def test_matches_reference_last_row(self):
        """Decode of token T equals row T of full causal attention."""
        rng = np.random.RandomState(1)
        b, t, h, d = 1, 12, 2, 8
        q = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, t, h, d), jnp.float32)
        seg = jnp.ones((b, t), jnp.int32)
        full = mha_reference(q, k, v, seg, seg, causal=True)
        # cache padded to 16
        pad = 4
        kc = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        vc = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        got = decode_attention(q[:, -1:], kc, vc, jnp.array([t]))
        np.testing.assert_allclose(
            np.asarray(got[:, 0]), np.asarray(full[:, -1]), atol=2e-5
        )


class TestPackedLayout:
    """Transpose-free packed-head path (d % 128 == 0)."""

    @pytest.mark.parametrize("causal", [False, True])
    def test_packed_vs_reference(self, causal):
        from visionselector_tpu.kernels.attention import _flash_pallas_packed

        seg = np.concatenate(
            [np.repeat(np.arange(1, 4), 80), np.zeros(16, np.int32)]
        ).astype(np.int32)
        q, k, v, qs, ks = make_inputs(1, 256, 256, 2, 128, seg, seed=5)
        want = mha_reference(q, k, v, qs, ks, causal=causal)
        got = _flash_pallas_packed(
            q, k, v, qs, ks, causal, 128**-0.5, block_q=64, block_k=64,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4
        )

    def test_packed_internal_padding(self):
        from visionselector_tpu.kernels.attention import _flash_pallas_packed

        seg = np.concatenate([np.ones(100, np.int32), np.zeros(20, np.int32)])
        q, k, v, qs, ks = make_inputs(1, 120, 120, 2, 128, seg, seed=6)
        want = mha_reference(q, k, v, qs, ks, causal=True)
        got = _flash_pallas_packed(
            q, k, v, qs, ks, True, 128**-0.5, block_q=64, block_k=64,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4
        )


class TestFusedViTAttention:
    """Experimental fused rotary+attention kernel (interpret mode)."""

    def test_vs_composed_reference(self):
        from visionselector_tpu.kernels.attention import segment_block_bounds
        from visionselector_tpu.kernels.fused_vit_attn import fused_vit_attention
        from visionselector_tpu.models.qwen25vl.vit import (
            apply_rotary,
            vision_rotary_cos_sin,
        )

        S, H, D = 256, 4, 16
        rng = np.random.RandomState(0)
        qkv = jnp.asarray(rng.randn(S, 3 * H * D), jnp.float32)
        seg = np.concatenate(
            [np.repeat([1, 2, 3], [90, 100, 50]), np.zeros(16, np.int32)]
        ).astype(np.int32)
        pos = rng.randint(0, 12, (S, 2))
        cos, sin = vision_rotary_cos_sin(jnp.asarray(pos), D)
        bounds = jnp.asarray(segment_block_bounds(seg, 64, 64))
        got = fused_vit_attention(
            qkv, jnp.asarray(seg), cos, sin, bounds, H, D,
            block_q=64, block_k=64, interpret=True,
        )
        q, k, v = jnp.split(qkv.reshape(S, 3, H, D), 3, axis=1)
        qr, kr = apply_rotary(q[:, 0], k[:, 0], cos, sin)
        want = mha_reference(
            qr[None], kr[None], v[:, 0][None], jnp.asarray(seg)[None],
            jnp.asarray(seg)[None], causal=False, scale=D**-0.5,
        )[0].reshape(S, H * D)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4
        )


class TestOddLengthBlocks:
    def test_large_block_on_unaligned_length(self):
        """Blocks clamped to a non-128-multiple sequence length must round
        down to a 128 multiple (Mosaic alignment) and pad — regression for
        the FastV full-sequence prefill at e.g. t=318 with block 512."""
        rng = np.random.RandomState(0)
        for t in (318, 190, 66):
            q = jnp.asarray(rng.randn(1, t, 2, 32), jnp.float32)
            seg = jnp.ones((1, t), jnp.int32)
            want = mha_reference(q, q, q, seg, seg, causal=True)
            got = _flash_pallas(q, q, q, seg, seg, True, 32**-0.5,
                                block_q=512, block_k=512, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=3e-5, rtol=1e-4)


class TestDiagKernel:
    """Block-diagonal all-heads kernel (window-aligned ViT layout)."""

    def _aligned_segments(self, s, slot, rng):
        """Segments each confined to one `slot`-aligned slot, ragged lengths
        (multiples of 4 like real windows), some slots fully empty."""
        seg = np.zeros(s, np.int32)
        sid = 1
        for base in range(0, s, slot):
            ln = int(rng.choice([0, 4, slot // 2, slot]))
            if ln:
                seg[base : base + ln] = sid
                sid += 1
        return seg

    @pytest.mark.parametrize("block_q", [64, 128])
    def test_vs_reference(self, block_q):
        from visionselector_tpu.kernels.attention import attention_diag

        rng = np.random.RandomState(0)
        s, h, d, slot = 256, 4, 16, 64
        seg = self._aligned_segments(s, slot, rng)
        q = jnp.asarray(rng.randn(1, s, h, d), jnp.float32)
        k = jnp.asarray(rng.randn(1, s, h, d), jnp.float32)
        v = jnp.asarray(rng.randn(1, s, h, d), jnp.float32)
        segj = jnp.asarray(seg)[None]
        got = attention_diag(q, k, v, segj, block_q=block_q, interpret=True)
        want = mha_reference(q, k, v, segj, segj, causal=False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )
        # padding rows must be exactly zero
        np.testing.assert_array_equal(np.asarray(got)[0, seg == 0], 0.0)

    def test_single_block_whole_sequence(self):
        from visionselector_tpu.kernels.attention import attention_diag

        rng = np.random.RandomState(1)
        s, h, d = 128, 2, 8
        seg = self._aligned_segments(s, 64, rng)
        q = jnp.asarray(rng.randn(1, s, h, d), jnp.float32)
        k = jnp.asarray(rng.randn(1, s, h, d), jnp.float32)
        v = jnp.asarray(rng.randn(1, s, h, d), jnp.float32)
        segj = jnp.asarray(seg)[None]
        got = attention_diag(q, k, v, segj, block_q=s, interpret=True)
        want = mha_reference(q, k, v, segj, segj, causal=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


class TestWindowSlots:
    """Window-batched dense XLA path (VST_WINDOW_IMPL=slots)."""

    def test_vs_reference_and_padding(self):
        from visionselector_tpu.kernels.attention import (
            window_attention_slots,
        )

        rng = np.random.RandomState(0)
        s, h, d, slot = 256, 4, 16, 32
        seg = np.zeros(s, np.int32)
        sid = 1
        for base in range(0, s, slot):
            ln = int(rng.choice([0, 4, slot // 2, slot]))
            if ln:
                seg[base : base + ln] = sid
                sid += 1
        q = jnp.asarray(rng.randn(1, s, h, d), jnp.float32)
        k = jnp.asarray(rng.randn(1, s, h, d), jnp.float32)
        v = jnp.asarray(rng.randn(1, s, h, d), jnp.float32)
        segj = jnp.asarray(seg)[None]
        got = window_attention_slots(q, k, v, segj, slot=slot)
        want = mha_reference(q, k, v, segj, segj, causal=False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )
        np.testing.assert_array_equal(np.asarray(got)[0, seg == 0], 0.0)


class TestExpBF16:
    """VST_EXP_BF16=1: reduced-precision softmax exponent in the flash
    kernel (perf experiment for the transcendental-bound full-attn ViT
    layers) — must stay within bf16-grade tolerance of the reference."""

    def test_close_to_reference(self, monkeypatch):
        import visionselector_tpu.kernels.attention as A

        monkeypatch.setattr(A, "EXP_BF16", True)
        rng = np.random.RandomState(0)
        s, h, d = 128, 2, 16
        seg = np.ones(s, np.int32)
        seg[100:] = 0
        q = jnp.asarray(rng.randn(1, s, h, d), jnp.float32)
        k = jnp.asarray(rng.randn(1, s, h, d), jnp.float32)
        v = jnp.asarray(rng.randn(1, s, h, d), jnp.float32)
        segj = jnp.asarray(seg)[None]
        got = A._flash_pallas(q, k, v, segj, segj, False, d**-0.5,
                              block_q=64, block_k=64, interpret=True)
        want = mha_reference(q, k, v, segj, segj)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2
        )
        # padding rows still exactly zero
        np.testing.assert_array_equal(np.asarray(got)[0, seg == 0], 0.0)


class TestPallasGrad:
    """Pallas forwards must be differentiable (training on TPU runs the
    flash kernel inside grad): custom VJP = XLA-reference cotangents."""

    @pytest.mark.parametrize("causal", [False, True])
    def test_grad_matches_reference(self, causal):
        from visionselector_tpu.kernels.attention import attention

        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(1, 16, 2, 8), jnp.float32)
        k = jnp.asarray(rng.randn(1, 16, 2, 8), jnp.float32)
        v = jnp.asarray(rng.randn(1, 16, 2, 8), jnp.float32)
        seg = jnp.asarray(SEGMENTS[:16])[None]

        def loss(impl):
            def f(q, k, v):
                out = attention(q, k, v, seg, seg, causal=causal, impl=impl)
                return (out.astype(jnp.float32) ** 2).sum()
            return f

        g_p = jax.grad(loss("pallas_interpret"), argnums=(0, 1, 2))(q, k, v)
        g_x = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
        for gp, gx in zip(g_p, g_x):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gx), atol=2e-4
            )

    def test_grad_through_diag(self):
        from visionselector_tpu.kernels.attention import (
            attention_diag,
            mha_reference,
        )

        rng = np.random.RandomState(1)
        s, h, d = 128, 2, 8
        seg = np.zeros(s, np.int32)
        seg[0:48] = 1
        seg[64:128] = 2
        q = jnp.asarray(rng.randn(1, s, h, d), jnp.float32)
        k = jnp.asarray(rng.randn(1, s, h, d), jnp.float32)
        v = jnp.asarray(rng.randn(1, s, h, d), jnp.float32)
        segj = jnp.asarray(seg)[None]

        def f_diag(q):
            return (attention_diag(q, k, v, segj, block_q=64,
                                   interpret=True) ** 2).sum()

        def f_ref(q):
            return (mha_reference(q, k, v, segj, segj) ** 2).sum()

        np.testing.assert_allclose(
            np.asarray(jax.grad(f_diag)(q)), np.asarray(jax.grad(f_ref)(q)),
            atol=2e-4,
        )

    def test_train_step_loss_pallas_equals_xla(self, monkeypatch):
        """The full selector train step must run (and match) under the Pallas
        attention impl — exactly what the real TPU executes. Guards the
        custom-VJP wiring end-to-end (tracer-safe under the batched vmap)."""
        import jax.numpy as jnp

        from visionselector_tpu.core.config import qwen25vl_tiny
        from visionselector_tpu.models.qwen25vl.model import init_params
        from visionselector_tpu.train.data import (
            build_train_sample,
            stack_samples,
        )
        from visionselector_tpu.train.train_step import (
            ScheduleConfig,
            init_train_state,
            train_step,
        )

        cfg = qwen25vl_tiny()
        params = init_params(jax.random.PRNGKey(0), cfg)
        sched = ScheduleConfig(total_steps=2)
        rng = np.random.RandomState(0)
        img = (rng.rand(56, 56, 3) * 255).astype(np.uint8)
        s = build_train_sample(
            cfg, img, [101], [103], [201, 202], budget=0.25,
            s_bucket=64, t_bucket=64, min_pixels=1, max_pixels=10**9,
        )
        batch = jax.tree.map(jnp.asarray, stack_samples([s]))

        losses = {}
        for impl in ("xla", "pallas_interpret"):
            monkeypatch.setenv("VST_ATTN_IMPL", impl)
            # the env is read at trace time; same static args would otherwise
            # reuse the first impl's compiled executable
            jax.clear_caches()
            state = init_train_state(params, sched)
            _, metrics = train_step(state, params, batch, cfg, 4, sched)
            losses[impl] = float(metrics["loss"])
        assert np.isfinite(losses["pallas_interpret"])
        np.testing.assert_allclose(
            losses["pallas_interpret"], losses["xla"], rtol=1e-4
        )


class TestBlockedBackward:
    """Streamed flash backward == autodiff of the reference (never builds
    the T x T probability matrix; required for 16k packed-training buckets)."""

    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_reference_vjp(self, causal):
        from visionselector_tpu.kernels.attention import (
            _mha_backward_blocked,
            mha_reference,
        )

        rng = np.random.RandomState(0)
        b, s, h, d = 2, 32, 3, 8
        q = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
        seg = np.zeros(s, np.int32)
        seg[:10] = 1
        seg[10:27] = 2  # padding tail
        segj = jnp.asarray(seg)[None].repeat(b, 0)
        g = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)

        out, vjp = jax.vjp(
            lambda a, bb, c: mha_reference(a, bb, c, segj, segj, causal),
            q, k, v,
        )
        want = vjp(g)
        got = _mha_backward_blocked(
            q, k, v, segj, segj, causal, d**-0.5, out, g, block=8
        )
        for gg, ww in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(gg), np.asarray(ww), atol=3e-5
            )

    def test_fallback_unaligned(self):
        from visionselector_tpu.kernels.attention import (
            _mha_backward_blocked,
            mha_reference,
        )

        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(1, 14, 2, 4), jnp.float32)
        seg = jnp.ones((1, 14), jnp.int32)
        g = jnp.asarray(rng.randn(1, 14, 2, 4), jnp.float32)
        out, vjp = jax.vjp(
            lambda a, b, c: mha_reference(a, b, c, seg, seg, False), q, q, q
        )
        want = vjp(g)
        got = _mha_backward_blocked(
            q, q, q, seg, seg, False, 0.5, out, g, block=8
        )
        for gg, ww in zip(got, want):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(ww),
                                       atol=3e-5)


class TestAttentionWithReceived:
    def test_matches_explicit(self):
        """Streamed stats == explicit [H,S,S] softmax computation."""
        from visionselector_tpu.kernels.attention import (
            attention_with_received,
        )

        rng = np.random.RandomState(0)
        s, h, d = 48, 3, 8
        seg = np.zeros(s, np.int32)
        seg[:20] = 1
        seg[20:41] = 2  # ragged vs block 16; padding tail
        q = jnp.asarray(rng.randn(s, h, d), jnp.float32)
        k = jnp.asarray(rng.randn(s, h, d), jnp.float32)
        v = jnp.asarray(rng.randn(s, h, d), jnp.float32)

        logits = np.einsum("qhd,khd->hqk", q, k) * (d**-0.5)
        mask = (seg[:, None] == seg[None, :]) & (seg[None, :] > 0)
        logits = np.where(mask[None], logits, -1e30)
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        probs = np.where(mask[None], probs, 0.0)
        want_out = np.einsum("hqk,khd->qhd", probs, v)
        n_valid = (seg > 0).sum()
        want_recv = probs.mean(axis=0).sum(axis=0) / n_valid

        got_out, got_recv = attention_with_received(q, k, v, jnp.asarray(seg),
                                                    block=16)
        np.testing.assert_allclose(np.asarray(got_out), want_out, atol=3e-5)
        np.testing.assert_allclose(np.asarray(got_recv), want_recv, atol=3e-6)
        np.testing.assert_array_equal(np.asarray(got_out)[seg == 0], 0.0)


class TestStreamedFlash:
    """Large-sequence streamed kernel (scalar-prefetched, bounds-driven kv
    tiles; whole-kv VMEM overflows beyond ~14k patches)."""

    @pytest.mark.parametrize("causal", [False, True])
    def test_vs_reference(self, causal):
        from visionselector_tpu.kernels.attention import (
            _flash_pallas_streamed,
            segment_block_bounds,
        )

        seg = np.concatenate([
            np.repeat(np.arange(1, 6), 100), np.zeros(12, np.int32),
        ]).astype(np.int32)
        q, k, v, qs, ks = make_inputs(1, 512, 512, 4, 32, seg)
        want = mha_reference(q, k, v, qs, ks, causal=causal)
        bounds = jnp.asarray(segment_block_bounds(seg, 64, 64))
        got = _flash_pallas_streamed(
            q, k, v, qs, ks, causal, 32**-0.5, 64, 64, bounds,
            interpret=True, heads_per_program=2,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4
        )

    def test_kv_iters_limits_fetch(self):
        """With per-frame segments, kv_iters = max(hi-lo) tiles suffices."""
        from visionselector_tpu.kernels.attention import (
            _flash_pallas_streamed,
            segment_block_bounds,
        )

        # 4 'frames' of 64 tokens each — per-frame full-attn segments
        seg = np.repeat(np.arange(1, 5), 64).astype(np.int32)
        q, k, v, qs, ks = make_inputs(1, 256, 256, 2, 16, seg, seed=9)
        want = mha_reference(q, k, v, qs, ks)
        bounds = segment_block_bounds(seg, 64, 64)
        iters = int((bounds[:, 1] - bounds[:, 0]).max())
        assert iters == 1  # each q block needs exactly its own tile
        got = _flash_pallas_streamed(
            q, k, v, qs, ks, False, 16**-0.5, 64, 64, jnp.asarray(bounds),
            interpret=True, kv_iters=iters,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4
        )

    def test_public_api_dispatches_streaming_above_vmem_threshold(self):
        """attention() must route to the streamed kernel once double-buffered
        kv exceeds ~8 MB (whole-kv overflowed scoped VMEM at video scale)."""
        from visionselector_tpu.kernels.attention import attention

        rng = np.random.RandomState(2)
        s, h, d = 2048, 1, 512  # kv 2*s*d*2B = 4.2 MB -> x2 buffers > 8 MB
        seg = np.repeat(np.arange(1, 5), s // 4).astype(np.int32)
        q = jnp.asarray(rng.randn(1, s, h, d) * 0.1, jnp.float32)
        k = jnp.asarray(rng.randn(1, s, h, d) * 0.1, jnp.float32)
        v = jnp.asarray(rng.randn(1, s, h, d) * 0.1, jnp.float32)
        segj = jnp.asarray(seg)[None]
        got = attention(q, k, v, segj, segj, impl="pallas_interpret",
                        block_q=512, block_k=512)
        want = mha_reference(q, k, v, segj, segj)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-4
        )


class TestBlockedDecode:
    """Length-aware blocked decode attention (``impl="blocked"``): reads
    only each slot's live prefix of the [B, T_max] pool. Interpret-mode
    equality vs the dense XLA decode path, including the DMA-clamping
    index map (inactive tiles re-fetch the last live tile, fully masked)."""

    def _inputs(self, b=4, t_max=256, h_kv=2, n_rep=8, d=32, t_c=8, seed=0):
        rng = np.random.RandomState(seed)
        q = jnp.asarray(rng.randn(b, t_c, h_kv * n_rep, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, t_max, h_kv, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, t_max, h_kv, d), jnp.float32)
        return q, k, v

    @pytest.mark.parametrize("lens", [
        [0, 5, 100, 248],       # mixed, incl. empty cache
        [1, 1, 1, 1],           # all-minimal (single live tile each)
        [248, 248, 248, 248],   # near-full pool
        [64, 63, 65, 128],      # tile-boundary straddles
    ])
    def test_chunk_matches_xla(self, lens):
        from visionselector_tpu.kernels.attention import (
            chunk_decode_attention,
        )

        q, k, v = self._inputs()
        base = jnp.asarray(lens, jnp.int32)
        want = chunk_decode_attention(q, k, v, base, impl="xla")
        got = chunk_decode_attention(
            q, k, v, base, impl="blocked_interpret", block_k=64)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4)

    @pytest.mark.parametrize("lens", [[1, 5, 100, 256], [256, 1, 37, 200]])
    def test_single_step_matches_xla(self, lens):
        from visionselector_tpu.kernels.attention import decode_attention

        q, k, v = self._inputs()
        q1 = q[:, :1]
        cl = jnp.asarray(lens, jnp.int32)
        want = decode_attention(q1, k, v, cl, impl="xla")
        got = decode_attention(
            q1, k, v, cl, impl="blocked_interpret", block_k=64)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4)

    def test_mha_no_grouping(self):
        """n_rep == 1 (expanded / MHA caches) works unchanged."""
        from visionselector_tpu.kernels.attention import (
            chunk_decode_attention,
        )

        q, k, v = self._inputs(h_kv=4, n_rep=1, seed=3)
        base = jnp.asarray([7, 130, 0, 255], jnp.int32)
        want = chunk_decode_attention(q, k, v, base, impl="xla")
        got = chunk_decode_attention(
            q, k, v, base, impl="blocked_interpret", block_k=64)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4)

    def test_quantized_cache_matches_xla(self):
        """int8 caches: the kernel folds the per-row dequant scales into
        logits/probs exactly like the dense path."""
        from visionselector_tpu.kernels.attention import (
            chunk_decode_attention,
        )

        rng = np.random.RandomState(5)
        q, k, v = self._inputs(seed=5)
        k8 = jnp.clip(jnp.round(k * 10), -127, 127).astype(jnp.int8)
        v8 = jnp.clip(jnp.round(v * 10), -127, 127).astype(jnp.int8)
        ks = jnp.asarray(0.05 + rng.rand(*k.shape[:3]) * 0.1, jnp.float32)
        vs = jnp.asarray(0.05 + rng.rand(*v.shape[:3]) * 0.1, jnp.float32)
        base = jnp.asarray([10, 20, 30, 40], jnp.int32)
        want = chunk_decode_attention(
            q, k8, v8, base, k_scale=ks, v_scale=vs, impl="xla")
        got = chunk_decode_attention(
            q, k8, v8, base, k_scale=ks, v_scale=vs,
            impl="blocked_interpret", block_k=64)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4)

    def test_single_step_quantized_matches_xla(self):
        from visionselector_tpu.kernels.attention import decode_attention

        rng = np.random.RandomState(6)
        q, k, v = self._inputs(seed=6)
        q1 = q[:, :1]
        k8 = jnp.clip(jnp.round(k * 10), -127, 127).astype(jnp.int8)
        v8 = jnp.clip(jnp.round(v * 10), -127, 127).astype(jnp.int8)
        ks = jnp.asarray(0.05 + rng.rand(*k.shape[:3]) * 0.1, jnp.float32)
        vs = jnp.asarray(0.05 + rng.rand(*v.shape[:3]) * 0.1, jnp.float32)
        cl = jnp.asarray([1, 77, 130, 256], jnp.int32)
        want = decode_attention(
            q1, k8, v8, cl, k_scale=ks, v_scale=vs, impl="xla")
        got = decode_attention(
            q1, k8, v8, cl, k_scale=ks, v_scale=vs,
            impl="blocked_interpret", block_k=64)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4)

    def test_unaligned_t_max_falls_back(self):
        from visionselector_tpu.kernels.attention import (
            chunk_decode_attention,
        )

        q, k, v = self._inputs(t_max=200, seed=7)
        base = jnp.asarray([10, 20, 30, 199 - 8], jnp.int32)
        want = chunk_decode_attention(q, k, v, base, impl="xla")
        got = chunk_decode_attention(
            q, k, v, base, impl="blocked_interpret", block_k=64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))
