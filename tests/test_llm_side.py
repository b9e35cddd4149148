"""FastV / DART two-stage prefill tests."""

import jax
import numpy as np
import pytest

from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.models.qwen25vl.model import QwenVLEngine, init_params
from visionselector_tpu.preprocess.image import preprocess_image
from visionselector_tpu.preprocess.rope import expand_vision_tokens
from visionselector_tpu.selector.baselines import get_baseline
from visionselector_tpu.selector.baselines.llm_side import DART, FastV

CFG = qwen25vl_tiny()


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(0), CFG)
    img = (np.random.RandomState(5).rand(84, 84, 3) * 255).astype(np.uint8)
    pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
    ids = expand_vision_tokens([100, 200], [300, 301, 302], grid)
    return params, pixels, grid, ids


class TestFastVSelect:
    def test_keeps_top_scored_image_positions(self):
        fv = FastV()
        scores = np.zeros(20)
        image_pos = np.arange(5, 15)
        scores[7] = 0.9
        scores[12] = 0.8
        scores[5] = 0.7
        retained = fv.select(scores, None, None, image_pos, 0.3)
        assert set(retained) == {7, 12, 5}


class TestDARTSelect:
    def test_count_and_image_only(self):
        rng = np.random.RandomState(0)
        t = 30
        image_pos = np.arange(3, 23)  # 20 image tokens
        key_l1 = rng.rand(t)
        hidden = rng.randn(t, 8)
        d = DART()
        retained = d.select(None, key_l1, hidden, image_pos, 0.4)
        assert set(retained).issubset(set(image_pos.tolist()))
        # pivots (<=4 image) + ~topk per pivot; at least the image pivots stay
        assert len(retained) >= 4


class TestEngineE2E:
    @pytest.mark.parametrize("method", ["fastv", "dart"])
    def test_generate(self, setup, method):
        params, pixels, grid, ids = setup
        eng = QwenVLEngine(
            CFG, params, budget=0.3, strategy=get_baseline(method)
        )
        res = eng.generate(ids, pixels, grid, max_new_tokens=3)
        n = res.num_vision_tokens
        assert res.selected_indices is not None
        assert 1 <= len(res.selected_indices) <= n
        assert res.selected_indices.max() < n
        num_text = len(ids) - n
        assert res.prefill_len == num_text + len(res.selected_indices)
        assert len(res.tokens) >= 1

    def test_fastv_full_budget_matches_uncompressed(self, setup):
        """budget=1.0 keeps every image token -> logits path must equal the
        plain uncompressed engine's first token."""
        params, pixels, grid, ids = setup
        eng_fv = QwenVLEngine(CFG, params, budget=1.0, strategy=FastV())
        eng_plain = QwenVLEngine(CFG, params, use_selector=False)
        r1 = eng_fv.generate(ids, pixels, grid, max_new_tokens=2)
        r2 = eng_plain.generate(ids, pixels, grid, max_new_tokens=2)
        assert len(r1.selected_indices) == r1.num_vision_tokens
        assert r1.tokens == r2.tokens


class TestStreamedFastVCapture:
    def test_blocked_colsum_matches_naive(self):
        """The query-blocked FastV column-sum must equal the materialized
        T x T softmax exactly (same math, streamed)."""
        import jax.numpy as jnp

        from visionselector_tpu.models.qwen25vl.model import (
            _fastv_attention_colsum,
        )

        rng = np.random.RandomState(0)
        t, h, d = 100, 3, 8  # t NOT a multiple of the block size
        q = rng.randn(t, h, d).astype(np.float32)
        k = rng.randn(t, h, d).astype(np.float32)
        seg = np.ones(t, np.int32)
        seg[90:] = 0  # padding tail
        scale = d**-0.5

        got = np.asarray(_fastv_attention_colsum(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(seg), scale, block=32
        ))

        logits = np.einsum("qhd,khd->hqk", q, k) * scale
        qi = np.arange(t)
        mask = (qi[:, None] >= qi[None, :]) & (seg > 0)[None, :] \
            & (seg > 0)[:, None]
        logits = np.where(mask[None], logits, -1e30)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = np.where(mask[None], e / e.sum(-1, keepdims=True), 0.0)
        nq = max((seg > 0).sum(), 1)
        want = probs.mean(axis=0).sum(axis=0) / nq

        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
