"""Dynamic-Qwen predictor + strategy tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionselector_tpu.selector.baselines.dynamic import (
    DynamicSelect,
    gumbel_keep_mask,
    init_predictor_params,
    predictor_forward,
    tau_schedule,
)


class TestPredictor:
    def test_forward_shape(self):
        params = init_predictor_params(jax.random.PRNGKey(0), input_dim=64,
                                       d_model=32, num_heads=4)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 10, 64), jnp.float32)
        out = predictor_forward(params, x, num_heads=4)
        assert out.shape == (1, 10, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_policy_masks_global_mean(self):
        """Policy-zeroed tokens must not affect other tokens' predictions."""
        params = init_predictor_params(jax.random.PRNGKey(1), input_dim=16,
                                       d_model=16, num_heads=2)
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 6, 16), jnp.float32)
        pol_all = jnp.ones((1, 6, 1))
        out_all = predictor_forward(params, x, pol_all, num_heads=2)
        # change a masked-out token: prediction of others changes (policy only
        # gates the transformer INPUT and the global mean, attention still
        # runs over all rows — reference semantics, dynamic_block.py:369-372)
        assert out_all.shape == (1, 6, 2)


class TestGumbel:
    def test_tau_schedule(self):
        assert float(tau_schedule(0, 100)) == pytest.approx(1.0)
        assert float(tau_schedule(100, 100)) == pytest.approx(0.1)
        mid = float(tau_schedule(50, 100))
        assert 0.1 < mid < 1.0

    def test_mask_binary_and_differentiable(self):
        logits = jnp.asarray(np.random.RandomState(3).randn(5, 2), jnp.float32)
        mask = gumbel_keep_mask(jax.random.PRNGKey(0), logits, 0.5)
        vals = np.asarray(mask)
        assert set(np.round(vals, 6)).issubset({0.0, 1.0})
        g = jax.grad(
            lambda l: gumbel_keep_mask(jax.random.PRNGKey(0), l, 0.5).sum()
        )(logits)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


class TestStrategy:
    def test_select_count_and_membership(self):
        rng = np.random.RandomState(0)
        hidden = rng.randn(30, 24).astype(np.float32)
        image_pos = np.arange(5, 25)
        d = DynamicSelect()
        out = d.select(None, None, hidden, image_pos, 0.3)
        assert len(out) == 6
        assert set(out).issubset(set(image_pos.tolist()))

    def test_engine_e2e(self):
        from visionselector_tpu.core.config import qwen25vl_tiny
        from visionselector_tpu.models.qwen25vl.model import (
            QwenVLEngine,
            init_params,
        )
        from visionselector_tpu.preprocess.image import preprocess_image
        from visionselector_tpu.preprocess.rope import expand_vision_tokens

        cfg = qwen25vl_tiny()
        params = init_params(jax.random.PRNGKey(0), cfg)
        img = (np.random.RandomState(5).rand(84, 84, 3) * 255).astype(np.uint8)
        pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        ids = expand_vision_tokens([100, 200], [300], grid)
        eng = QwenVLEngine(cfg, params, budget=0.3, strategy=DynamicSelect())
        res = eng.generate(ids, pixels, grid, max_new_tokens=2)
        n = res.num_vision_tokens
        assert len(res.selected_indices) == max(1, int(n * 0.3))
        assert len(res.tokens) >= 1
