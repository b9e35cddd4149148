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


from visionselector_tpu.core.config import qwen25vl_tiny

CFG = qwen25vl_tiny()


@pytest.fixture(scope="module")
def params():
    from visionselector_tpu.models.qwen25vl.model import init_params

    return init_params(jax.random.PRNGKey(0), CFG)


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


class TestDynamicTraining:
    def test_train_cli_smoke(self, tmp_path, capsys):
        """--method dynamic CLI: runs, tau decays exponentially, predictor
        exported (``train_qwen_dynamic.py:57-92`` parity)."""
        import json as _json
        import os

        import numpy as np

        from visionselector_tpu.api.train import main

        out = str(tmp_path / "dyn")
        rc = main([
            "--output-dir", out, "--smoke", "--method", "dynamic",
            "--total-steps", "4", "--batch-size", "2", "--save-steps", "4",
            "--log-steps", "1", "--budget", "0.25",
        ])
        assert rc == 0
        lines = [l for l in capsys.readouterr().out.splitlines()
                 if l.startswith("{")]
        ms = [_json.loads(l) for l in lines]
        assert all(np.isfinite(m["loss"]) for m in ms)
        taus = [m["tau"] for m in ms]
        assert taus[0] > taus[-1] > 0  # exponential decay
        assert os.path.exists(
            os.path.join(out, "image_score_predictor.safetensors")
        )

    def test_keep_ratio_converges_to_budget(self, params):
        """The keep-ratio MSE (``dynamic_model.py:760-766``) drives the
        predictor's expected keep probability toward the budget."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from visionselector_tpu.selector.baselines.dynamic import (
            init_predictor_params,
            predictor_forward,
        )
        from visionselector_tpu.train.data import (
            build_train_sample,
            stack_samples,
        )
        from visionselector_tpu.train.dynamic_train import (
            DynamicScheduleConfig,
            dynamic_train_step,
            init_dynamic_train_state,
        )

        cfg = CFG
        budget = 0.2
        rng = np.random.RandomState(0)
        samples = []
        for _ in range(2):
            img = (rng.rand(112, 112, 3) * 255).astype(np.uint8)  # 16 merged
            samples.append(build_train_sample(
                cfg, img, [101, 102], [103], [201, 202, 203],
                budget=budget, s_bucket=128, t_bucket=128,
                min_pixels=1, max_pixels=10**9,
            ))
        batch = jax.tree.map(jnp.asarray, stack_samples(samples))

        sched = DynamicScheduleConfig(
            total_steps=30, lr=3e-3, budget=budget, mask_loss_weight=100.0,
        )
        predictor = init_predictor_params(
            jax.random.PRNGKey(0), cfg.text.hidden_size, d_model=32,
            num_heads=4,
        )

        def keep_prob(pp):
            # expected keep probability over one sample's image tokens
            from visionselector_tpu.models.qwen25vl import lm as lm_mod
            from visionselector_tpu.models.qwen25vl import vit as vit_mod

            s0 = jax.tree.map(lambda a: a[0], batch)
            ve = vit_mod.vit_forward(
                params["visual"], s0.pixel_values, s0.rot_pos_ids,
                s0.window_seg_ids, s0.full_seg_ids, s0.reverse_index,
                cfg.vision,
            )
            te = lm_mod.embed_tokens(params["lm"], s0.input_ids)
            t_pad, d = te.shape
            full = jnp.zeros((t_pad + 1, d), te.dtype).at[:t_pad].set(te)
            full = full.at[s0.image_positions].set(ve.astype(te.dtype))
            pre = jax.tree.map(lambda a: a[:2], params["lm"]["layers"])
            hidden, _ = lm_mod.lm_prefill_layers(
                pre, full[:t_pad][None], s0.position_ids[:, None, :],
                s0.seg_ids[None], cfg.text,
            )
            h_pad = jnp.concatenate([hidden[0], jnp.zeros((1, d), hidden.dtype)])
            x = h_pad[jnp.minimum(s0.image_positions, t_pad)]
            ok = jnp.arange(x.shape[0]) < s0.num_merged
            logits = predictor_forward(
                pp, x.astype(jnp.float32)[None],
                policy=ok.astype(jnp.float32)[None, :, None], num_heads=4,
            )[0]
            probs = jax.nn.softmax(logits, -1)[:, 0]
            return float((probs * ok).sum() / ok.sum())

        p0 = keep_prob(predictor)
        state = init_dynamic_train_state(predictor, sched, seed=0)
        for _ in range(30):
            state, metrics = dynamic_train_step(
                state, params, batch, cfg, sched
            )
        p1 = keep_prob(state.predictor_params)
        # random init starts near 0.5; training pulls toward budget 0.2
        assert abs(p0 - 0.5) < 0.2, p0
        assert abs(p1 - budget) < abs(p0 - budget), (p0, p1)
        assert p1 < 0.4, p1
