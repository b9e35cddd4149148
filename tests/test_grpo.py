"""GRPO training (train/grpo.py) — reference parity:
``llava-ov-15/src/trainer/grpo_trainer.py`` loss/advantage semantics and
``src/train/reward_funcs.py`` reward functions on our TPU stack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.models.qwen25vl.model import QwenVLEngine, init_params
from visionselector_tpu.preprocess.image import preprocess_image
from visionselector_tpu.preprocess.rope import expand_vision_tokens
from visionselector_tpu.train.data import build_train_sample, stack_samples
from visionselector_tpu.train.grpo import (
    GRPOScheduleConfig,
    accuracy_reward,
    build_grpo_batch,
    format_reward,
    group_advantages,
    grpo_train_step,
    init_grpo_state,
    per_token_logps,
    rollout_group,
)
from visionselector_tpu.train.loss import IGNORE_INDEX

CFG = qwen25vl_tiny()


def _img(seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(56, 56, 3) * 255).astype(np.uint8)


def _group_batch(completions, seed=0):
    return jax.tree.map(jnp.asarray, build_grpo_batch(
        CFG, _img(seed), [101, 102], [103], completions,
        budget=0.25, s_bucket=64, t_bucket=64,
        min_pixels=1, max_pixels=10**9))


class TestBuildGRPOSample:
    def test_single_image_matches_legacy_builder(self):
        """build_grpo_sample on a 1-image prompt == build_train_sample on
        the equivalent pre/post split (bit-identical pytree)."""
        from visionselector_tpu.train.grpo import build_grpo_sample

        kw = dict(budget=0.25, s_bucket=64, t_bucket=64,
                  min_pixels=1, max_pixels=10**9)
        comp = [201, 202, 203]
        got = build_grpo_sample(CFG, [_img()], [101, 102, 103], [2],
                                comp, **kw)
        want = build_train_sample(CFG, _img(), [101, 102], [103], comp, **kw)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    def test_multi_image_supervises_exact_completion(self):
        """Two-image record (data_qwen.py:233-242 parity): both grids ride
        one vision batch, placeholders splice at each slot, and the
        supervised region is EXACTLY the sampled completion tokens."""
        from visionselector_tpu.train.grpo import build_grpo_sample

        comp = [201, 202]
        s = build_grpo_sample(
            CFG, [_img(0), _img(1)], [101, 102, 103, 104], [1, 3], comp,
            budget=0.25, s_bucket=128, t_bucket=128,
            min_pixels=1, max_pixels=10**9)
        labels = np.asarray(s.labels)
        sup = np.asarray(s.input_ids)[labels != IGNORE_INDEX]
        assert list(sup) == comp
        # two images' merged tokens all present, split across two runs
        _, g0 = preprocess_image(_img(0), min_pixels=1, max_pixels=10**9)
        _, g1 = preprocess_image(_img(1), min_pixels=1, max_pixels=10**9)
        mu = CFG.vision.spatial_merge_size ** 2
        n = (int(np.prod(g0)) + int(np.prod(g1))) // mu
        assert int(s.num_merged) == n
        ids = np.asarray(s.input_ids)
        assert (ids == CFG.image_token_id).sum() == n
        assert (ids == CFG.vision_start_token_id).sum() == 2

    def test_rollout_prompt_matches_training_prompt(self):
        """The ids the rollout engine sees must be a prefix of the ids the
        train step scores (same expansion at every slot)."""
        from visionselector_tpu.preprocess.rope import (
            expand_vision_tokens_at_slots,
        )
        from visionselector_tpu.train.grpo import build_grpo_sample

        raw, slots = [101, 102, 103, 104], [1, 3]
        imgs = [_img(0), _img(1)]
        px = [preprocess_image(im, min_pixels=1, max_pixels=10**9)
              for im in imgs]
        grid = np.concatenate([g for _, g in px], axis=0)
        prompt = expand_vision_tokens_at_slots(
            raw, slots, grid,
            spatial_merge_size=CFG.vision.spatial_merge_size,
            image_token_id=CFG.image_token_id,
            vision_start_token_id=CFG.vision_start_token_id,
            vision_end_token_id=CFG.vision_end_token_id)
        s = build_grpo_sample(
            CFG, imgs, raw, slots, [201], budget=0.25, s_bucket=128,
            t_bucket=128, min_pixels=1, max_pixels=10**9)
        np.testing.assert_array_equal(
            np.asarray(s.input_ids)[: len(prompt)], prompt)


class TestGroupAdvantages:
    def test_hand_math(self):
        # group [1, 0]: mean 0.5, unbiased std ~0.7071
        adv = group_advantages(np.array([1.0, 0.0]), 2, scale_rewards=True)
        np.testing.assert_allclose(
            adv, [0.5 / (np.sqrt(0.5) + 1e-4),
                  -0.5 / (np.sqrt(0.5) + 1e-4)], rtol=1e-6)

    def test_unscaled_and_groups(self):
        adv = group_advantages(np.array([3.0, 1.0, 10.0, 10.0]), 2,
                               scale_rewards=False)
        np.testing.assert_allclose(adv, [1.0, -1.0, 0.0, 0.0], atol=1e-7)

    def test_constant_group_stays_finite(self):
        adv = group_advantages(np.array([2.0, 2.0, 2.0]), 3)
        np.testing.assert_allclose(adv, [0.0, 0.0, 0.0], atol=1e-7)

    def test_single_generation_rejected(self):
        with pytest.raises(ValueError, match="num_generations"):
            group_advantages(np.array([1.0, 0.0]), 1)


class TestRewards:
    def test_accuracy_exact_and_tags(self):
        r = accuracy_reward(
            ["<answer> 42 </answer>", "nope", "42.0"],
            ["42", "<answer>yes</answer>", "42"])
        assert r == [1.0, 0.0, 1.0]  # tag extraction, mismatch, numeric

    def test_format(self):
        good = "<think>hm</think> <answer>x</answer>"
        assert format_reward([good, "<answer>x</answer>", "x " + good]) == \
            [1.0, 0.0, 0.0]  # anchored at start (re.match semantics)


class TestPerTokenLogps:
    def test_temperature_scales_scoring_distribution(self):
        """temperature divides the logits before the log-softmax (trl
        ``_get_per_token_logps`` parity): at T != 1 the scored logps must
        match softmax(logits / T), not softmax(logits)."""
        params = init_params(jax.random.PRNGKey(0), CFG)
        batch = _group_batch([[201, 202, 203]])
        sample = jax.tree.map(lambda x: x[0], batch)
        from visionselector_tpu.train.sft import forward_logits

        pt2, mask = per_token_logps(params, sample, CFG, temperature=2.0)
        logits = np.asarray(
            forward_logits(params, sample, CFG), np.float32)[:-1] / 2.0
        labels = np.asarray(sample.labels)[1:]
        valid = labels != -100
        logz = np.log(np.exp(logits - logits.max(-1, keepdims=True))
                      .sum(-1)) + logits.max(-1)
        gold = np.take_along_axis(
            logits, np.where(valid, labels, 0)[:, None], axis=-1)[:, 0]
        np.testing.assert_allclose(
            np.asarray(pt2)[valid], (gold - logz)[valid], rtol=2e-4)
        pt1, _ = per_token_logps(params, sample, CFG, temperature=1.0)
        assert not np.allclose(np.asarray(pt1)[valid],
                               np.asarray(pt2)[valid])

    def test_matches_sequence_sum(self):
        from visionselector_tpu.train.dpo import sequence_logps

        params = init_params(jax.random.PRNGKey(0), CFG)
        batch = _group_batch([[201, 202, 203]])
        sample = jax.tree.map(lambda x: x[0], batch)
        pt, mask = per_token_logps(params, sample, CFG)
        lp, n, _ = sequence_logps(params, sample, CFG)
        assert int(mask.sum()) == int(n)
        np.testing.assert_allclose(float(pt.sum()), float(lp), rtol=1e-6)
        # zero outside the completion
        labels = np.asarray(sample.labels)[1:]
        assert float(np.abs(np.asarray(pt)[labels == IGNORE_INDEX]).sum()) \
            == 0.0


class TestGRPOStep:
    def test_first_step_invariants_and_learning(self):
        """Step 1 (policy == ref): loss == -mean(A) == 0 for centered
        advantages, kl == 0, clip_ratio == 0. Training then pushes the
        advantaged completion's logp above the disadvantaged one's."""
        params = init_params(jax.random.PRNGKey(0), CFG)
        sched = GRPOScheduleConfig(total_steps=8, lr=5e-4, beta=0.04,
                                   num_generations=2)
        state = init_grpo_state(params, sched)
        batch = _group_batch([[201, 202, 203], [301, 302]])
        adv = jnp.asarray(group_advantages(np.array([1.0, 0.0]), 2))

        def gap(p):
            pt, _ = jax.vmap(
                lambda s: per_token_logps(p, s, CFG))(batch)
            sums = np.asarray(pt.sum(-1))
            return sums[0] - sums[1]

        g0 = gap(state.params)
        state, m = grpo_train_step(state, params, batch, adv, CFG, sched)
        np.testing.assert_allclose(float(m["loss"]), 0.0, atol=1e-5)
        np.testing.assert_allclose(float(m["kl"]), 0.0, atol=1e-6)
        assert float(m["clip_ratio"]) == 0.0
        for _ in range(3):
            state, m = grpo_train_step(state, params, batch, adv, CFG, sched)
            assert np.isfinite(float(m["loss"]))
        assert gap(state.params) > g0 + 0.05

    def test_loss_types_reduce_differently(self):
        params = init_params(jax.random.PRNGKey(0), CFG)
        batch = _group_batch([[201, 202, 203], [301, 302]])
        adv = jnp.asarray([0.7, -0.7], jnp.float32)
        outs = {}
        for lt in ("grpo", "bnpo", "dr_grpo"):
            sched = GRPOScheduleConfig(total_steps=4, lr=1e-3, beta=0.04,
                                       loss_type=lt, num_generations=2)
            state = init_grpo_state(params, sched)
            state, _ = grpo_train_step(state, params, batch, adv, CFG, sched)
            state, m = grpo_train_step(state, params, batch, adv, CFG, sched)
            outs[lt] = float(m["loss"])
            assert np.isfinite(outs[lt])
        # after one real update the three reductions disagree
        assert len({round(v, 8) for v in outs.values()}) == 3

    def test_accum_equals_concatenated(self):
        """A=2 micro-batches accumulated == one 'grpo'-reduction step on
        the concatenated batch (same updated params)."""
        from visionselector_tpu.train.grpo import grpo_train_step_accum

        params = init_params(jax.random.PRNGKey(0), CFG)
        sched = GRPOScheduleConfig(total_steps=4, lr=1e-3, beta=0.04,
                                   num_generations=2)
        b0 = _group_batch([[201, 202, 203], [301, 302]], seed=0)
        b1 = _group_batch([[205], [306, 307]], seed=1)
        a0 = jnp.asarray([0.7, -0.7], jnp.float32)
        a1 = jnp.asarray([-0.7, 0.7], jnp.float32)
        s_cat = init_grpo_state(params, sched)
        s_cat, m_cat = grpo_train_step(
            s_cat, params,
            jax.tree.map(lambda x, y: jnp.concatenate([x, y]), b0, b1),
            jnp.concatenate([a0, a1]), CFG, sched)
        s_acc = init_grpo_state(params, sched)
        s_acc, m_acc = grpo_train_step_accum(
            s_acc, params,
            jax.tree.map(lambda x, y: jnp.stack([x, y]), b0, b1),
            jnp.stack([a0, a1]), CFG, sched)
        np.testing.assert_allclose(
            float(m_cat["loss"]), float(m_acc["loss"]), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(s_cat.params),
                        jax.tree.leaves(s_acc.params)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       atol=2e-5)

    def test_accum_rejects_global_token_reductions(self):
        from visionselector_tpu.train.grpo import grpo_train_step_accum

        params = init_params(jax.random.PRNGKey(0), CFG)
        sched = GRPOScheduleConfig(total_steps=4, loss_type="bnpo")
        state = init_grpo_state(params, sched)
        batch = jax.tree.map(lambda x: x[None], _group_batch([[201], [301]]))
        with pytest.raises(ValueError, match="bnpo"):
            grpo_train_step_accum(state, params, batch,
                                  jnp.asarray([[1.0, -1.0]]), CFG, sched)

    def test_beta_zero_skips_kl(self):
        params = init_params(jax.random.PRNGKey(0), CFG)
        sched = GRPOScheduleConfig(total_steps=4, lr=0.0, beta=0.0)
        state = init_grpo_state(params, sched)
        batch = _group_batch([[201], [301]])
        _, m = grpo_train_step(state, params, batch,
                               jnp.asarray([1.0, -1.0]), CFG, sched)
        assert "kl" not in m


class TestGRPOCLI:
    def test_grpo_cli_smoke(self, tmp_path, capsys):
        import json
        import os

        from visionselector_tpu.api.train import main

        out = str(tmp_path / "grpo")
        rc = main([
            "--output-dir", out, "--smoke", "--method", "grpo",
            "--total-steps", "2", "--batch-size", "2",
            "--num-generations", "2", "--max-completion-length", "4",
            "--save-steps", "2", "--log-steps", "1", "--lr", "1e-4",
        ])
        assert rc == 0
        lines = [l for l in capsys.readouterr().out.splitlines()
                 if l.startswith("{")]
        last = json.loads(lines[-1])
        assert np.isfinite(last["loss"])
        assert {"kl", "clip_ratio", "mean_reward"} <= set(last)
        assert os.path.exists(os.path.join(out, "checkpoint-2"))

    def test_grpo_cli_ov_family(self, tmp_path, capsys):
        """OV-family GRPO end to end (reference entry's own family):
        OVEngine rollouts -> OV sample builder -> dispatched step."""
        import json
        import os

        from visionselector_tpu.api.train import main

        out = str(tmp_path / "grpo_ov")
        rc = main([
            "--output-dir", out, "--smoke", "--method", "grpo",
            "--family", "llava_ov15", "--total-steps", "1",
            "--batch-size", "2", "--num-generations", "2",
            "--max-completion-length", "4", "--save-steps", "1",
            "--log-steps", "1", "--lr", "1e-4",
        ])
        assert rc == 0
        lines = [l for l in capsys.readouterr().out.splitlines()
                 if l.startswith("{")]
        assert np.isfinite(json.loads(lines[-1])["loss"])
        assert os.path.exists(os.path.join(out, "checkpoint-1"))


class TestRollout:
    def test_engine_rollout_and_batch(self):
        params = init_params(jax.random.PRNGKey(0), CFG)
        pixels, grid = preprocess_image(_img(), min_pixels=1,
                                        max_pixels=10**9)
        ids = expand_vision_tokens([101, 102], [103], grid)
        eng = QwenVLEngine(CFG, params, use_selector=False)
        sched = GRPOScheduleConfig(num_generations=3, temperature=1.0,
                                   max_completion_length=6)
        comps = rollout_group(eng, ids, pixels, grid, sched, seed=7)
        assert len(comps) == 3
        assert all(1 <= len(c) <= 6 for c in comps)
        # temperature sampling with distinct seeds: not all identical
        assert len({tuple(c.tolist()) for c in comps}) > 1
        batch = _group_batch([c.tolist() for c in comps])
        assert batch.input_ids.shape[0] == 3
