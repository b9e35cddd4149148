"""DPO training (train/dpo.py) — reference parity:
``llava-ov-15/src/trainer/dpo_trainer.py`` loss semantics on our TPU stack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.models.qwen25vl.model import init_params
from visionselector_tpu.train.data import build_train_sample, stack_samples
from visionselector_tpu.train.dpo import (
    DPOScheduleConfig,
    build_dpo_pair_from_record,
    dpo_losses,
    dpo_train_step,
    init_dpo_state,
    sequence_logps,
)
from visionselector_tpu.train.loss import IGNORE_INDEX

CFG = qwen25vl_tiny()


class StubTokenizer:
    def encode(self, text):
        return [ord(c) % 500 + 10 for c in text]


def _img(seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(56, 56, 3) * 255).astype(np.uint8)


def _pair_batch(seed=0, answer_c=(201, 202, 203), answer_r=(301, 302)):
    kw = dict(budget=0.25, s_bucket=64, t_bucket=64,
              min_pixels=1, max_pixels=10**9)
    chosen = build_train_sample(CFG, _img(seed), [101, 102], [103],
                                list(answer_c), **kw)
    rejected = build_train_sample(CFG, _img(seed), [101, 102], [103],
                                  list(answer_r), **kw)
    return (jax.tree.map(jnp.asarray, stack_samples([chosen])),
            jax.tree.map(jnp.asarray, stack_samples([rejected])))


class TestDPOLossMath:
    def test_policy_equals_ref_gives_log2(self):
        """With policy == reference the sigmoid DPO loss is exactly log 2
        and every reward is zero."""
        lp = jnp.asarray([-5.0, -2.0])
        lr = jnp.asarray([-6.0, -1.0])
        sched = DPOScheduleConfig(beta=0.1)
        loss, metrics = dpo_losses(lp, lr, lp, lr,
                                   jnp.asarray([3, 3]), jnp.asarray([2, 2]),
                                   sched)
        np.testing.assert_allclose(float(loss), float(np.log(2)), rtol=1e-6)
        assert float(metrics["reward_margin"]) == 0.0

    def test_margin_lowers_loss(self):
        sched = DPOScheduleConfig(beta=0.1)
        ref_c = jnp.asarray([-5.0]); ref_r = jnp.asarray([-5.0])
        lens = jnp.asarray([3])
        better, _ = dpo_losses(ref_c + 1.0, ref_r - 1.0, ref_c, ref_r,
                               lens, lens, sched)
        worse, _ = dpo_losses(ref_c - 1.0, ref_r + 1.0, ref_c, ref_r,
                              lens, lens, sched)
        assert float(better) < float(np.log(2)) < float(worse)

    def test_ipo_length_normalizes(self):
        sched = DPOScheduleConfig(beta=0.1, loss_type="ipo")
        # same per-token logps, different lengths -> identical ipo loss
        l1, _ = dpo_losses(jnp.asarray([-3.0]), jnp.asarray([-6.0]),
                           jnp.asarray([-3.0]), jnp.asarray([-6.0]),
                           jnp.asarray([3]), jnp.asarray([3]), sched)
        l2, _ = dpo_losses(jnp.asarray([-6.0]), jnp.asarray([-12.0]),
                           jnp.asarray([-6.0]), jnp.asarray([-12.0]),
                           jnp.asarray([6]), jnp.asarray([6]), sched)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


class TestSequenceLogps:
    def test_masks_prompt_positions(self):
        """sequence_logps counts exactly the supervised positions and its CE
        matches the SFT CE on the same sample."""
        params = init_params(jax.random.PRNGKey(0), CFG)
        chosen, _ = _pair_batch()
        sample = jax.tree.map(lambda x: x[0], chosen)
        lp, n, ce = sequence_logps(params, sample, CFG)
        n_supervised = int(
            (np.asarray(sample.labels)[1:] != IGNORE_INDEX).sum())
        assert int(n) == n_supervised
        np.testing.assert_allclose(float(lp), -float(ce) * int(n), rtol=1e-5)


class TestDPOStep:
    def test_margin_increases_and_ref_frozen(self):
        params = init_params(jax.random.PRNGKey(0), CFG)
        ref_params = params
        sched = DPOScheduleConfig(total_steps=8, lr=5e-4, beta=0.1)
        state = init_dpo_state(params, sched)
        chosen, rejected = _pair_batch()
        margins = []
        for _ in range(4):
            state, metrics = dpo_train_step(
                state, ref_params, chosen, rejected, CFG, sched)
            margins.append(float(metrics["reward_margin"]))
            assert np.isfinite(float(metrics["loss"]))
        # first step: policy == ref -> margin 0; training then pushes the
        # chosen completion above the rejected one
        np.testing.assert_allclose(margins[0], 0.0, atol=1e-5)
        assert margins[-1] > 0.05, margins

    def test_freeze_policy_scorer_never_trains(self):
        params = init_params(jax.random.PRNGKey(0), CFG)
        sched = DPOScheduleConfig(total_steps=4, lr=1e-3)
        state = init_dpo_state(params, sched)
        chosen, rejected = _pair_batch()
        before = jax.tree.map(np.asarray, state.params)
        # two steps: warmup LR is 0 on the very first step
        state, _ = dpo_train_step(state, params, chosen, rejected, CFG, sched)
        state, _ = dpo_train_step(state, params, chosen, rejected, CFG, sched)
        after = state.params
        # scorer + visual frozen under default flags; lm moves
        for key in ("scorer", "visual"):
            for a, b in zip(jax.tree.leaves(before[key]),
                            jax.tree.leaves(after[key])):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        moved = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(before["lm"]),
                            jax.tree.leaves(after["lm"]))
        )
        assert moved

    def test_rpo_alpha_adds_nll(self):
        params = init_params(jax.random.PRNGKey(0), CFG)
        chosen, rejected = _pair_batch()
        base = DPOScheduleConfig(total_steps=4, lr=0.0)
        rpo = DPOScheduleConfig(total_steps=4, lr=0.0, rpo_alpha=1.0)
        s0 = init_dpo_state(params, base)
        _, m0 = dpo_train_step(s0, params, chosen, rejected, CFG, base)
        s1 = init_dpo_state(params, rpo)
        _, m1 = dpo_train_step(s1, params, chosen, rejected, CFG, rpo)
        np.testing.assert_allclose(
            float(m1["loss"]), float(m0["loss"]) + float(m1["nll_chosen"]),
            rtol=1e-5)


class TestDPOLoRA:
    def test_lora_trains_only_adapters(self):
        """--lora-rank path: base LM weights stay frozen, only the LoRA
        adapters (and nothing in visual/scorer) move."""
        from visionselector_tpu.train.lora import add_lora_params

        base = init_params(jax.random.PRNGKey(0), CFG)
        params = dict(base)
        params["lm"] = add_lora_params(
            params["lm"], jax.random.PRNGKey(1), rank=2, alpha=16,
            dtype=jnp.float32)
        sched = DPOScheduleConfig(total_steps=4, lr=1e-3, lora_rank=2)
        state = init_dpo_state(params, sched)
        chosen, rejected = _pair_batch()
        before = jax.tree.map(lambda x: np.array(jax.device_get(x)),
                              state.params)
        for _ in range(2):  # step 1 has warmup LR 0
            state, _ = dpo_train_step(state, base, chosen, rejected, CFG,
                                      sched)
        after = jax.tree.map(lambda x: np.array(jax.device_get(x)),
                             state.params)
        before_leaves = jax.tree_util.tree_flatten_with_path(before["lm"])[0]
        after_leaves = jax.tree_util.tree_flatten_with_path(after["lm"])[0]
        moved_lora = False
        for (path, b), (_, a) in zip(before_leaves, after_leaves):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            same = np.array_equal(b, a)
            if "_lora_a" in name or "_lora_b" in name:
                moved_lora = moved_lora or not same
            elif "_lora_scale" not in name:
                assert same, f"base weight {name} moved under LoRA"
        assert moved_lora


class TestDPOAccum:
    def test_accum_equals_concatenated(self):
        """A=2 micro-pairs accumulated == one step on the concatenated
        2-pair batch (same updated params)."""
        from visionselector_tpu.train.dpo import dpo_train_step_accum

        params = init_params(jax.random.PRNGKey(0), CFG)
        sched = DPOScheduleConfig(total_steps=4, lr=1e-3, beta=0.1)
        c0, r0 = _pair_batch(seed=0)
        c1, r1 = _pair_batch(seed=1, answer_c=(211, 212), answer_r=(311,))
        cat = lambda a, b: jax.tree.map(
            lambda x, y: jnp.concatenate([x, y]), a, b)
        s_cat = init_dpo_state(params, sched)
        s_cat, m_cat = dpo_train_step(
            s_cat, params, cat(c0, c1), cat(r0, r1), CFG, sched)
        stk = lambda a, b: jax.tree.map(lambda x, y: jnp.stack([x, y]), a, b)
        s_acc = init_dpo_state(params, sched)
        s_acc, m_acc = dpo_train_step_accum(
            s_acc, params, stk(c0, c1), stk(r0, r1), CFG, sched)
        np.testing.assert_allclose(
            float(m_cat["loss"]), float(m_acc["loss"]), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(s_cat.params),
                        jax.tree.leaves(s_acc.params)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       atol=2e-5)


class TestOVFamilyDPO:
    def test_ov_dpo_step_learns_margin(self):
        """OV-family DPO (the reference entry's own family,
        ``llava-ov-15/src/train/train_dpo.py``): the sample-type dispatch
        routes through the RICE/uncompressed OV forward and the margin
        still learns."""
        from visionselector_tpu.core.config import llava_ov_tiny
        from visionselector_tpu.models.llava_ov15.model import init_ov_params
        from visionselector_tpu.train.ov_loss import build_ov_train_sample

        cfg = llava_ov_tiny()
        params = init_ov_params(jax.random.PRNGKey(0), cfg)
        kw = dict(budget=0.25, s_bucket=64, t_bucket=64,
                  min_pixels=1, max_pixels=10**9)
        chosen = jax.tree.map(jnp.asarray, stack_samples([
            build_ov_train_sample(cfg, _img(), [101, 102], [103],
                                  [201, 202, 203], **kw)]))
        rejected = jax.tree.map(jnp.asarray, stack_samples([
            build_ov_train_sample(cfg, _img(), [101, 102], [103],
                                  [301, 302], **kw)]))
        sched = DPOScheduleConfig(total_steps=8, lr=5e-4, beta=0.1)
        state = init_dpo_state(params, sched)
        margins = []
        for _ in range(3):
            state, metrics = dpo_train_step(
                state, params, chosen, rejected, cfg, sched)
            margins.append(float(metrics["reward_margin"]))
        np.testing.assert_allclose(margins[0], 0.0, atol=1e-5)
        assert margins[-1] > 0.02, margins


class TestDPOCLI:
    def test_dpo_cli_smoke(self, tmp_path, capsys):
        import json
        import os

        from visionselector_tpu.api.train import main

        out = str(tmp_path / "dpo")
        rc = main([
            "--output-dir", out, "--smoke", "--method", "dpo",
            "--total-steps", "2", "--batch-size", "2", "--save-steps", "2",
            "--log-steps", "1", "--lr", "1e-4",
        ])
        assert rc == 0
        lines = [l for l in capsys.readouterr().out.splitlines()
                 if l.startswith("{")]
        last = json.loads(lines[-1])
        assert np.isfinite(last["loss"])
        assert "reward_margin" in last
        # step 1: policy == reference -> exactly log 2
        np.testing.assert_allclose(json.loads(lines[0])["loss"],
                                   float(np.log(2)), rtol=1e-5)
        assert os.path.exists(os.path.join(out, "checkpoint-2"))


class TestDPORecordBuilder:
    def test_pair_shares_prompt_differs_completion(self, tmp_path):
        img_file = tmp_path / "i.png"
        Image.fromarray(_img()).save(img_file)
        record = {"image": "i.png", "prompt": "pick the better caption",
                  "chosen": "a good one", "rejected": "bad"}
        c, r = build_dpo_pair_from_record(
            CFG, record, StubTokenizer(), budget=0.25, s_bucket=64,
            t_bucket=256, image_root=str(tmp_path),
            min_pixels=1, max_pixels=10**9)
        lc = np.asarray(c.labels); lr = np.asarray(r.labels)
        # identical prompt region: ids equal up to the first supervised pos
        first = min(np.where(lc != IGNORE_INDEX)[0][0],
                    np.where(lr != IGNORE_INDEX)[0][0])
        np.testing.assert_array_equal(np.asarray(c.input_ids)[:first],
                                      np.asarray(r.input_ids)[:first])
        assert (lc != IGNORE_INDEX).sum() != (lr != IGNORE_INDEX).sum()
        # supervised text is the completion + turn suffix
        sup_c = np.asarray(c.input_ids)[lc != IGNORE_INDEX]
        enc = StubTokenizer().encode("a good one")
        assert list(sup_c[: len(enc)]) == enc

    def test_multi_turn_prompt_fully_masked(self, tmp_path):
        """Earlier assistant turns in a conversations record are context:
        ONLY the final completion is supervised (dpo_trainer.py loss_mask
        semantics — prompt = everything before the completion)."""
        img_file = tmp_path / "i.png"
        Image.fromarray(_img()).save(img_file)
        record = {
            "image": "i.png",
            "conversations": [
                {"from": "human", "value": "<image>what is it"},
                {"from": "gpt", "value": "an early answer"},
                {"from": "human", "value": "are you sure"},
            ],
            "chosen": "yes", "rejected": "maybe not",
        }
        c, r = build_dpo_pair_from_record(
            CFG, record, StubTokenizer(), budget=0.25, s_bucket=64,
            t_bucket=512, image_root=str(tmp_path),
            min_pixels=1, max_pixels=10**9)
        tok = StubTokenizer()
        for sample, ans in ((c, "yes"), (r, "maybe not")):
            labels = np.asarray(sample.labels)
            sup = np.asarray(sample.input_ids)[labels != IGNORE_INDEX]
            enc = tok.encode(ans)
            # supervised region starts with the completion, and the earlier
            # assistant turn's text is nowhere in it
            assert list(sup[: len(enc)]) == enc
            early = tok.encode("an early answer")
            sup_l = list(sup)
            assert not any(sup_l[i: i + len(early)] == early
                           for i in range(len(sup_l)))

    def test_multi_image_record(self, tmp_path):
        """Records with an image LIST splice every image's tokens
        (data_qwen.py:233-242 multi-image parity)."""
        for name, seed in (("a.png", 0), ("b.png", 1)):
            Image.fromarray(_img(seed)).save(tmp_path / name)
        record = {"image": ["a.png", "b.png"], "prompt": "compare",
                  "chosen": "left", "rejected": "right"}
        c, r = build_dpo_pair_from_record(
            CFG, record, StubTokenizer(), budget=0.25, s_bucket=128,
            t_bucket=256, image_root=str(tmp_path),
            min_pixels=1, max_pixels=10**9)
        # two images -> two vision_start markers in the expanded ids
        n_starts = int((np.asarray(c.input_ids)
                        == CFG.vision_start_token_id).sum())
        assert n_starts == 2
        np.testing.assert_array_equal(
            np.asarray(c.input_ids)[:10], np.asarray(r.input_ids)[:10])
