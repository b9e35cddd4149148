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
