"""Orbax checkpoint save/resume tests + predict CLI smoke."""

import jax
import jax.numpy as jnp
import numpy as np

from visionselector_tpu.core.checkpoint import (
    latest_checkpoint,
    maybe_resume,
    save_train_state,
)
from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.models.qwen25vl.model import init_params
from visionselector_tpu.train.train_step import ScheduleConfig, init_train_state

CFG = qwen25vl_tiny()


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        params = init_params(jax.random.PRNGKey(0), CFG)
        sched = ScheduleConfig(total_steps=10)
        state = init_train_state(params, sched)
        state = state._replace(step=jnp.asarray(7, jnp.int32))

        out = str(tmp_path / "run")
        path = save_train_state(state, out)
        assert path.endswith("checkpoint-7")
        assert latest_checkpoint(out) == path

        template = init_train_state(
            init_params(jax.random.PRNGKey(1), CFG), sched
        )
        restored, resumed = maybe_resume(out, template)
        assert resumed
        assert int(restored.step) == 7
        np.testing.assert_allclose(
            np.asarray(restored.scorer_params["q_kernel"]),
            np.asarray(state.scorer_params["q_kernel"]),
        )

    def test_no_checkpoint_returns_template(self, tmp_path):
        params = init_params(jax.random.PRNGKey(0), CFG)
        sched = ScheduleConfig(total_steps=10)
        state = init_train_state(params, sched)
        restored, resumed = maybe_resume(str(tmp_path / "empty"), state)
        assert not resumed

    def test_keep_limit_prunes(self, tmp_path):
        params = init_params(jax.random.PRNGKey(0), CFG)
        sched = ScheduleConfig(total_steps=10)
        out = str(tmp_path / "run")
        for s in [1, 2, 3]:
            state = init_train_state(params, sched)._replace(
                step=jnp.asarray(s, jnp.int32)
            )
            save_train_state(state, out, keep=2)
        import os

        names = sorted(os.listdir(out))
        assert names == ["checkpoint-2", "checkpoint-3"]



    def test_async_save_roundtrip_and_prune(self, tmp_path):
        """async_save: the write commits on background threads;
        finalize_saves() joins it; restore sees the exact state; pruning
        keeps the newest `keep` COMMITTED checkpoints at each save's entry,
        so there is never a moment with zero restorable checkpoints (if
        the process dies mid-commit, the previous dirs are intact)."""
        import os

        from visionselector_tpu.core.checkpoint import finalize_saves

        params = init_params(jax.random.PRNGKey(0), CFG)
        sched = ScheduleConfig(total_steps=10)
        state = init_train_state(params, sched)

        out = str(tmp_path / "run")
        for step in (1, 2, 3):
            st = state._replace(step=jnp.asarray(step, jnp.int32))
            path = save_train_state(st, out, step=step, async_save=True)
            assert path.endswith(f"checkpoint-{step}")
            if step > 1:
                # crash-safety window: the PREVIOUS committed checkpoint
                # must survive until the new write lands
                assert os.path.isdir(
                    os.path.join(out, f"checkpoint-{step - 1}"))
        finalize_saves()
        assert latest_checkpoint(out).endswith("checkpoint-3")
        names = sorted(n for n in os.listdir(out)
                       if n.startswith("checkpoint-"))
        # keep=1 committed + the just-committed newest (pruned back to
        # `keep` at the next save's entry)
        assert names == ["checkpoint-2", "checkpoint-3"], names

        template = init_train_state(
            init_params(jax.random.PRNGKey(1), CFG), sched
        )
        restored, resumed = maybe_resume(out, template)
        assert resumed and int(restored.step) == 3
        np.testing.assert_allclose(
            np.asarray(restored.scorer_params["q_kernel"]),
            np.asarray(state.scorer_params["q_kernel"]),
        )

    def test_async_save_keep_none_keeps_all(self, tmp_path):
        """keep=None means unlimited on BOTH the sync and async paths."""
        import os

        from visionselector_tpu.core.checkpoint import finalize_saves

        params = init_params(jax.random.PRNGKey(0), CFG)
        state = init_train_state(params, ScheduleConfig(total_steps=10))
        out = str(tmp_path / "run")
        for step in (1, 2, 3):
            st = state._replace(step=jnp.asarray(step, jnp.int32))
            save_train_state(st, out, step=step, keep=None, async_save=True)
        finalize_saves()
        names = sorted(n for n in os.listdir(out)
                       if n.startswith("checkpoint-"))
        assert names == ["checkpoint-1", "checkpoint-2", "checkpoint-3"]


class TestPredictCLI:
    def test_smoke_mode(self, capsys):
        import json

        from visionselector_tpu.api.predict import main

        rc = main(["--method", "selector", "--budget", "0.5",
                   "--max-new-tokens", "2"])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        res = json.loads(out)
        assert res["method"] == "selector"
        assert res["kept_vision_tokens"] <= res["num_vision_tokens"]


class TestVerifyCheckpoint:
    def test_record_then_verify_roundtrip(self, tmp_path):
        """tools/verify_checkpoint flow (VERDICT r1 item 10): record greedy
        transcript, verify matches; tampered transcript fails."""
        import json

        from visionselector_tpu.api.verify_checkpoint import main

        t = str(tmp_path / "transcript.json")
        assert main(["--record", t, "--max-new-tokens", "3",
                     "--budget", "0.5"]) == 0
        assert main(["--verify", t, "--max-new-tokens", "3",
                     "--budget", "0.5"]) == 0
        # tamper with the recorded tokens -> mismatch detected
        with open(t) as f:
            rec = json.load(f)
        rec["tokens"] = [x + 1 for x in rec["tokens"]]
        with open(t, "w") as f:
            json.dump(rec, f)
        assert main(["--verify", t, "--max-new-tokens", "3",
                     "--budget", "0.5"]) == 1

    def test_verify_with_real_layout_checkpoint(self, tmp_path):
        """End-to-end with a synthetic HF-layout checkpoint dir."""
        import json

        from tests.test_weights import CFG, make_hf_checkpoint

        from visionselector_tpu.api.verify_checkpoint import main

        ckpt = tmp_path / "ckpt"
        ckpt.mkdir()
        make_hf_checkpoint(str(ckpt))
        v, t = CFG.vision, CFG.text
        with open(ckpt / "config.json", "w") as f:
            json.dump({
                "vocab_size": t.vocab_size, "hidden_size": t.hidden_size,
                "intermediate_size": t.intermediate_size,
                "num_hidden_layers": t.num_hidden_layers,
                "num_attention_heads": t.num_attention_heads,
                "num_key_value_heads": t.num_key_value_heads,
                "tie_word_embeddings": t.tie_word_embeddings,
                "rope_scaling": {"mrope_section": list(t.mrope_section)},
                "image_token_id": CFG.image_token_id,
                "vision_config": {
                    "depth": v.depth, "hidden_size": v.hidden_size,
                    "intermediate_size": v.intermediate_size,
                    "num_heads": v.num_heads, "patch_size": v.patch_size,
                    "spatial_merge_size": v.spatial_merge_size,
                    "temporal_patch_size": v.temporal_patch_size,
                    "window_size": v.window_size,
                    "out_hidden_size": v.out_hidden_size,
                    "fullatt_block_indexes": list(v.fullatt_block_indexes),
                },
            }, f)
        t = str(tmp_path / "transcript.json")
        args = ["--model-path", str(ckpt), "--max-new-tokens", "2",
                "--budget", "0.5"]
        assert main(["--record", t] + args) == 0
        assert main(["--verify", t] + args) == 0


class TestAcceptance:
    def test_tiny_smoke_all_steps(self, tmp_path, capsys):
        """One-command acceptance (VERDICT r4 item 9): transcript roundtrip
        + golden indices + 8-sample regression, tiny random config."""
        import json as _json

        import numpy as np
        from PIL import Image

        from visionselector_tpu.api.acceptance import main

        img_path = tmp_path / "img.png"
        Image.fromarray(
            (np.random.RandomState(0).rand(56, 56, 3) * 255).astype(np.uint8)
        ).save(img_path)
        with open(tmp_path / "chartqa.jsonl", "w") as f:
            for i in range(3):
                f.write(_json.dumps({
                    "question": f"What is {i}?", "answers": [str(i)],
                    "image": "img.png",
                }) + "\n")
        rc = main(["--max-new-tokens", "3", "--budget", "0.5",
                   "--data-dir", str(tmp_path), "--tasks", "chartqa",
                   "--limit", "2"])
        out_lines = [ln for ln in capsys.readouterr().out.splitlines()
                     if ln.startswith("{")]
        steps = [_json.loads(ln) for ln in out_lines]
        assert rc == 0
        assert steps[-1]["acceptance"] == "PASS"
        names = {s.get("step") for s in steps if "step" in s}
        assert names == {"transcript", "golden_indices", "regression8"}
