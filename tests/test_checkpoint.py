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
