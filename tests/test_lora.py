"""LoRA adapter tests (peft-parity rank/alpha, no-op init, merge)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.models.qwen25vl import lm as lm_mod
from visionselector_tpu.train.lora import (
    add_lora_params,
    merge_lora_params,
)

CFG = qwen25vl_tiny()


@pytest.fixture(scope="module")
def lm_params():
    return lm_mod.init_lm_params(jax.random.PRNGKey(0), CFG.text, jnp.float32)


def _prefill(params, t=8):
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 1000, t))
    embeds = lm_mod.embed_tokens(params, ids)[None]
    pos = jnp.broadcast_to(jnp.arange(t), (3, 1, t))
    seg = jnp.ones((1, t), jnp.int32)
    h, _ = lm_mod.lm_prefill(params, embeds, pos, seg, CFG.text)
    return np.asarray(h)


class TestLoRA:
    def test_init_is_noop(self, lm_params):
        """B = 0 at init (peft convention): forward unchanged."""
        want = _prefill(lm_params)
        lora = add_lora_params(lm_params, jax.random.PRNGKey(2), rank=4)
        got = _prefill(lora)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_merge_equals_adapter_forward(self, lm_params):
        """After training-like perturbation of B, merged dense weights give
        the same forward as base + adapters."""
        lora = add_lora_params(lm_params, jax.random.PRNGKey(3), rank=4,
                               alpha=16)
        layers = dict(lora["layers"])
        rng = np.random.RandomState(4)
        for name in list(layers):
            if name.endswith("_lora_b"):
                layers[name] = jnp.asarray(
                    rng.randn(*layers[name].shape).astype(np.float32) * 0.02
                )
        lora = dict(lora)
        lora["layers"] = layers

        with_adapters = _prefill(lora)
        merged = merge_lora_params(lora)
        assert not any("_lora_" in k for k in merged["layers"])
        merged_fwd = _prefill(merged)
        np.testing.assert_allclose(merged_fwd, with_adapters,
                                   rtol=2e-3, atol=2e-3)

    def test_lora_over_int8_base(self, lm_params):
        """Adapters compose with an int8-quantized base."""
        q = dict(lm_params)
        q.update(lm_mod.quantize_lm_params(lm_params))
        lora = add_lora_params(q, jax.random.PRNGKey(5), rank=4)
        out = _prefill(lora)
        assert np.isfinite(out).all()

    def test_sft_cli_lora(self, tmp_path, capsys):
        import json
        import os

        from visionselector_tpu.api.train import main

        out = str(tmp_path / "lora")
        rc = main([
            "--output-dir", out, "--smoke", "--method", "sft",
            "--total-steps", "2", "--batch-size", "2", "--save-steps", "2",
            "--log-steps", "1", "--lora-rank", "4",
        ])
        assert rc == 0
        lines = [l for l in capsys.readouterr().out.splitlines()
                 if l.startswith("{")]
        assert np.isfinite(json.loads(lines[-1])["loss"])
        assert os.path.isdir(os.path.join(out, "lora_merged"))
