"""int4 weight-only LM quantization (packed S4 storage, per-channel or
group-wise scales). Counterpart to test_int8.py; reference deploys bf16 on
A100s — int4 is the TPU-native deployment option (2 weights/byte of HBM,
decode is weight-bandwidth-bound)."""

import jax
import jax.numpy as jnp
import numpy as np

from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.models.qwen25vl import lm as lm_mod

CFG = qwen25vl_tiny()


def _tree(w):
    return {"layers": {n: jnp.asarray(w) for n in lm_mod.QUANT_KERNELS}}


class TestInt4Dense:
    def test_exact_when_grid_aligned(self):
        """Weights on the int4 grid quantize losslessly: the int4 matmul
        equals the fp32 one."""
        rng = np.random.RandomState(0)
        scale = 0.5 / 7.0
        w_int = rng.randint(-7, 8, (1, 16, 8)).astype(np.float32)
        w_int[0, 0, :] = 7.0  # every column hits the grid max -> lossless
        w = w_int * scale
        x = jnp.asarray(rng.randn(2, 4, 16), jnp.float32)

        q = lm_mod.quantize_lm_params(_tree(w), bits=4)
        layer = jax.tree.map(lambda a: a[0], q["layers"])
        assert layer["q_kernel"].dtype == jnp.int4
        got = lm_mod._dense(x, layer, "q_kernel")
        np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w[0]),
                                   rtol=1e-5, atol=1e-5)

    def test_grouped_exact_on_grid(self):
        """Group-wise scales: each group's own grid, still lossless for
        grid-aligned weights with per-group magnitudes."""
        rng = np.random.RandomState(1)
        gs = 8
        w_int = rng.randint(-7, 8, (1, 32, 8)).astype(np.float32)
        w_int[0, ::gs, :] = 7.0  # per-group max -> scale = mag/7 exactly
        # different magnitude per group
        mags = np.array([0.1, 0.5, 0.02, 1.0])[None, :, None, None]
        w = (w_int.reshape(1, 4, gs, 8) * (mags / 7.0)).reshape(1, 32, 8)
        x = jnp.asarray(rng.randn(2, 4, 32), jnp.float32)

        q = lm_mod.quantize_lm_params(_tree(w), bits=4, group_size=gs)
        layer = jax.tree.map(lambda a: a[0], q["layers"])
        assert layer["q_kernel"].dtype == jnp.int4
        assert layer["q_kernel_scale"].shape == (4, 8)
        got = lm_mod._dense(x, layer, "q_kernel")
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(x @ jnp.asarray(w[0])),
                                   rtol=1e-4, atol=1e-5)

    def test_grouped_beats_per_channel_on_mixed_magnitudes(self):
        """A weight whose rows span magnitudes (the case per-channel int4
        handles badly): grouped scales must reduce the matmul error."""
        rng = np.random.RandomState(2)
        w = rng.randn(1, 64, 16).astype(np.float32) * 0.02
        w[:, :8, :] *= 50.0  # one loud group per column
        # activations that read ONLY the quiet rows: per-channel scales are
        # set by the loud group, wiping out the quiet weights' resolution;
        # grouped scales keep per-group precision.
        x_np = rng.randn(1, 8, 64).astype(np.float32)
        x_np[..., :8] = 0.0
        x = jnp.asarray(x_np)
        want = np.asarray(x @ jnp.asarray(w[0]))

        def err(q):
            layer = jax.tree.map(lambda a: a[0], q["layers"])
            got = np.asarray(lm_mod._dense(x, layer, "q_kernel"))
            return np.abs(got - want).max()

        e_pc = err(lm_mod.quantize_lm_params(_tree(w), bits=4))
        e_g = err(lm_mod.quantize_lm_params(_tree(w), bits=4, group_size=8))
        assert e_g < e_pc * 0.1, (e_g, e_pc)

    def test_packed_storage_half_of_int8(self):
        """The compiled program's argument bytes for an int4 kernel are
        half the int8 kernel's (S4 packs 2 weights/byte in device memory)."""
        w = np.random.RandomState(3).randn(2, 256, 128).astype(np.float32)
        q8 = lm_mod.quantize_lm_params(_tree(w), bits=8)
        q4 = lm_mod.quantize_lm_params(_tree(w), bits=4)

        def arg_bytes(kern):
            f = jax.jit(lambda w: w[0, 0, 0].astype(jnp.float32))
            m = f.lower(kern).compile().memory_analysis()
            return m.argument_size_in_bytes

        b8 = arg_bytes(q8["layers"]["q_kernel"])
        b4 = arg_bytes(q4["layers"]["q_kernel"])
        assert b4 * 2 == b8, (b4, b8)


class TestInt4Model:
    def test_prefill_close_to_fp(self):
        """Grouped-int4 LM prefill tracks the fp tower (hidden-state cosine
        > 0.98) under jit."""
        params = lm_mod.init_lm_params(jax.random.PRNGKey(0), CFG.text,
                                       jnp.float32)
        qparams = dict(params)
        qparams.update(lm_mod.quantize_lm_params(
            params, bits=4, group_size=CFG.text.hidden_size // 4))

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
        assert cos > 0.98, cos

    def test_int4_init_runs(self):
        params = lm_mod.init_lm_params_int8(
            jax.random.PRNGKey(0), CFG.text, jnp.float32, bits=4)
        assert params["layers"]["q_kernel"].dtype == jnp.int4
        t = 8
        embeds = jnp.zeros((1, t, CFG.text.hidden_size), jnp.float32) + 0.1
        pos = jnp.broadcast_to(jnp.arange(t), (3, 1, t))
        seg = jnp.ones((1, t), jnp.int32)
        h, _ = lm_mod.lm_prefill(params, embeds, pos, seg, CFG.text)
        assert np.isfinite(np.asarray(h)).all()

    def test_engine_generate_int4(self):
        """End-to-end: the engine greedy-generates with a grouped-int4 LM,
        and the tokens match an engine holding the explicitly dequantized
        bf16 weights (the in-program dequant IS that dequant)."""
        from visionselector_tpu.models.qwen25vl.model import (
            QwenVLEngine,
            init_params,
        )

        params = init_params(jax.random.PRNGKey(0), CFG)
        gs = CFG.text.hidden_size // 4
        q = dict(params)
        q["lm"] = lm_mod.quantize_lm_params(params["lm"], bits=4,
                                            group_size=gs)

        # explicit dequant of the grouped-int4 tree
        deq_layers = dict(q["lm"]["layers"])
        for name in lm_mod.QUANT_KERNELS:
            w = np.asarray(deq_layers[name].astype(jnp.float32))
            s = np.asarray(deq_layers.pop(name + "_scale"))
            n, din, dout = w.shape
            g = s.shape[1]
            wd = (w.reshape(n, g, din // g, dout) * s[:, :, None, :]
                  ).reshape(n, din, dout)
            deq_layers[name] = jnp.asarray(wd, jnp.float32)
        deq = dict(params)
        deq["lm"] = dict(q["lm"], layers=deq_layers)

        img = (np.random.RandomState(0).rand(56, 56, 3) * 255).astype(
            np.uint8)
        from visionselector_tpu.preprocess.image import preprocess_image
        from visionselector_tpu.preprocess.rope import expand_vision_tokens

        px, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        ids = expand_vision_tokens([100, 101], [102], grid)
        eng_q = QwenVLEngine(CFG, q, use_selector=False)
        eng_d = QwenVLEngine(CFG, deq, use_selector=False)
        r_q = eng_q.generate(ids, px, grid, max_new_tokens=6)
        r_d = eng_d.generate(ids, px, grid, max_new_tokens=6)
        assert list(r_q.tokens) == list(r_d.tokens)
