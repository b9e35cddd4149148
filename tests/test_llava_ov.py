"""LLaVA-OneVision-1.5 family tests: RICE ViT, Qwen3 text flags, OV engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionselector_tpu.core.config import llava_ov_tiny
from visionselector_tpu.models.llava_ov15 import rice as rice_mod
from visionselector_tpu.models.llava_ov15.model import OVEngine, init_ov_params
from visionselector_tpu.preprocess.image import preprocess_image
from visionselector_tpu.preprocess.rope import expand_vision_tokens

CFG = llava_ov_tiny()


@pytest.fixture(scope="module")
def params():
    return init_ov_params(jax.random.PRNGKey(0), CFG)


def make_pixels(h=56, w=84, seed=0):
    img = (np.random.RandomState(seed).rand(h, w, 3) * 255).astype(np.uint8)
    return preprocess_image(
        img, min_pixels=1, max_pixels=10**9,
        temporal_patch_size=CFG.vision.temporal_patch_size,
    )


class TestRiceBatch:
    def test_insert_strip_roundtrip(self):
        pixels, grid = make_pixels()
        rb = rice_mod.build_rice_batch(pixels, grid, pad_to=pixels.shape[0])
        s = pixels.shape[0]
        # strip(insert(x)) == x for real patch rows
        buf = np.concatenate([np.arange(s), [s, s + 1]])  # patch ids + CLS/PAD
        inserted = buf[np.minimum(rb.insert_map, s + 1)]
        stripped = inserted[rb.strip_map]
        np.testing.assert_array_equal(stripped[:s], np.arange(s))

    def test_cls_rows_and_segments(self):
        pixels, grid = make_pixels()
        rb = rice_mod.build_rice_batch(pixels, grid, pad_to=pixels.shape[0],
                                       cls_slots=4)
        s = pixels.shape[0]
        cls_rows = np.where(rb.insert_map == s)[0]
        assert len(cls_rows) == len(grid)  # one CLS per image
        assert cls_rows[0] == 0  # CLS at segment start
        # CLS row shares its image's segment id
        assert rb.seg_ids[0] == rb.seg_ids[1]

    def test_multi_image_segments(self):
        p1, g1 = make_pixels(56, 56, 1)
        p2, g2 = make_pixels(56, 84, 2)
        pixels = np.concatenate([p1, p2])
        grid = np.concatenate([g1, g2])
        rb = rice_mod.build_rice_batch(pixels, grid, pad_to=pixels.shape[0],
                                       cls_slots=4)
        assert rb.seg_ids.max() == 2
        s = pixels.shape[0]
        assert (rb.insert_map == s).sum() == 2


class TestRiceForward:
    def test_shapes_and_finite(self, params):
        pixels, grid = make_pixels()
        rb = rice_mod.build_rice_batch(pixels, grid, pad_to=pixels.shape[0],
                                       cls_slots=2)
        out = rice_mod.rice_forward(
            params["visual"], jnp.asarray(rb.pixel_values),
            jnp.asarray(rb.rot_pos_ids), jnp.asarray(rb.insert_map),
            jnp.asarray(rb.strip_map), jnp.asarray(rb.seg_ids), CFG.vision,
        )
        assert out.shape == (rb.num_merged, CFG.vision.text_hidden_size)
        assert np.isfinite(np.asarray(out)).all()

    def test_padding_invariance(self, params):
        pixels, grid = make_pixels()
        s = pixels.shape[0]

        def run(pad_to, cls_slots):
            rb = rice_mod.build_rice_batch(pixels, grid, pad_to=pad_to,
                                           cls_slots=cls_slots)
            out = rice_mod.rice_forward(
                params["visual"], jnp.asarray(rb.pixel_values),
                jnp.asarray(rb.rot_pos_ids), jnp.asarray(rb.insert_map),
                jnp.asarray(rb.strip_map), jnp.asarray(rb.seg_ids), CFG.vision,
            )
            return np.asarray(out)[: rb.num_merged]

        np.testing.assert_allclose(
            run(s, 1), run(2 * s, 6), atol=1e-5, rtol=1e-5
        )

    def test_image_independence(self, params):
        """Image 1 output unchanged when image 2 is packed alongside."""
        p1, g1 = make_pixels(56, 56, 3)
        p2, g2 = make_pixels(56, 84, 4)

        def run(pixels, grid):
            rb = rice_mod.build_rice_batch(pixels, grid,
                                           pad_to=pixels.shape[0] * 2,
                                           cls_slots=4)
            out = rice_mod.rice_forward(
                params["visual"], jnp.asarray(rb.pixel_values),
                jnp.asarray(rb.rot_pos_ids), jnp.asarray(rb.insert_map),
                jnp.asarray(rb.strip_map), jnp.asarray(rb.seg_ids), CFG.vision,
            )
            return np.asarray(out)

        solo = run(p1, g1)
        packed = run(np.concatenate([p1, p2]), np.concatenate([g1, g2]))
        n1 = p1.shape[0] // 4
        np.testing.assert_allclose(solo[:n1], packed[:n1], atol=1e-5, rtol=1e-5)


class TestOVEngine:
    def test_generate_with_selector(self, params):
        pixels, grid = make_pixels()
        n = pixels.shape[0] // 4
        ids = expand_vision_tokens([100, 200], [300], grid)
        eng = OVEngine(CFG, params, use_selector=True, budget=0.25)
        res = eng.generate(ids, pixels, grid, max_new_tokens=3)
        k = max(1, int(n * 0.25))
        assert len(res.selected_indices) == k
        assert (np.diff(res.selected_indices) > 0).all()
        assert res.prefill_len == (len(ids) - n) + k
        assert len(res.tokens) >= 1

    def test_generate_without_selector(self, params):
        pixels, grid = make_pixels()
        ids = expand_vision_tokens([100], [300], grid)
        eng = OVEngine(CFG, params, use_selector=False)
        res = eng.generate(ids, pixels, grid, max_new_tokens=2)
        assert res.prefill_len == len(ids)

    def test_selector_indices_golden(self, params):
        """Engine indices match an independent scorer top-k recomputation."""
        from visionselector_tpu.selector.scorer import score_tokens

        pixels, grid = make_pixels(seed=9)
        ids = expand_vision_tokens([100], [300], grid)
        eng = OVEngine(CFG, params, use_selector=True, budget=0.4)
        res = eng.generate(ids, pixels, grid, max_new_tokens=1)

        rb = rice_mod.build_rice_batch(pixels, grid, pad_to=pixels.shape[0],
                                       cls_slots=1)
        merged = rice_mod.rice_forward(
            params["visual"], jnp.asarray(rb.pixel_values),
            jnp.asarray(rb.rot_pos_ids), jnp.asarray(rb.insert_map),
            jnp.asarray(rb.strip_map), jnp.asarray(rb.seg_ids), CFG.vision,
        )
        scores = np.asarray(score_tokens(params["scorer"], merged))
        n = rb.num_merged
        k = max(1, int(n * 0.4))
        want = np.sort(np.argsort(-scores[:n], kind="stable")[:k])
        np.testing.assert_array_equal(res.selected_indices, want)


class TestOVTraining:
    def test_train_forward_and_grads(self, params):
        import jax.numpy as jnp
        import optax

        from visionselector_tpu.train.ov_loss import (
            build_ov_train_sample,
            ov_selector_train_forward,
        )

        img = (np.random.RandomState(0).rand(56, 56, 3) * 255).astype(np.uint8)
        sample = build_ov_train_sample(
            CFG, img, [101, 102], [103], [201, 202], budget=0.25,
            s_bucket=16, t_bucket=64,
        )
        sample = jax.tree.map(jnp.asarray, sample)
        k_max = max(1, int((16 // 4) * 0.25))

        def loss_fn(scorer):
            p = dict(params)
            p["scorer"] = scorer
            loss, metrics = ov_selector_train_forward(
                p, sample, CFG, jnp.asarray(1.0), k_max
            )
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params["scorer"]
        )
        assert np.isfinite(float(loss))
        np.testing.assert_allclose(
            float(metrics["soft_mass"]), float(sample.k), rtol=0.05
        )
        gnorm = float(optax.global_norm(grads))
        assert np.isfinite(gnorm) and gnorm > 0

    def test_training_reduces_bce(self, params):
        import jax.numpy as jnp
        import optax

        from visionselector_tpu.train.ov_loss import (
            build_ov_train_sample,
            ov_selector_train_forward,
        )

        img = (np.random.RandomState(1).rand(56, 56, 3) * 255).astype(np.uint8)
        sample = jax.tree.map(jnp.asarray, build_ov_train_sample(
            CFG, img, [101], [103], [201, 202], budget=0.25,
            s_bucket=16, t_bucket=64,
        ))
        k_max = 1
        opt = optax.adam(5e-3)
        scorer = params["scorer"]
        opt_state = opt.init(scorer)

        @jax.jit
        def step(scorer, opt_state):
            def f(sc):
                p = dict(params)
                p["scorer"] = sc
                return ov_selector_train_forward(
                    p, sample, CFG, jnp.asarray(1.0), k_max
                )

            (loss, metrics), g = jax.value_and_grad(f, has_aux=True)(scorer)
            upd, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(scorer, upd), opt_state, metrics

        bces = []
        for _ in range(6):
            scorer, opt_state, metrics = step(scorer, opt_state)
            bces.append(float(metrics["bce"]))
        assert bces[-1] < bces[0], bces


class TestOVWeights:
    def test_synthetic_checkpoint_roundtrip(self, tmp_path, params):
        """Save a synthetic HF-layout OV checkpoint, load it, run the engine."""
        from safetensors.numpy import save_file

        from visionselector_tpu.models.llava_ov15.weights import (
            load_ov_checkpoint,
        )

        rng = np.random.RandomState(0)
        v, t = CFG.vision, CFG.text
        tensors = {}

        def add(name, shape):
            tensors[name] = rng.randn(*shape).astype(np.float32)

        p = "model.visual."
        add(p + "patch_embed.proj.weight", (v.hidden_size, 3, 14, 14))
        tensors[p + "class_embedding"] = rng.randn(v.hidden_size).astype(np.float32)
        tensors[p + "class_pos_emb"] = rng.randn(1, v.head_dim // 2).astype(np.float32)
        add(p + "pre_layernorm.weight", (v.hidden_size,))
        add(p + "pre_layernorm.bias", (v.hidden_size,))
        for i in range(v.depth):
            b = f"{p}blocks.{i}."
            for nm in ("norm1", "norm2"):
                add(b + nm + ".weight", (v.hidden_size,))
                add(b + nm + ".bias", (v.hidden_size,))
            add(b + "attn.qkv.weight", (3 * v.hidden_size, v.hidden_size))
            add(b + "attn.qkv.bias", (3 * v.hidden_size,))
            add(b + "attn.proj.weight", (v.hidden_size, v.hidden_size))
            add(b + "attn.proj.bias", (v.hidden_size,))
            add(b + "mlp.fc1.weight", (v.intermediate_size, v.hidden_size))
            add(b + "mlp.fc1.bias", (v.intermediate_size,))
            add(b + "mlp.fc2.weight", (v.hidden_size, v.intermediate_size))
            add(b + "mlp.fc2.bias", (v.hidden_size,))
        m = v.spatial_merge_unit * v.hidden_size
        add(p + "merger.ln_q.weight", (v.hidden_size,))
        add(p + "merger.ln_q.bias", (v.hidden_size,))
        add(p + "merger.mlp.0.weight", (m, m))
        add(p + "merger.mlp.0.bias", (m,))
        add(p + "merger.mlp.2.weight", (v.text_hidden_size, m))
        add(p + "merger.mlp.2.bias", (v.text_hidden_size,))

        lp = "model.language_model."
        add(lp + "embed_tokens.weight", (t.vocab_size, t.hidden_size))
        dh = t.head_dim
        for i in range(t.num_hidden_layers):
            b = f"{lp}layers.{i}."
            add(b + "input_layernorm.weight", (t.hidden_size,))
            add(b + "post_attention_layernorm.weight", (t.hidden_size,))
            add(b + "self_attn.q_proj.weight", (t.num_attention_heads * dh, t.hidden_size))
            add(b + "self_attn.k_proj.weight", (t.num_key_value_heads * dh, t.hidden_size))
            add(b + "self_attn.v_proj.weight", (t.num_key_value_heads * dh, t.hidden_size))
            add(b + "self_attn.o_proj.weight", (t.hidden_size, t.num_attention_heads * dh))
            add(b + "self_attn.q_norm.weight", (dh,))
            add(b + "self_attn.k_norm.weight", (dh,))
            add(b + "mlp.gate_proj.weight", (t.intermediate_size, t.hidden_size))
            add(b + "mlp.up_proj.weight", (t.intermediate_size, t.hidden_size))
            add(b + "mlp.down_proj.weight", (t.hidden_size, t.intermediate_size))
        add(lp + "norm.weight", (t.hidden_size,))

        save_file(tensors, str(tmp_path / "model.safetensors"))
        loaded = load_ov_checkpoint(str(tmp_path), CFG)
        np.testing.assert_allclose(
            np.asarray(loaded["lm"]["layers"]["q_norm_scale"][1]),
            tensors[lp + "layers.1.self_attn.q_norm.weight"],
        )
        assert "scorer" not in loaded  # no scorer in this checkpoint

        pixels, grid = make_pixels(seed=3)
        ids = expand_vision_tokens([10], [20], grid)
        eng = OVEngine(CFG, loaded, use_selector=False)
        res = eng.generate(ids, pixels, grid, max_new_tokens=2)
        assert len(res.tokens) >= 1


class TestOVBaselines:
    """OV training-free compression parity
    (``llava-ov-15/compression_method/{fastv,dart,visionzip,divprune}.py``)."""

    def _generate(self, params, method, budget=0.3):
        from visionselector_tpu.selector.baselines import get_baseline

        pixels, grid = make_pixels(seed=5)
        ids = expand_vision_tokens(
            [100, 200], [300, 400], grid,
            image_token_id=CFG.image_token_id,
            vision_start_token_id=CFG.vision_start_token_id,
            vision_end_token_id=CFG.vision_end_token_id,
        )
        n = pixels.shape[0] // CFG.vision.spatial_merge_unit
        eng = OVEngine(CFG, params, budget=budget,
                       strategy=get_baseline(method))
        return eng.generate(ids, pixels, grid, max_new_tokens=2), n

    @pytest.mark.parametrize("method", ["visionzip", "divprune"])
    def test_vit_side_methods(self, params, method):
        res, n = self._generate(params, method)
        assert res.selected_indices is not None
        assert 1 <= len(res.selected_indices) <= int(n * 0.3) + 2
        assert res.selected_indices.max() < n
        assert len(res.tokens) >= 1

    @pytest.mark.parametrize("method", ["fastv", "dart"])
    def test_llm_side_methods(self, params, method):
        res, n = self._generate(params, method)
        assert res.selected_indices is not None
        assert res.selected_indices.max() < n
        assert len(res.tokens) >= 1

    def test_fastv_keeps_budget_count(self, params):
        res, n = self._generate(params, "fastv", budget=0.25)
        assert len(res.selected_indices) == max(1, int(n * 0.25))

    def test_sampling_knobs(self, params):
        """temperature/top_p/seed parity with the Qwen engine."""
        pixels, grid = make_pixels(seed=9)
        ids = expand_vision_tokens(
            [100], [400], grid,
            image_token_id=CFG.image_token_id,
            vision_start_token_id=CFG.vision_start_token_id,
            vision_end_token_id=CFG.vision_end_token_id,
        )
        eng = OVEngine(CFG, params, budget=0.5)
        r1 = eng.generate(ids, pixels, grid, max_new_tokens=6,
                          temperature=1.5, top_p=0.9, seed=1)
        r2 = eng.generate(ids, pixels, grid, max_new_tokens=6,
                          temperature=1.5, top_p=0.9, seed=1)
        assert r1.tokens == r2.tokens  # same seed -> same sample

    def test_text_only(self, params):
        eng = OVEngine(CFG, params)
        res = eng.generate(np.asarray([100, 200, 300]), max_new_tokens=3)
        assert res.num_vision_tokens == 0
        assert len(res.tokens) >= 1


class TestMergeModel:
    def test_smoke_assembly_and_report(self, tmp_path):
        """merge_model.py parity: assemble OV from parts, cosine sanity."""
        import json
        import os

        from visionselector_tpu.api.merge_model import main

        out = str(tmp_path / "merged")
        rc = main(["--output-dir", out, "--smoke"])
        assert rc == 0
        with open(os.path.join(out, "merge_report.json")) as f:
            rep = json.load(f)
        assert rep["ok"] is True
        assert rep["cosine"]["visual"] > 0.999
        assert rep["cosine"]["lm"] > 0.999
        assert os.path.isdir(os.path.join(out, "merged"))


class TestOVMoE:
    """LLaVA-OV-1.5 MoE variant (Qwen3-MoE text backbone,
    ``modeling_llavaonevision1_5_moe.py:658-707``)."""

    def test_moe_mlp_matches_manual(self):
        from visionselector_tpu.core.config import llava_ov_moe_tiny
        from visionselector_tpu.models.qwen25vl.lm import _moe_mlp

        cfg = llava_ov_moe_tiny().text
        rng = np.random.RandomState(0)
        d, e, mi = cfg.hidden_size, cfg.num_experts, cfg.moe_intermediate_size
        p = {
            "router_kernel": jnp.asarray(rng.randn(d, e), jnp.float32),
            "expert_gate_kernel": jnp.asarray(rng.randn(e, d, mi), jnp.float32) * 0.1,
            "expert_up_kernel": jnp.asarray(rng.randn(e, d, mi), jnp.float32) * 0.1,
            "expert_down_kernel": jnp.asarray(rng.randn(e, mi, d), jnp.float32) * 0.1,
        }
        x = jnp.asarray(rng.randn(1, 5, d), jnp.float32)
        got = np.asarray(_moe_mlp(x, p, cfg))

        # manual reference (torch loop semantics)
        xf = np.asarray(x)[0]
        logits = xf @ np.asarray(p["router_kernel"])
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        want = np.zeros_like(xf)
        for t in range(xf.shape[0]):
            top = np.argsort(-probs[t], kind="stable")[: cfg.num_experts_per_tok]
            w = probs[t, top]
            w = w / w.sum()  # norm_topk_prob
            for ei, wi in zip(top, w):
                g = xf[t] @ np.asarray(p["expert_gate_kernel"][ei])
                u = xf[t] @ np.asarray(p["expert_up_kernel"][ei])
                silu = g / (1 + np.exp(-g)) * u
                want[t] += wi * (silu @ np.asarray(p["expert_down_kernel"][ei]))
        np.testing.assert_allclose(got[0], want, rtol=2e-4, atol=2e-5)

    def test_moe_engine_generate(self):
        from visionselector_tpu.core.config import llava_ov_moe_tiny

        cfg = llava_ov_moe_tiny()
        params = init_ov_params(jax.random.PRNGKey(0), cfg)
        assert "router_kernel" in params["lm"]["layers"]
        pixels, grid = make_pixels(seed=7)
        ids = expand_vision_tokens(
            [100], [400], grid,
            image_token_id=cfg.image_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
            vision_end_token_id=cfg.vision_end_token_id,
        )
        eng = OVEngine(cfg, params, use_selector=True, budget=0.5)
        res = eng.generate(ids, pixels, grid, max_new_tokens=3)
        assert len(res.tokens) >= 1
        assert res.selected_indices is not None

    def test_moe_weights_roundtrip(self, tmp_path):
        """Synthetic HF MoE checkpoint loads with expert stacking."""
        import os

        from safetensors.numpy import save_file

        from visionselector_tpu.core.config import llava_ov_moe_tiny
        from visionselector_tpu.models.llava_ov15.weights import (
            load_qwen3_lm_params,
        )

        cfg = llava_ov_moe_tiny().text
        rng = np.random.RandomState(1)
        d, e, mi = cfg.hidden_size, cfg.num_experts, cfg.moe_intermediate_size
        dh, hq, hkv = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads
        tensors = {"model.embed_tokens.weight":
                   rng.randn(cfg.vocab_size, d).astype(np.float32),
                   "model.norm.weight": np.ones(d, np.float32)}
        for i in range(cfg.num_hidden_layers):
            pfx = f"model.layers.{i}."
            tensors[pfx + "input_layernorm.weight"] = np.ones(d, np.float32)
            tensors[pfx + "post_attention_layernorm.weight"] = np.ones(d, np.float32)
            tensors[pfx + "self_attn.q_proj.weight"] = rng.randn(hq * dh, d).astype(np.float32)
            tensors[pfx + "self_attn.k_proj.weight"] = rng.randn(hkv * dh, d).astype(np.float32)
            tensors[pfx + "self_attn.v_proj.weight"] = rng.randn(hkv * dh, d).astype(np.float32)
            tensors[pfx + "self_attn.o_proj.weight"] = rng.randn(d, hq * dh).astype(np.float32)
            tensors[pfx + "self_attn.q_norm.weight"] = np.ones(dh, np.float32)
            tensors[pfx + "self_attn.k_norm.weight"] = np.ones(dh, np.float32)
            tensors[pfx + "mlp.gate.weight"] = rng.randn(e, d).astype(np.float32)
            for j in range(e):
                ep = pfx + f"mlp.experts.{j}."
                tensors[ep + "gate_proj.weight"] = rng.randn(mi, d).astype(np.float32)
                tensors[ep + "up_proj.weight"] = rng.randn(mi, d).astype(np.float32)
                tensors[ep + "down_proj.weight"] = rng.randn(d, mi).astype(np.float32)
        save_file(tensors, os.path.join(tmp_path, "model.safetensors"))

        from visionselector_tpu.models.llava_ov15.weights import _open_checkpoint

        get = _open_checkpoint(str(tmp_path))
        params = load_qwen3_lm_params(get, cfg, jnp.float32, "model.")
        assert params["layers"]["expert_gate_kernel"].shape == (
            cfg.num_hidden_layers, e, d, mi
        )
        np.testing.assert_allclose(
            np.asarray(params["layers"]["expert_down_kernel"][0, 1]),
            tensors["model.layers.0.mlp.experts.1.down_proj.weight"].T,
        )
        np.testing.assert_allclose(
            np.asarray(params["layers"]["router_kernel"][0]),
            tensors["model.layers.0.mlp.gate.weight"].T,
        )


class TestOVVideo:
    def test_video_generate_through_harness(self, tmp_path):
        """OV video requests: per-frame RICE segments, 1D rope."""
        import json
        import os

        from PIL import Image

        vid_dir = tmp_path / "vid0"
        os.makedirs(vid_dir)
        for i in range(4):
            Image.fromarray(
                (np.random.RandomState(i).rand(56, 56, 3) * 255).astype(np.uint8)
            ).save(vid_dir / f"f{i:02d}.png")
        with open(tmp_path / "videomme.jsonl", "w") as f:
            f.write(json.dumps({"question": "A or B?", "answers": ["A"],
                                "video": "vid0"}) + "\n")

        from visionselector_tpu.api.run_eval import main

        out = str(tmp_path / "res")
        rc = main([
            "--data-dir", str(tmp_path), "--tasks", "videomme",
            "--method", "selector", "--budgets", "0.2", "--limit", "1",
            "--output-dir", out, "--family", "llava_ov15",
        ])
        assert rc == 0
        with open(os.path.join(out, "selector_0.2_rank0.json")) as f:
            res = json.load(f)
        assert "videomme/multiple_choice" in res["results"]


class TestOVMultiImage:
    def test_two_images_one_prompt(self, params):
        """OV multi-image: per-image CLS segments, joint selection."""
        p1, g1 = make_pixels(56, 56, 21)
        p2, g2 = make_pixels(56, 84, 22)
        pixels = np.concatenate([p1, p2])
        grid = np.concatenate([g1, g2])
        ids = expand_vision_tokens(
            [100, 200], [300], grid,
            image_token_id=CFG.image_token_id,
            vision_start_token_id=CFG.vision_start_token_id,
            vision_end_token_id=CFG.vision_end_token_id,
        )
        n = pixels.shape[0] // CFG.vision.spatial_merge_unit
        eng = OVEngine(CFG, params, use_selector=True, budget=0.3)
        res = eng.generate(ids, pixels, grid, max_new_tokens=2)
        assert res.num_vision_tokens == n
        k = max(1, int(n * 0.3))
        assert len(res.selected_indices) == k
        assert res.selected_indices.max() < n


class TestOVMixedImageVideo:
    def test_mixed_request_runs_and_compacts(self, params):
        """One prompt with an image run AND a video run through OVEngine
        (1D rope; image grids first in merged order, re-sorted by position)."""
        p_img, g_img = make_pixels(56, 84, 10)
        frames, g_vid = make_pixels(56, 56, 11)  # treat as a 1-frame video
        n_img = int(np.prod(g_img[0]) // 4)
        n_vid = int(np.prod(g_vid[0]) // 4)
        ids = np.asarray(
            [100]
            + [CFG.vision_start_token_id] + [CFG.video_token_id] * n_vid
            + [CFG.vision_end_token_id] + [250]
            + [CFG.vision_start_token_id] + [CFG.image_token_id] * n_img
            + [CFG.vision_end_token_id] + [300],
            np.int64,
        )  # video BEFORE image: exercises the re-sort
        eng = OVEngine(CFG, params, use_selector=True, budget=0.4)
        res = eng.generate(
            ids, pixel_values=p_img, grid_thw=g_img,
            pixel_values_videos=frames, video_grid_thw=g_vid,
            max_new_tokens=3, eos_token_ids=(-1,),
        )
        assert len(res.tokens) == 3
        assert res.num_vision_tokens == n_img + n_vid
        k = max(1, int((n_img + n_vid) * 0.4))
        assert len(res.selected_indices) == k
