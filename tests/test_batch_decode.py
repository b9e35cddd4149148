"""Decode-batched generation: generate_batch == per-request generate.

The reference serves strictly batch=1 (``token_compression/selector_model.py:
270``); decode batching is a TPU-native serving addition — per-layer/per-row
KV-cache lengths let requests of different shapes (selector / orig /
text-only) share one weight-bandwidth-bound decode dispatch.
"""

import jax
import numpy as np
import pytest

from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.models.qwen25vl.model import QwenVLEngine, init_params
from visionselector_tpu.preprocess.image import preprocess_image
from visionselector_tpu.preprocess.rope import expand_vision_tokens


@pytest.fixture(scope="module")
def setup():
    cfg = qwen25vl_tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)

    def make_req(hw, seed):
        img = (rng.rand(*hw, 3) * 255).astype(np.uint8)
        pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        ids = expand_vision_tokens(
            [100 + seed, 101], [103, 104 + seed], grid,
            image_token_id=cfg.image_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
            vision_end_token_id=cfg.vision_end_token_id,
        )
        return dict(input_ids=ids, pixel_values=pixels, grid_thw=grid)

    reqs = [
        make_req((56, 56), 0),
        make_req((100, 60), 1),  # different bucket / ragged windows
        dict(input_ids=np.array([7, 8, 9, 10, 11])),  # text-only
    ]
    return cfg, params, reqs


class TestGenerateBatch:
    def test_matches_sequential_greedy(self, setup):
        cfg, params, reqs = setup
        eng = QwenVLEngine(cfg, params, use_selector=True, budget=0.3)
        want = [eng.generate(**r, max_new_tokens=6) for r in reqs]
        got = eng.generate_batch(reqs, max_new_tokens=6)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g.tokens == w.tokens
            assert g.prefill_len == w.prefill_len
            assert g.num_vision_tokens == w.num_vision_tokens
            if w.selected_indices is None:
                assert g.selected_indices is None
            else:
                np.testing.assert_array_equal(
                    g.selected_indices, w.selected_indices
                )

    def test_early_eos_per_row(self, setup):
        """A row whose EOS arrives first must freeze while others continue."""
        cfg, params, reqs = setup
        eng = QwenVLEngine(cfg, params, use_selector=True, budget=0.3)
        base = [eng.generate(**r, max_new_tokens=5) for r in reqs]
        # use request 0's second token as EOS: request 0 stops after 1 token
        eos = (base[0].tokens[1],)
        want = [eng.generate(**r, max_new_tokens=5, eos_token_ids=eos)
                for r in reqs]
        got = eng.generate_batch(reqs, max_new_tokens=5, eos_token_ids=eos)
        for g, w in zip(got, want):
            assert g.tokens == w.tokens

    def test_max_new_tokens_one(self, setup):
        cfg, params, reqs = setup
        eng = QwenVLEngine(cfg, params, use_selector=False)
        want = [eng.generate(**r, max_new_tokens=1) for r in reqs]
        got = eng.generate_batch(reqs, max_new_tokens=1)
        for g, w in zip(got, want):
            assert g.tokens == w.tokens


class TestOVGenerateBatch:
    def test_matches_sequential_greedy(self):
        from visionselector_tpu.core.config import llava_ov_tiny
        from visionselector_tpu.models.llava_ov15.model import (
            OVEngine,
            init_ov_params,
        )

        cfg = llava_ov_tiny()
        params = init_ov_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(3)

        def make_req(hw, seed):
            img = (rng.rand(*hw, 3) * 255).astype(np.uint8)
            pixels, grid = preprocess_image(
                img, min_pixels=1, max_pixels=10**9,
                temporal_patch_size=cfg.vision.temporal_patch_size,
            )
            ids = expand_vision_tokens(
                [100 + seed], [300], grid,
                image_token_id=cfg.image_token_id,
                vision_start_token_id=cfg.vision_start_token_id,
                vision_end_token_id=cfg.vision_end_token_id,
            )
            return dict(input_ids=ids, pixel_values=pixels, grid_thw=grid)

        reqs = [make_req((56, 84), 0), make_req((56, 56), 1),
                dict(input_ids=np.array([4, 5, 6]))]
        eng = OVEngine(cfg, params, use_selector=True, budget=0.3)
        want = [eng.generate(**r, max_new_tokens=5) for r in reqs]
        got = eng.generate_batch(reqs, max_new_tokens=5)
        for g, w in zip(got, want):
            assert g.tokens == w.tokens
            assert g.prefill_len == w.prefill_len


class TestEvalDecodeBatch:
    def test_harness_batched_equals_sequential(self, tmp_path, monkeypatch):
        """generate_until with decode_batch=2 (mixed image + text-only docs)
        must produce the same predictions as per-request decode."""
        import json

        from PIL import Image

        from visionselector_tpu.eval.evaluator import EngineAdapter
        from visionselector_tpu.eval.tasks import TASKS, load_task_docs

        rng = np.random.RandomState(3)
        for name in ("a.png", "b.png"):
            Image.fromarray(
                (rng.rand(56, 56, 3) * 255).astype(np.uint8)
            ).save(tmp_path / name)
        with open(tmp_path / "mme.jsonl", "w") as f:
            f.write(json.dumps({"question": "Q1?", "answers": ["yes"],
                                "images": ["a.png"]}) + "\n")
            f.write(json.dumps({"question": "Q2?", "answers": ["yes"],
                                "images": ["b.png"]}) + "\n")
            f.write(json.dumps({"question": "Q3?", "answers": ["yes"]}) + "\n")
        reqs = load_task_docs(TASKS["mme"], str(tmp_path))

        cfg = qwen25vl_tiny()
        params = init_params(jax.random.PRNGKey(0), cfg)
        eng = QwenVLEngine(cfg, params, use_selector=True, budget=0.3)

        class Tok:
            def encode(self, s):
                return [ord(c) % 900 + 10 for c in s][:8]

            def decode(self, toks, skip_special_tokens=True):
                return " ".join(str(t) for t in toks)

        adapter = EngineAdapter(eng, Tok())
        seq = adapter.generate_until(reqs, decode_batch=1)
        bat = adapter.generate_until(reqs, decode_batch=2)
        assert seq == bat
