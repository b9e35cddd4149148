"""top_k and repetition_penalty generation knobs.

The reference's serving surface exposes ``repetition_penalty``
(``llava-ov-15/src/serve/app.py:107-112``) and HF ``generate`` supports
``top_k``; both follow HF logits-processor semantics here:
``RepetitionPenaltyLogitsProcessor`` (seen tokens get score/p when positive,
score*p when negative — including the prefill's last-row logits, so the
FIRST generated token is penalized too) and ``TopKLogitsWarper`` ->
``TopPLogitsWarper`` warper order. The HF oracle equality lives in
``test_hf_parity.py::test_greedy_generation_matches_hf_with_rep_penalty``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.models.qwen25vl.model import (
    QwenVLEngine,
    _nucleus_probs,
    _sample_token,
    init_params,
)
from visionselector_tpu.preprocess.image import preprocess_image
from visionselector_tpu.preprocess.rope import expand_vision_tokens

CFG = qwen25vl_tiny()


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


def make_request(seed=0):
    rng = np.random.RandomState(seed)
    img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
    pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
    ids = expand_vision_tokens([100, 200], [300, 400], grid)
    return ids, pixels, grid


class TestSampler:
    def test_top_k_one_is_greedy(self):
        """top_k=1 collapses sampling to argmax at any temperature."""
        key = jax.random.PRNGKey(0)
        logits = jax.random.normal(jax.random.PRNGKey(1), (64,))
        for seed in range(4):
            tok = _sample_token(
                logits, jax.random.PRNGKey(seed),
                jnp.asarray(1.3, jnp.float32), jnp.asarray(1.0, jnp.float32),
                jnp.asarray(1, jnp.int32))
            assert int(tok) == int(jnp.argmax(logits))
        del key

    def test_top_k_draws_stay_in_top_k(self):
        logits = jax.random.normal(jax.random.PRNGKey(2), (64,))
        topk_set = set(np.argsort(-np.asarray(logits))[:3].tolist())
        for seed in range(16):
            tok = _sample_token(
                logits, jax.random.PRNGKey(seed),
                jnp.asarray(2.0, jnp.float32), jnp.asarray(1.0, jnp.float32),
                jnp.asarray(3, jnp.int32))
            assert int(tok) in topk_set

    def test_top_k_zero_matches_full_vocab(self):
        """top_k=0 (off) and top_k=V draw identically for the same key."""
        logits = jax.random.normal(jax.random.PRNGKey(3), (64,))
        for seed in range(8):
            kk = jax.random.PRNGKey(seed)
            t0 = _sample_token(logits, kk, jnp.asarray(0.9, jnp.float32),
                               jnp.asarray(0.9, jnp.float32),
                               jnp.asarray(0, jnp.int32))
            tv = _sample_token(logits, kk, jnp.asarray(0.9, jnp.float32),
                               jnp.asarray(0.9, jnp.float32),
                               jnp.asarray(64, jnp.int32))
            assert int(t0) == int(tv)

    def test_nucleus_probs_top_k(self):
        logits = jax.random.normal(jax.random.PRNGKey(4), (3, 32))
        p = _nucleus_probs(logits, jnp.asarray(1.0), jnp.asarray(1.0),
                           jnp.asarray(2, jnp.int32))
        p = np.asarray(p)
        assert ((p > 0).sum(axis=1) <= 2).all()
        np.testing.assert_allclose(p.sum(axis=1), 1.0, rtol=1e-5)
        # top_k off == the plain nucleus distribution
        p0 = _nucleus_probs(logits, jnp.asarray(1.0), jnp.asarray(0.8))
        pk = _nucleus_probs(logits, jnp.asarray(1.0), jnp.asarray(0.8),
                            jnp.asarray(0, jnp.int32))
        np.testing.assert_allclose(np.asarray(p0), np.asarray(pk), rtol=1e-6)


class TestEngineKnobs:
    def test_top_k_one_equals_greedy_rollout(self, params):
        ids, pixels, grid = make_request()
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.25)
        greedy = eng.generate(ids, pixels, grid, max_new_tokens=6)
        k1 = eng.generate(ids, pixels, grid, max_new_tokens=6,
                          temperature=0.9, top_k=1, seed=3)
        assert k1.tokens == greedy.tokens

    def test_repetition_penalty_changes_greedy_repeats(self, params):
        """The tiny random model's greedy decode repeats a token; a strong
        penalty must break the run, and every later token must not repeat
        more often than the penalized distribution allows (weak check: the
        output differs and is EXACTLY reproducible)."""
        ids, pixels, grid = make_request()
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.25)
        base = eng.generate(ids, pixels, grid, max_new_tokens=6)
        pen = eng.generate(ids, pixels, grid, max_new_tokens=6,
                           repetition_penalty=1.5)
        pen2 = eng.generate(ids, pixels, grid, max_new_tokens=6,
                            repetition_penalty=1.5)
        assert pen.tokens == pen2.tokens  # deterministic
        if len(set(base.tokens)) < len(base.tokens):
            # base had a repeat -> the penalty must alter the rollout
            assert pen.tokens != base.tokens

    def test_repetition_penalty_first_token_penalized(self, params):
        """HF semantics: the penalty applies to the prefill's last-row
        logits too. Scoring the context's next-token logits by hand, the
        penalized first token equals argmax over the penalized row."""
        ids, pixels, grid = make_request()
        eng = QwenVLEngine(CFG, params, use_selector=False)
        state = eng.generate(ids, pixels, grid, max_new_tokens=4,
                             _defer_decode=True)
        lg = np.asarray(state.logits, np.float32)
        pres = np.zeros(CFG.text.vocab_size, bool)
        pres[np.asarray(ids)] = True
        rp = 1.4
        pen = np.where(pres, np.where(lg > 0, lg / rp, lg * rp), lg)
        expect_first = int(pen.argmax())
        res = eng.generate(ids, pixels, grid, max_new_tokens=4,
                           repetition_penalty=rp)
        assert res.tokens[0] == expect_first

    def test_text_only_knobs(self, params):
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.25)
        ids = np.asarray([100, 105, 110, 300], np.int64)
        greedy = eng.generate(ids, max_new_tokens=5)
        k1 = eng.generate(ids, max_new_tokens=5, temperature=1.1, top_k=1)
        assert k1.tokens == greedy.tokens
        pen = eng.generate(ids, max_new_tokens=5, repetition_penalty=1.5)
        assert pen.tokens == eng.generate(
            ids, max_new_tokens=5, repetition_penalty=1.5).tokens

    def test_batch_rp_matches_single(self, params):
        """Greedy + repetition_penalty: the batched decode loop must equal
        per-request one-shot rollouts (CPU fp32 exactness)."""
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.25)
        reqs = []
        for s in range(3):
            ids, pixels, grid = make_request(seed=s)
            reqs.append(dict(input_ids=ids, pixel_values=pixels,
                             grid_thw=grid))
        singles = [eng.generate(**r, max_new_tokens=5,
                                repetition_penalty=1.3) for r in reqs]
        batched = eng.generate_batch(reqs, max_new_tokens=5,
                                     repetition_penalty=1.3)
        for s, b in zip(singles, batched):
            assert b.tokens == s.tokens

    def test_speculative_rp_falls_back_to_plain(self, params):
        from visionselector_tpu.models.qwen25vl.model import (
            generate_speculative,
        )

        ids, pixels, grid = make_request()
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.25)
        plain = eng.generate(ids, pixels, grid, max_new_tokens=5,
                             repetition_penalty=1.4)
        spec = generate_speculative(eng, ids, pixels, grid,
                                    max_new_tokens=5,
                                    repetition_penalty=1.4)
        assert spec.tokens == plain.tokens

    def test_prefix_cache_rp_bypasses_store(self, params):
        from visionselector_tpu.models.qwen25vl.model import (
            PrefixCacheStore,
            generate_prefix_cached,
        )

        ids, pixels, grid = make_request()
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.25)
        store = PrefixCacheStore(max_entries=4, min_prefix=1)
        plain = eng.generate(ids, pixels, grid, max_new_tokens=5,
                             repetition_penalty=1.4)
        out = generate_prefix_cached(eng, store, ids, pixels, grid,
                                     max_new_tokens=5,
                                     repetition_penalty=1.4)
        assert out.tokens == plain.tokens
        assert store.hits == 0 and store.misses == 0  # untouched

    def test_chat_session_top_k_one_is_greedy(self, params):
        from visionselector_tpu.models.qwen25vl.model import (
            start_chat_session,
        )

        ids, pixels, grid = make_request()
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.25)
        greedy = eng.generate(ids, pixels, grid, max_new_tokens=5)
        res, _sess = start_chat_session(eng, ids, pixels, grid,
                                        max_new_tokens=5,
                                        temperature=0.8, top_k=1, seed=2)
        assert res.tokens == greedy.tokens


class TestContinuousKnobs:
    def test_continuous_top_k_matches_one_shot(self, params):
        from visionselector_tpu.models.qwen25vl.continuous import (
            ContinuousBatcher,
        )

        ids, pixels, grid = make_request()
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.25)
        oracle = eng.generate(ids, pixels, grid, max_new_tokens=6,
                              temperature=0.3, top_p=0.9, top_k=4, seed=5)
        b = ContinuousBatcher(eng, n_slots=2, t_max=512, chunk=4)
        try:
            res = b.submit(
                dict(input_ids=ids, pixel_values=pixels, grid_thw=grid),
                max_new_tokens=6, temperature=0.3, top_p=0.9, top_k=4,
                seed=5)
            assert res.tokens == oracle.tokens
        finally:
            b.shutdown()

    def test_continuous_rp_matches_one_shot(self, params):
        """Greedy + repetition_penalty through the slot pool must equal the
        one-shot rollout exactly (CPU fp32): presence row seeded from the
        prompt, first token re-picked from penalized prefill logits, and
        per-step accumulation inside the chunk program."""
        from visionselector_tpu.models.qwen25vl.continuous import (
            ContinuousBatcher,
        )

        ids, pixels, grid = make_request()
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.25)
        oracle = eng.generate(ids, pixels, grid, max_new_tokens=6,
                              repetition_penalty=1.4)
        b = ContinuousBatcher(eng, n_slots=2, t_max=512, chunk=4)
        try:
            res = b.submit(
                dict(input_ids=ids, pixel_values=pixels, grid_thw=grid),
                max_new_tokens=6, repetition_penalty=1.4)
            assert res.tokens == oracle.tokens
        finally:
            b.shutdown()

    def test_continuous_mixed_rp_and_plain_slots(self, params):
        """A penalized and a plain request sharing the pool: the penalized
        program's rps == 1.0 lane is the identity, so BOTH match their
        one-shot rollouts."""
        import threading

        from visionselector_tpu.models.qwen25vl.continuous import (
            ContinuousBatcher,
        )

        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.25)
        reqs = [make_request(seed=s) for s in (0, 1)]
        rps = [1.5, 1.0]
        oracles = [
            eng.generate(i, p, g, max_new_tokens=6, repetition_penalty=r)
            for (i, p, g), r in zip(reqs, rps)
        ]
        b = ContinuousBatcher(eng, n_slots=2, t_max=512, chunk=4)
        outs = [None, None]

        def run(j):
            ids, pixels, grid = reqs[j]
            outs[j] = b.submit(
                dict(input_ids=ids, pixel_values=pixels, grid_thw=grid),
                max_new_tokens=6, repetition_penalty=rps[j])

        try:
            threads = [threading.Thread(target=run, args=(j,))
                       for j in range(2)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            for j in range(2):
                assert outs[j].tokens == oracles[j].tokens, j
        finally:
            b.shutdown()

    def test_continuous_speculative_rp_rides_fused_path(self, params):
        """A penalized slot rides the fused speculative dispatch at the
        sequential rate (force-rejected proposals, penalized row-0 pick)
        and still equals the one-shot penalized rollout exactly — the r4
        whole-pool sequential fallback is gone."""
        from visionselector_tpu.models.qwen25vl.continuous import (
            ContinuousBatcher,
        )

        ids, pixels, grid = make_request()
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.25)
        oracle = eng.generate(ids, pixels, grid, max_new_tokens=6,
                              repetition_penalty=1.4)
        b = ContinuousBatcher(eng, n_slots=2, t_max=512, chunk=4,
                              speculative=3)
        try:
            res = b.submit(
                dict(input_ids=ids, pixel_values=pixels, grid_thw=grid),
                max_new_tokens=6, repetition_penalty=1.4)
            assert res.tokens == oracle.tokens
            assert b.stats["spec_steps"] > 0  # took the fused path
            # penalized slots are excluded from acceptance accounting
            assert res.spec_proposed == 0
        finally:
            b.shutdown()

    def test_continuous_penalized_and_plain_share_fused_pool(self, params):
        """1 penalized + 1 plain slot in one speculative pool: both match
        their one-shot oracles (the penalized slot must not corrupt the
        plain slot's speculative stream, and vice versa)."""
        import threading

        from visionselector_tpu.models.qwen25vl.continuous import (
            ContinuousBatcher,
        )

        ids, pixels, grid = make_request()
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.25)
        oracle_pen = eng.generate(ids, pixels, grid, max_new_tokens=6,
                                  repetition_penalty=1.4)
        oracle_plain = eng.generate(ids, pixels, grid, max_new_tokens=6)
        b = ContinuousBatcher(eng, n_slots=2, t_max=512, chunk=4,
                              speculative=3)
        try:
            results = {}

            def worker(name, extra):
                results[name] = b.submit(
                    dict(input_ids=ids, pixel_values=pixels, grid_thw=grid),
                    max_new_tokens=6, **extra)

            ts = [threading.Thread(target=worker,
                                   args=("pen", dict(repetition_penalty=1.4))),
                  threading.Thread(target=worker, args=("plain", {}))]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            assert results["pen"].tokens == oracle_pen.tokens
            assert results["plain"].tokens == oracle_plain.tokens
        finally:
            b.shutdown()

    def test_continuous_rp_with_kv_int8_pool(self, params):
        """The presence pool composes with the int8 KV pool (independent
        state). Token-exact equality with the fp oracle is not asserted
        (int8 rounding shifts logits ~1e-2); determinism and completion
        are."""
        from visionselector_tpu.models.qwen25vl import lm as lm_mod
        from visionselector_tpu.models.qwen25vl.continuous import (
            ContinuousBatcher,
        )

        ids, pixels, grid = make_request()
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.25)

        def run():
            b = ContinuousBatcher(eng, n_slots=2, t_max=512, chunk=4,
                                  kv_int8=True)
            try:
                res = b.submit(
                    dict(input_ids=ids, pixel_values=pixels,
                         grid_thw=grid),
                    max_new_tokens=6, eos_token_ids=(-1,),
                    repetition_penalty=1.4)
                assert isinstance(b.pool, lm_mod.QuantKVCache)
                return res.tokens
            finally:
                b.shutdown()

        a, b = run(), run()
        assert a == b and len(a) == 6

    def test_continuous_rp_bypasses_prefix_store(self, params):
        """Penalized admissions skip the prefix store (its reuse path has
        no prefill logits to penalize) — store untouched, rollout exact."""
        from visionselector_tpu.models.qwen25vl.continuous import (
            ContinuousBatcher,
        )
        from visionselector_tpu.models.qwen25vl.model import (
            PrefixCacheStore,
        )

        ids, pixels, grid = make_request()
        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.25)
        oracle = eng.generate(ids, pixels, grid, max_new_tokens=5,
                              repetition_penalty=1.3)
        store = PrefixCacheStore(max_entries=4, min_prefix=1)
        b = ContinuousBatcher(eng, n_slots=2, t_max=512, chunk=4,
                              prefix_store=store)
        try:
            res = b.submit(
                dict(input_ids=ids, pixel_values=pixels, grid_thw=grid),
                max_new_tokens=5, repetition_penalty=1.3)
            assert res.tokens == oracle.tokens
            assert store.hits == 0 and store.misses == 0
        finally:
            b.shutdown()
