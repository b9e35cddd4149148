"""Cross-request KV prefix caching: requests sharing (image, prompt prefix)
skip re-prefilling the shared prefix. Greedy outputs must be IDENTICAL to a
fresh full prefill — the LIS selector scores vision tokens only, so its
selection is unchanged under a different trailing question; text-dependent
strategies (FastV/DART) are restricted to exact whole-prompt repeats."""

import jax
import numpy as np

from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.models.qwen25vl.model import (
    PrefixCacheStore,
    QwenVLEngine,
    generate_prefix_cached,
    init_params,
)


def _setup(use_selector=True, strategy=None, budget=0.5):
    from visionselector_tpu.preprocess.image import preprocess_image
    from visionselector_tpu.preprocess.rope import expand_vision_tokens

    cfg = qwen25vl_tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = QwenVLEngine(cfg, params, use_selector=use_selector,
                       budget=budget, strategy=strategy)
    img = (np.random.RandomState(0).rand(56, 84, 3) * 255).astype(np.uint8)
    pixels, grid = preprocess_image(img)

    def ids_for(question):
        return expand_vision_tokens(
            [5, 6, 7], list(question), grid,
            image_token_id=cfg.image_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
            vision_end_token_id=cfg.vision_end_token_id,
        )

    return eng, ids_for, pixels, grid


class TestPrefixCacheSelector:
    def test_exact_repeat_hits_and_matches(self):
        eng, ids_for, pixels, grid = _setup()
        store = PrefixCacheStore(min_prefix=1)
        ids = ids_for([8, 9, 10])
        ref = eng.generate(ids, pixels, grid, max_new_tokens=6,
                           eos_token_ids=(-1,))
        r1 = generate_prefix_cached(eng, store, ids, pixels, grid,
                                    max_new_tokens=6, eos_token_ids=(-1,))
        r2 = generate_prefix_cached(eng, store, ids, pixels, grid,
                                    max_new_tokens=6, eos_token_ids=(-1,))
        assert r1.tokens == ref.tokens
        assert r2.tokens == ref.tokens, (r2.tokens, ref.tokens)
        assert store.misses == 1 and store.hits == 1

    def test_different_question_hits_and_matches_fresh_prefill(self):
        """Same image + system prefix, different question: the hit rolls
        back the trailing text and appends the new question — output must
        equal a from-scratch compressed prefill of the NEW prompt."""
        eng, ids_for, pixels, grid = _setup()
        store = PrefixCacheStore(min_prefix=1)
        generate_prefix_cached(eng, store, ids_for([8, 9, 10]), pixels,
                               grid, max_new_tokens=5, eos_token_ids=(-1,))
        ids_b = ids_for([8, 77, 78, 79])
        ref = eng.generate(ids_b, pixels, grid, max_new_tokens=5,
                           eos_token_ids=(-1,))
        r = generate_prefix_cached(eng, store, ids_b, pixels, grid,
                                   max_new_tokens=5, eos_token_ids=(-1,))
        assert store.hits == 1
        assert r.tokens == ref.tokens, (r.tokens, ref.tokens)
        assert r.num_vision_tokens == ref.num_vision_tokens
        assert (r.selected_indices == ref.selected_indices).all()

    def test_snapshot_survives_repeated_hits(self):
        eng, ids_for, pixels, grid = _setup()
        store = PrefixCacheStore(min_prefix=1)
        generate_prefix_cached(eng, store, ids_for([8, 9]), pixels, grid,
                               max_new_tokens=4, eos_token_ids=(-1,))
        for q in ([8, 50], [8, 51, 52], [8, 50]):
            ids = ids_for(q)
            ref = eng.generate(ids, pixels, grid, max_new_tokens=4,
                               eos_token_ids=(-1,))
            r = generate_prefix_cached(eng, store, ids, pixels, grid,
                                       max_new_tokens=4,
                                       eos_token_ids=(-1,))
            assert r.tokens == ref.tokens, (q, r.tokens, ref.tokens)
        assert store.hits == 3

    def test_different_image_misses(self):
        eng, ids_for, pixels, grid = _setup()
        store = PrefixCacheStore(min_prefix=1)
        ids = ids_for([8, 9])
        generate_prefix_cached(eng, store, ids, pixels, grid,
                               max_new_tokens=4, eos_token_ids=(-1,))
        from visionselector_tpu.preprocess.image import preprocess_image

        img2 = (np.random.RandomState(9).rand(56, 84, 3) * 255).astype(
            np.uint8)
        pixels2, grid2 = preprocess_image(img2)
        ref = eng.generate(ids, pixels2, grid2, max_new_tokens=4,
                           eos_token_ids=(-1,))
        r = generate_prefix_cached(eng, store, ids, pixels2, grid2,
                                   max_new_tokens=4, eos_token_ids=(-1,))
        assert store.hits == 0 and store.misses == 2
        assert r.tokens == ref.tokens

    def test_divergence_inside_vision_prefix_misses(self):
        """A common prefix that doesn't cover the vision span can't be
        reused (compaction breaks the ids->rows mapping there)."""
        eng, ids_for, pixels, grid = _setup()
        store = PrefixCacheStore(min_prefix=1)
        ids = ids_for([8, 9])
        generate_prefix_cached(eng, store, ids, pixels, grid,
                               max_new_tokens=4, eos_token_ids=(-1,))
        # same image but a different BEFORE-segment: prefix diverges at
        # token 1, well inside/before the vision span
        from visionselector_tpu.preprocess.rope import expand_vision_tokens

        ids_b = expand_vision_tokens(
            [5, 99, 7], [8, 9], grid,
            image_token_id=eng.cfg.image_token_id,
            vision_start_token_id=eng.cfg.vision_start_token_id,
            vision_end_token_id=eng.cfg.vision_end_token_id,
        )
        ref = eng.generate(ids_b, pixels, grid, max_new_tokens=4,
                           eos_token_ids=(-1,))
        r = generate_prefix_cached(eng, store, ids_b, pixels, grid,
                                   max_new_tokens=4, eos_token_ids=(-1,))
        assert store.hits == 0
        assert r.tokens == ref.tokens

    def test_longer_max_new_tokens_on_hit(self):
        """A hit whose request wants MORE decode budget than the stored
        snapshot's original request must extend capacity, not truncate."""
        eng, ids_for, pixels, grid = _setup()
        store = PrefixCacheStore(min_prefix=1)
        generate_prefix_cached(eng, store, ids_for([8, 9]), pixels, grid,
                               max_new_tokens=3, eos_token_ids=(-1,))
        ids_b = ids_for([8, 60])
        ref = eng.generate(ids_b, pixels, grid, max_new_tokens=12,
                           eos_token_ids=(-1,))
        r = generate_prefix_cached(eng, store, ids_b, pixels, grid,
                                   max_new_tokens=12, eos_token_ids=(-1,))
        assert store.hits == 1
        assert r.tokens == ref.tokens

    def test_sampled_hit_matches_fresh_sampled(self):
        """A sampled request through a cache hit reproduces the fresh
        sampled rollout: the decode consumes the same per-step key-split
        stream as ``engine.generate(temperature, seed)``."""
        eng, ids_for, pixels, grid = _setup()
        store = PrefixCacheStore(min_prefix=1)
        generate_prefix_cached(eng, store, ids_for([8, 9]), pixels, grid,
                               max_new_tokens=3, eos_token_ids=(-1,))
        ids_b = ids_for([8, 60])
        ref = eng.generate(ids_b, pixels, grid, max_new_tokens=10,
                           eos_token_ids=(-1,), temperature=0.3, top_p=0.9,
                           seed=5)
        greedy = eng.generate(ids_b, pixels, grid, max_new_tokens=10,
                              eos_token_ids=(-1,))
        assert ref.tokens != greedy.tokens  # sampling actually diverges
        r = generate_prefix_cached(eng, store, ids_b, pixels, grid,
                                   max_new_tokens=10, eos_token_ids=(-1,),
                                   temperature=0.3, top_p=0.9, seed=5)
        assert store.hits == 1
        assert r.tokens == ref.tokens, (r.tokens, ref.tokens)


class TestPrefixCacheTextOnly:
    def test_text_prefix_reuse(self):
        cfg = qwen25vl_tiny()
        eng = QwenVLEngine(cfg, init_params(jax.random.PRNGKey(0), cfg),
                           use_selector=False, budget=1.0)
        store = PrefixCacheStore(min_prefix=1)
        base = list(range(40, 72))  # shared 32-token system prompt
        ids_a = np.asarray(base + [7, 8], np.int64)
        ids_b = np.asarray(base + [9, 10, 11], np.int64)
        generate_prefix_cached(eng, store, ids_a, max_new_tokens=4,
                               eos_token_ids=(-1,))
        ref = eng.generate(ids_b, max_new_tokens=4, eos_token_ids=(-1,))
        r = generate_prefix_cached(eng, store, ids_b, max_new_tokens=4,
                                   eos_token_ids=(-1,))
        assert store.hits == 1
        assert r.tokens == ref.tokens, (r.tokens, ref.tokens)


class TestPrefixCacheStrategies:
    def test_fastv_exact_repeat_only(self):
        """Text-dependent pruning (FastV): divergent-suffix reuse would
        change the selection, so only whole-prompt repeats may hit."""
        from visionselector_tpu.selector.baselines import get_baseline

        eng, ids_for, pixels, grid = _setup(
            use_selector=False, strategy=get_baseline("fastv"))
        store = PrefixCacheStore(min_prefix=1)
        ids = ids_for([8, 9, 10])
        ref = eng.generate(ids, pixels, grid, max_new_tokens=5,
                           eos_token_ids=(-1,))
        r1 = generate_prefix_cached(eng, store, ids, pixels, grid,
                                    max_new_tokens=5, eos_token_ids=(-1,))
        r2 = generate_prefix_cached(eng, store, ids, pixels, grid,
                                    max_new_tokens=5, eos_token_ids=(-1,))
        assert r1.tokens == ref.tokens and r2.tokens == ref.tokens
        assert store.hits == 1
        # different question: must MISS (fresh prefill, fresh selection)
        ids_b = ids_for([8, 9, 42])
        ref_b = eng.generate(ids_b, pixels, grid, max_new_tokens=5,
                             eos_token_ids=(-1,))
        r3 = generate_prefix_cached(eng, store, ids_b, pixels, grid,
                                    max_new_tokens=5, eos_token_ids=(-1,))
        assert store.misses == 2
        assert r3.tokens == ref_b.tokens


class TestStoreMechanics:
    def test_lru_eviction(self):
        store = PrefixCacheStore(max_entries=2, min_prefix=1)
        from visionselector_tpu.models.qwen25vl.model import PrefixEntry

        def entry(tag):
            return PrefixEntry(sig=None, ids=np.asarray([tag, 1, 2, 3]),
                               vis_end=0, cache=None, pos=4, result=None)

        for t in (100, 200, 300):
            store.insert(entry(t))
        assert len(store.entries) == 2
        sigs = [tuple(e.ids) for e in store.entries.values()]
        assert (100, 1, 2, 3) not in sigs

    def test_min_prefix_gate(self):
        store = PrefixCacheStore(min_prefix=8)
        from visionselector_tpu.models.qwen25vl.model import PrefixEntry

        store.insert(PrefixEntry(sig=None, ids=np.arange(4), vis_end=0,
                                 cache=None, pos=4, result=None))
        assert store.lookup(None, np.arange(4)) is None

    def test_duplicate_insert_skipped(self):
        store = PrefixCacheStore(min_prefix=1)
        from visionselector_tpu.models.qwen25vl.model import PrefixEntry

        e = PrefixEntry(sig="x", ids=np.arange(8), vis_end=0, cache=None,
                        pos=8, result=None)
        store.insert(e)
        store.insert(PrefixEntry(sig="x", ids=np.arange(8), vis_end=0,
                                 cache=None, pos=8, result=None))
        assert len(store.entries) == 1
