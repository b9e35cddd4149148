"""Continuous batching: slots join/leave the shared decode loop mid-flight;
every request's greedy tokens must equal a plain per-request generate
(CPU fp32 — batched lane math is exact there; test_batch_decode.py pins the
same property for the one-shot batched path)."""

import concurrent.futures as cf
import time

import jax
import numpy as np
import pytest

from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.models.qwen25vl.continuous import ContinuousBatcher
from visionselector_tpu.models.qwen25vl.model import (
    QwenVLEngine,
    init_params,
)


@pytest.fixture(scope="module")
def setup():
    from visionselector_tpu.preprocess.image import preprocess_image
    from visionselector_tpu.preprocess.rope import expand_vision_tokens

    cfg = qwen25vl_tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = QwenVLEngine(cfg, params, use_selector=True, budget=0.5)
    img = (np.random.RandomState(0).rand(56, 84, 3) * 255).astype(np.uint8)
    pixels, grid = preprocess_image(img)

    def ids_for(q):
        return expand_vision_tokens(
            [5, 6, 7], list(q), grid,
            image_token_id=cfg.image_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
            vision_end_token_id=cfg.vision_end_token_id,
        )

    return eng, ids_for, pixels, grid


class TestContinuousBatcher:
    def test_mixed_requests_match_sequential(self, setup):
        """More requests than slots, different question lengths and decode
        budgets: every result equals the per-request oracle, slots get
        reused, and at least one request joins while others are
        mid-decode."""
        eng, ids_for, pixels, grid = setup
        reqs = [
            (dict(input_ids=ids_for([8, 9]), pixel_values=pixels,
                  grid_thw=grid), 12),
            (dict(input_ids=ids_for([8, 40, 41]), pixel_values=pixels,
                  grid_thw=grid), 5),
            (dict(input_ids=np.asarray([7, 8, 9, 10], np.int64)), 9),
            (dict(input_ids=ids_for([50]), pixel_values=pixels,
                  grid_thw=grid), 16),
            (dict(input_ids=np.asarray([30, 31], np.int64)), 3),
        ]
        oracle = [
            eng.generate(**r, max_new_tokens=m, eos_token_ids=(-1,)).tokens
            for r, m in reqs
        ]
        bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4)
        try:
            with cf.ThreadPoolExecutor(max_workers=len(reqs)) as ex:
                futs = [
                    ex.submit(bat.submit, r, m, (-1,)) for r, m in reqs
                ]
                results = [f.result(timeout=600) for f in futs]
        finally:
            bat.shutdown()
        for i, (res, want) in enumerate(zip(results, oracle)):
            assert res.tokens == want, (i, res.tokens, want)
        assert bat.stats["admitted"] == len(reqs)
        assert bat.stats["max_concurrent"] == 2
        assert bat.stats["mid_flight_joins"] >= 1
        assert bat.stats["chunks"] >= 3

    def test_chunked_prefill_state_matches_fused(self, setup):
        """start_chunked_prefill -> step* -> finish produces the SAME
        next_token, logits, cache rows [0:valid_len] and selection as the
        fused _defer_decode prefill."""
        eng, ids_for, pixels, grid = setup
        kw = dict(input_ids=ids_for([8, 9]), pixel_values=pixels,
                  grid_thw=grid, max_new_tokens=4, eos_token_ids=(-1,))
        ref = eng.generate(**kw, _defer_decode=True)
        job = eng.start_chunked_prefill(**kw, prefill_chunk=8)
        segs = 1
        while not job.step():
            segs += 1
        st = job.finish()
        assert segs == job.n_seg and segs >= 2
        assert st.next_token == ref.next_token
        assert st.result.prefill_len == ref.result.prefill_len
        assert st.start_pos == ref.start_pos
        vl = st.result.prefill_len
        np.testing.assert_allclose(
            np.asarray(st.cache.k)[:, :, :vl],
            np.asarray(ref.cache.k)[:, :, :vl], atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(st.cache.v)[:, :, :vl],
            np.asarray(ref.cache.v)[:, :, :vl], atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(st.logits), np.asarray(ref.logits), atol=2e-4)
        np.testing.assert_array_equal(st.result.selected_indices,
                                      ref.result.selected_indices)

    @pytest.mark.parametrize("vit_segments", [0, 2])
    def test_chunked_prefill_admission_matches_sequential(
            self, setup, vit_segments):
        """prefill_chunk > 0: admissions run segmented (vision dispatch +
        fixed-size decoder segments interleaved with decode chunks) and
        every result still equals the per-request oracle; text-only
        requests fall back to the fused path. vit_segments > 1 also runs
        the vision tower in layer groups."""
        eng, ids_for, pixels, grid = setup
        reqs = [
            (dict(input_ids=ids_for([8, 9]), pixel_values=pixels,
                  grid_thw=grid), 12),
            (dict(input_ids=ids_for([8, 40, 41]), pixel_values=pixels,
                  grid_thw=grid), 5),
            (dict(input_ids=np.asarray([7, 8, 9, 10], np.int64)), 9),
            (dict(input_ids=ids_for([50]), pixel_values=pixels,
                  grid_thw=grid), 16),
        ]
        oracle = [
            eng.generate(**r, max_new_tokens=m, eos_token_ids=(-1,)).tokens
            for r, m in reqs
        ]
        bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4,
                                prefill_chunk=8,
                                prefill_vit_segments=vit_segments)
        try:
            with cf.ThreadPoolExecutor(max_workers=len(reqs)) as ex:
                futs = [ex.submit(bat.submit, r, m, (-1,))
                        for r, m in reqs]
                results = [f.result(timeout=600) for f in futs]
        finally:
            bat.shutdown()
        for i, (res, want) in enumerate(zip(results, oracle)):
            assert res.tokens == want, (i, res.tokens, want)
        # the three vision requests admit via the segmented path, in >= 2
        # segments each (prompts are ~10+ compacted tokens at chunk 8);
        # with a segmented tower each admission takes further dispatches
        assert bat.stats["chunked_admissions"] == 3
        floor = 6 if vit_segments <= 1 else 6 + 3 * vit_segments
        assert bat.stats["prefill_chunks"] >= floor
        assert bat.stats["admitted"] == len(reqs)
        assert bat.stats["max_decode_gap_ms"] > 0.0  # gap metric populated

    def test_chunked_admission_mid_decode_preserves_live_slot(self, setup):
        """A request admitted through the segmented path while another slot
        decodes must not perturb the live slot's tokens, and the joiner
        must match its own oracle."""
        eng, ids_for, pixels, grid = setup
        r1 = dict(input_ids=ids_for([8, 9]), pixel_values=pixels,
                  grid_thw=grid)
        r2 = dict(input_ids=ids_for([8, 40, 41]), pixel_values=pixels,
                  grid_thw=grid)
        want1 = eng.generate(**r1, max_new_tokens=24,
                             eos_token_ids=(-1,)).tokens
        want2 = eng.generate(**r2, max_new_tokens=6,
                             eos_token_ids=(-1,)).tokens
        bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=2,
                                prefill_chunk=8)
        try:
            with cf.ThreadPoolExecutor(max_workers=2) as ex:
                f1 = ex.submit(bat.submit, r1, 24, (-1,))
                time.sleep(0.5)  # let r1 start decoding
                f2 = ex.submit(bat.submit, r2, 6, (-1,))
                res1, res2 = f1.result(timeout=600), f2.result(timeout=600)
        finally:
            bat.shutdown()
        assert res1.tokens == want1
        assert res2.tokens == want2
        assert bat.stats["chunked_admissions"] == 2

    def test_int4_lm_serves_like_its_oracle(self):
        """Continuous serving over a grouped-int4 LM: every result equals
        the same int4 engine's one-shot generate (the quantized weights
        flow through admission prefill + chunked decode unchanged)."""
        from visionselector_tpu.models.qwen25vl.lm import (
            apply_weight_quantization,
        )
        from visionselector_tpu.preprocess.image import preprocess_image
        from visionselector_tpu.preprocess.rope import expand_vision_tokens

        cfg = qwen25vl_tiny()
        params = apply_weight_quantization(
            init_params(jax.random.PRNGKey(3), cfg),
            f"int4:g{cfg.text.hidden_size // 4}")
        eng = QwenVLEngine(cfg, params, use_selector=True, budget=0.5)
        img = (np.random.RandomState(1).rand(56, 56, 3) * 255).astype(
            np.uint8)
        pixels, grid = preprocess_image(img)
        reqs = [
            (dict(input_ids=expand_vision_tokens(
                [5, 6], [q], grid,
                image_token_id=cfg.image_token_id,
                vision_start_token_id=cfg.vision_start_token_id,
                vision_end_token_id=cfg.vision_end_token_id),
                pixel_values=pixels, grid_thw=grid), m)
            for q, m in ((8, 6), (9, 4), (10, 8))
        ]
        oracle = [
            eng.generate(**r, max_new_tokens=m, eos_token_ids=(-1,)).tokens
            for r, m in reqs
        ]
        bat = ContinuousBatcher(eng, n_slots=2, t_max=128, chunk=4)
        try:
            with cf.ThreadPoolExecutor(max_workers=len(reqs)) as ex:
                futs = [ex.submit(bat.submit, r, m, (-1,))
                        for r, m in reqs]
                results = [f.result(timeout=600) for f in futs]
        finally:
            bat.shutdown()
        for res, want in zip(results, oracle):
            assert res.tokens == want

    def test_per_request_eos_sets(self, setup):
        """Different requests may stop on different tokens (host-side eos:
        slots are independent)."""
        eng, ids_for, pixels, grid = setup
        req = dict(input_ids=ids_for([8, 9]), pixel_values=pixels,
                   grid_thw=grid)
        free = eng.generate(**req, max_new_tokens=10,
                            eos_token_ids=(-1,)).tokens
        assert len(free) == 10
        stop_a = (free[3],)  # stops request A early
        want_a = eng.generate(**req, max_new_tokens=10,
                              eos_token_ids=stop_a).tokens
        bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4)
        try:
            with cf.ThreadPoolExecutor(max_workers=2) as ex:
                fa = ex.submit(bat.submit, req, 10, stop_a)
                fb = ex.submit(bat.submit, req, 10, (-1,))
                ra, rb = fa.result(timeout=600), fb.result(timeout=600)
        finally:
            bat.shutdown()
        assert ra.tokens == want_a, (ra.tokens, want_a)
        assert rb.tokens == free

    def test_too_long_request_falls_back(self, setup):
        eng, ids_for, pixels, grid = setup
        req = dict(input_ids=ids_for([8, 9]), pixel_values=pixels,
                   grid_thw=grid)
        want = eng.generate(**req, max_new_tokens=6,
                            eos_token_ids=(-1,)).tokens
        bat = ContinuousBatcher(eng, n_slots=2, t_max=8, chunk=4)
        try:
            res = bat.submit(req, 6, (-1,))
        finally:
            bat.shutdown()
        assert res.tokens == want
        assert bat.stats["rejected_too_long"] == 1

    def test_max_new_one(self, setup):
        eng, ids_for, pixels, grid = setup
        req = dict(input_ids=ids_for([8, 9]), pixel_values=pixels,
                   grid_thw=grid)
        want = eng.generate(**req, max_new_tokens=1,
                            eos_token_ids=(-1,)).tokens
        bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4)
        try:
            res = bat.submit(req, 1, (-1,))
        finally:
            bat.shutdown()
        assert res.tokens == want

    def test_ov_family(self):
        """Family-agnostic: the OV engine's deferred prefill slots into the
        same pool machinery."""
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
        req = dict(input_ids=ids, pixel_values=pixels, grid_thw=grid)
        want = eng.generate(**req, max_new_tokens=7,
                            eos_token_ids=(-1,)).tokens
        bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4)
        try:
            with cf.ThreadPoolExecutor(max_workers=2) as ex:
                fa = ex.submit(bat.submit, req, 7, (-1,))
                fb = ex.submit(bat.submit, req, 7, (-1,))
                ra, rb = fa.result(timeout=600), fb.result(timeout=600)
        finally:
            bat.shutdown()
        assert ra.tokens == want and rb.tokens == want
        # repetition_penalty rides the same family-agnostic presence pool
        want_rp = eng.generate(**req, max_new_tokens=7, eos_token_ids=(-1,),
                               repetition_penalty=1.4).tokens
        bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4)
        try:
            got = bat.submit(dict(req), 7, (-1,), repetition_penalty=1.4)
            assert got.tokens == want_rp
        finally:
            bat.shutdown()
        # the speculative program is family-agnostic too
        bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4,
                                speculative=3)
        try:
            rc = bat.submit(req, 7, (-1,))
        finally:
            bat.shutdown()
        assert rc.tokens == want, (rc.tokens, want)
        # and the int8 pool (deterministic; exactness not asserted —
        # int8 rounding exceeds random-weight argmax gaps)
        bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4,
                                kv_int8=True)
        try:
            r1 = bat.submit(req, 7, (-1,))
            r2 = bat.submit(req, 7, (-1,))
        finally:
            bat.shutdown()
        assert r1.tokens == r2.tokens and len(r1.tokens) == 7

    def test_prefix_cached_admission(self, setup):
        """With a PrefixCacheStore attached, admission prefills through the
        prefix cache: same-image different-question requests hit, and
        outputs still equal the per-request oracle."""
        from visionselector_tpu.models.qwen25vl.model import (
            PrefixCacheStore,
        )

        eng, ids_for, pixels, grid = setup
        store = PrefixCacheStore(min_prefix=1)
        qs = [[8, 9], [8, 40, 41], [8, 50]]
        oracle = [
            eng.generate(input_ids=ids_for(q), pixel_values=pixels,
                         grid_thw=grid, max_new_tokens=6,
                         eos_token_ids=(-1,)).tokens
            for q in qs
        ]
        bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4,
                                prefix_store=store)
        try:
            results = [
                bat.submit(dict(input_ids=ids_for(q), pixel_values=pixels,
                                grid_thw=grid), 6, (-1,))
                for q in qs
            ]
        finally:
            bat.shutdown()
        for res, want in zip(results, oracle):
            assert res.tokens == want, (res.tokens, want)
        assert store.misses == 1 and store.hits == 2

    def test_sampled_slots_match_one_shot(self, setup):
        """Per-slot sampling: a sampled request decoding alongside a greedy
        one reproduces its one-shot ``generate(temperature, seed)`` rollout
        exactly (same per-step key-split stream), and the greedy neighbor
        is untouched.

        temperature is kept LOW (0.3): batched (S-slot) and single decode
        logits differ by ~1 ulp (fp32 reduction order), and with random
        near-uniform weights a high-temperature nucleus draw flips on such
        noise; sharpening the distribution makes the draw robust while
        still diverging from greedy (asserted below). seed 11: seed 7 sat
        exactly on a draw boundary for the grouped-query decode attention's
        reduction order (9/10 probed seed/temp combos are stable)."""
        eng, ids_for, pixels, grid = setup
        req_s = dict(input_ids=ids_for([8, 9]), pixel_values=pixels,
                     grid_thw=grid)
        req_g = dict(input_ids=ids_for([40, 41]), pixel_values=pixels,
                     grid_thw=grid)
        want_s = eng.generate(**req_s, max_new_tokens=10,
                              eos_token_ids=(-1,), temperature=0.3,
                              top_p=0.9, seed=11).tokens
        want_g = eng.generate(**req_g, max_new_tokens=10,
                              eos_token_ids=(-1,)).tokens
        # sanity: sampling actually diverges from greedy for this prompt
        greedy_s = eng.generate(**req_s, max_new_tokens=10,
                                eos_token_ids=(-1,)).tokens
        assert want_s != greedy_s
        bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4)
        try:
            with cf.ThreadPoolExecutor(max_workers=2) as ex:
                fs = ex.submit(bat.submit, req_s, 10, (-1,), 0.3, 0.9, 11)
                fg = ex.submit(bat.submit, req_g, 10, (-1,))
                rs, rg = fs.result(timeout=600), fg.result(timeout=600)
        finally:
            bat.shutdown()
        assert rs.tokens == want_s, (rs.tokens, want_s)
        assert rg.tokens == want_g, (rg.tokens, want_g)

    def test_sampling_knobs_ride_in_request_dict(self, setup):
        """serve's MicroBatcher-compatible call shape: sampling params in
        the request dict are honored (and popped before engine kwargs)."""
        eng, ids_for, pixels, grid = setup
        req = dict(input_ids=ids_for([8, 9]), pixel_values=pixels,
                   grid_thw=grid)
        want = eng.generate(**req, max_new_tokens=8, eos_token_ids=(-1,),
                            temperature=0.3, top_p=0.9, seed=3).tokens
        bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4)
        try:
            res = bat.submit({**req, "temperature": 0.3, "top_p": 0.9,
                              "seed": 3}, 8, (-1,))
        finally:
            bat.shutdown()
        assert res.tokens == want, (res.tokens, want)

    def test_speculative_slots_match_oracle(self, setup):
        """Speculative mode (per-slot prompt-lookup + batched verify):
        greedy outputs are IDENTICAL to the per-request oracle — accepted
        tokens are exactly the greedy continuations — and the speculative
        chunk program actually ran."""
        eng, ids_for, pixels, grid = setup
        reqs = [
            (dict(input_ids=ids_for([8, 9]), pixel_values=pixels,
                  grid_thw=grid), 10),
            (dict(input_ids=np.asarray([7, 8, 9, 7, 8, 9, 7, 8], np.int64)),
             8),
            (dict(input_ids=ids_for([50]), pixel_values=pixels,
                  grid_thw=grid), 12),
        ]
        oracle = [
            eng.generate(**r, max_new_tokens=m, eos_token_ids=(-1,)).tokens
            for r, m in reqs
        ]
        bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4,
                                speculative=3)
        try:
            with cf.ThreadPoolExecutor(max_workers=len(reqs)) as ex:
                futs = [ex.submit(bat.submit, r, m, (-1,)) for r, m in reqs]
                results = [f.result(timeout=600) for f in futs]
        finally:
            bat.shutdown()
        for i, (res, want) in enumerate(zip(results, oracle)):
            assert res.tokens == want, (i, res.tokens, want)
        assert bat.stats["spec_steps"] >= 1
        # every spec chunk emits >= 1 token per live slot
        assert bat.stats["spec_accepted"] >= 0

    def test_spec_chunk_accepts_true_continuation(self, setup):
        """Craft a lookup window whose proposal IS the model's greedy
        continuation: one fused round must accept all m and advance the
        slot m+1 tokens (the speedup mechanism, pinned deterministically —
        no reliance on the model echoing prompts)."""
        import jax.numpy as jnp

        from visionselector_tpu.models.qwen25vl import lm as lm_mod
        from visionselector_tpu.models.qwen25vl.continuous import (
            _spec_scan_slots,
        )

        eng, ids_for, pixels, grid = setup
        state = eng.generate(
            input_ids=ids_for([8, 9]), pixel_values=pixels, grid_thw=grid,
            max_new_tokens=8, eos_token_ids=(-1,), _defer_decode=True)
        want = eng.generate(
            input_ids=ids_for([8, 9]), pixel_values=pixels, grid_thw=grid,
            max_new_tokens=8, eos_token_ids=(-1,)).tokens

        def two_slot_pool(cache):
            k2 = jnp.concatenate([cache.k, jnp.zeros_like(cache.k)], axis=1)
            v2 = jnp.concatenate([cache.v, jnp.zeros_like(cache.v)], axis=1)
            l2 = jnp.concatenate(
                [cache.length, jnp.zeros_like(cache.length)], axis=1)
            return lm_mod.KVCache(
                k=jnp.pad(k2, ((0, 0), (0, 0), (0, 16), (0, 0), (0, 0))),
                v=jnp.pad(v2, ((0, 0), (0, 0), (0, 16), (0, 0), (0, 0))),
                length=l2)

        cur = jnp.asarray([state.next_token, 0], jnp.int32)
        pos = jnp.asarray([state.start_pos, 0], jnp.int32)
        live = jnp.asarray([True, False])
        m, ngram, c = 4, 3, 32
        # window: [tail-ngram + true continuation] ... [tail-ngram]; the
        # on-device lookup finds the earlier occurrence and proposes the
        # true greedy continuation want[1:1+m]
        tail = [97, 98, state.next_token]
        buf_row = [-1] * (c - 2 * len(tail) - m) + tail + want[1:1 + m] + tail
        buf = jnp.asarray([buf_row, [-1] * c], jnp.int32)
        temps = jnp.zeros((2,), jnp.float32)
        tps = jnp.ones((2,), jnp.float32)
        tks = jnp.zeros((2,), jnp.int32)
        keys = jnp.zeros((2, 2), jnp.uint32)
        pres = jnp.zeros((2, eng.cfg.text.vocab_size), jnp.bool_)
        rps = jnp.ones((2,), jnp.float32)
        emitted, acc, cache, _, _, _, _, _ = _spec_scan_slots(
            eng.params, two_slot_pool(state.cache), cur, pos, live, buf,
            temps, tps, tks, keys, pres, rps, eng.cfg, m, 1, ngram)
        assert int(acc[0, 0]) == m  # all proposals accepted
        assert int(acc[0, 1]) == -1  # dead slot consumes nothing
        out = np.asarray(emitted)[0, 0, : m + 1].tolist()
        assert out == want[1: 2 + m], (out, want)
        # slot cache advanced by the accepted run, dead slot restored
        assert int(np.asarray(cache.length)[0, 0]) == int(
            np.asarray(state.cache.length)[0, 0]) + m + 1
        assert int(np.asarray(cache.length)[0, 1]) == 0

    def test_device_lookup_matches_host(self):
        """The on-device prompt-lookup (fused spec rounds) proposes the
        same continuations as the host ``_prompt_lookup`` whenever the
        match lies inside the window."""
        import jax.numpy as jnp

        from visionselector_tpu.models.qwen25vl.continuous import (
            _lookup_props,
        )
        from visionselector_tpu.models.qwen25vl.model import _prompt_lookup

        rng = np.random.RandomState(0)
        c, n, m = 32, 3, 4
        for trial in range(20):
            # small alphabet -> frequent repeated n-grams
            ctx = rng.randint(0, 6, size=rng.randint(n + 1, c)).tolist()
            want = _prompt_lookup(ctx, n, m)
            buf = np.full((1, c), -1, np.int32)
            buf[0, c - len(ctx):] = ctx
            got = np.asarray(
                _lookup_props(jnp.asarray(buf), n, m))[0].tolist()
            assert got == want, (trial, ctx, got, want)

    def test_sampled_speculative_slots(self, setup):
        """Sampled slots decode through the speculative program too
        (speculative-sampling acceptance: same distribution as the plain
        sampler, different draws). The greedy neighbor stays EXACTLY its
        oracle; the sampled slot is seed-reproducible (its proposal window
        and key stream are self-contained) and diverges from greedy."""
        eng, ids_for, pixels, grid = setup
        req_s = dict(input_ids=ids_for([8, 9]), pixel_values=pixels,
                     grid_thw=grid)
        req_g = dict(input_ids=ids_for([40, 41]), pixel_values=pixels,
                     grid_thw=grid)
        greedy_s = eng.generate(**req_s, max_new_tokens=8,
                                eos_token_ids=(-1,)).tokens
        want_g = eng.generate(**req_g, max_new_tokens=8,
                              eos_token_ids=(-1,)).tokens

        def run_pair():
            bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4,
                                    speculative=3)
            try:
                with cf.ThreadPoolExecutor(max_workers=2) as ex:
                    fs = ex.submit(bat.submit, req_s, 8, (-1,), 0.3, 0.9, 7)
                    fg = ex.submit(bat.submit, req_g, 8, (-1,))
                    return fs.result(timeout=600), fg.result(timeout=600)
            finally:
                bat.shutdown()

        rs1, rg1 = run_pair()
        rs2, rg2 = run_pair()
        assert rg1.tokens == want_g, (rg1.tokens, want_g)
        assert rg2.tokens == want_g
        assert len(rs1.tokens) == 8
        assert rs1.tokens == rs2.tokens  # seed-reproducible
        assert rs1.tokens != greedy_s  # sampling actually diverges

    def test_kv_int8_quant_roundtrip_bound(self):
        """Per-row absmax int8: dequantized values are within half a
        quantization step of the original."""
        import jax.numpy as jnp

        from visionselector_tpu.models.qwen25vl import lm as lm_mod

        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 3, 4, 24).astype(np.float32))
        q, s = lm_mod.quantize_kv(x)
        back = lm_mod.dequantize_kv(q, s, jnp.float32)
        step = np.asarray(s)[..., None]
        assert np.all(np.abs(np.asarray(back - x)) <= step / 2 + 1e-6)

    def test_kv_int8_step_logit_drift_bounded(self, setup):
        """A decode step against the int8-quantized cache lands close to
        the full-precision step (small relative logit drift — the serving
        tradeoff the flag buys memory with)."""
        import jax.numpy as jnp

        from visionselector_tpu.models.qwen25vl import lm as lm_mod

        eng, ids_for, pixels, grid = setup
        state = eng.generate(
            input_ids=ids_for([8, 9]), pixel_values=pixels, grid_thw=grid,
            max_new_tokens=4, eos_token_ids=(-1,), _defer_decode=True)
        cache = state.cache
        k8, ks = lm_mod.quantize_kv(cache.k)
        v8, vs = lm_mod.quantize_kv(cache.v)
        qcache = lm_mod.QuantKVCache(k=k8, v=v8, k_scale=ks, v_scale=vs,
                                     length=cache.length)
        tok = jnp.asarray(state.next_token, jnp.int32)
        embed = lm_mod.embed_tokens(eng.params["lm"], tok[None])[None]
        pos3 = jnp.broadcast_to(
            jnp.asarray(state.start_pos, jnp.int32), (3, 1, 1))
        h_f, _ = lm_mod.lm_decode_step(
            eng.params["lm"], cache, embed, pos3, eng.cfg.text)
        h_q, c_q = lm_mod.lm_decode_step(
            eng.params["lm"], qcache, embed, pos3, eng.cfg.text)
        lf = lm_mod.lm_head(eng.params["lm"], h_f[0, 0], eng.cfg.text)
        lq = lm_mod.lm_head(eng.params["lm"], h_q[0, 0], eng.cfg.text)
        rel = float(jnp.max(jnp.abs(lf - lq)) / jnp.max(jnp.abs(lf)))
        assert rel < 0.05, rel
        assert isinstance(c_q, lm_mod.QuantKVCache)
        assert int(np.asarray(c_q.length)[0, 0]) == int(
            np.asarray(cache.length)[0, 0]) + 1

    def test_kv_int8_pool_serves_deterministically(self, setup):
        """End-to-end int8 pool (plain and speculative): requests complete
        with the right lengths, rollouts are deterministic across runs,
        and the pool actually holds int8 buffers. (Token-exact equality
        with the fp oracle is NOT asserted: int8 rounding shifts logits
        ~1e-2, far above the argmax ties of random tiny weights.)"""
        import jax.numpy as jnp  # noqa: F401

        from visionselector_tpu.models.qwen25vl import lm as lm_mod

        eng, ids_for, pixels, grid = setup
        reqs = [
            (dict(input_ids=ids_for([8, 9]), pixel_values=pixels,
                  grid_thw=grid), 9),
            (dict(input_ids=np.asarray([7, 8, 9, 10], np.int64)), 6),
        ]

        def run(spec):
            bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4,
                                    kv_int8=True, speculative=spec)
            try:
                out = [bat.submit(r, mx, (-1,)).tokens for r, mx in reqs]
                assert isinstance(bat.pool, lm_mod.QuantKVCache)
                assert bat.pool.k.dtype == np.int8
            finally:
                bat.shutdown()
            return out

        a1 = run(spec=0)
        a2 = run(spec=0)
        assert a1 == a2  # deterministic
        assert [len(t) for t in a1] == [9, 6]
        b1 = run(spec=3)
        b2 = run(spec=3)
        assert b1 == b2
        assert [len(t) for t in b1] == [9, 6]

    def test_kv_int4_quant_roundtrip_bound(self):
        """Per-row absmax int4 (packed S4): dequantized values are within
        half a (coarser, absmax/7) quantization step of the original."""
        import jax.numpy as jnp

        from visionselector_tpu.models.qwen25vl import lm as lm_mod

        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 3, 4, 24).astype(np.float32))
        q, s = lm_mod.quantize_kv(x, jnp.int4)
        assert q.dtype == jnp.int4
        back = lm_mod.dequantize_kv(q, s, jnp.float32)
        step = np.asarray(s)[..., None]
        assert np.all(np.abs(np.asarray(back - x)) <= step / 2 + 1e-6)

    def test_kv_int4_step_logit_drift_bounded(self, setup):
        """Decode step against an int4 pool stays within a (looser than
        int8) relative logit drift bound, and carries the int4 dtype."""
        import jax.numpy as jnp

        from visionselector_tpu.models.qwen25vl import lm as lm_mod

        eng, ids_for, pixels, grid = setup
        state = eng.generate(
            input_ids=ids_for([8, 9]), pixel_values=pixels, grid_thw=grid,
            max_new_tokens=4, eos_token_ids=(-1,), _defer_decode=True)
        cache = state.cache
        k4, ks = lm_mod.quantize_kv(cache.k, jnp.int4)
        v4, vs = lm_mod.quantize_kv(cache.v, jnp.int4)
        qcache = lm_mod.QuantKVCache(k=k4, v=v4, k_scale=ks, v_scale=vs,
                                     length=cache.length)
        tok = jnp.asarray(state.next_token, jnp.int32)
        embed = lm_mod.embed_tokens(eng.params["lm"], tok[None])[None]
        pos3 = jnp.broadcast_to(
            jnp.asarray(state.start_pos, jnp.int32), (3, 1, 1))
        h_f, _ = lm_mod.lm_decode_step(
            eng.params["lm"], cache, embed, pos3, eng.cfg.text)
        h_q, c_q = lm_mod.lm_decode_step(
            eng.params["lm"], qcache, embed, pos3, eng.cfg.text)
        lf = lm_mod.lm_head(eng.params["lm"], h_f[0, 0], eng.cfg.text)
        lq = lm_mod.lm_head(eng.params["lm"], h_q[0, 0], eng.cfg.text)
        rel = float(jnp.max(jnp.abs(lf - lq)) / jnp.max(jnp.abs(lf)))
        assert rel < 0.25, rel  # 4-bit rounding: bounded, not tight
        assert c_q.k.dtype == jnp.int4
        assert int(np.asarray(c_q.length)[0, 0]) == int(
            np.asarray(cache.length)[0, 0]) + 1

    def test_kv_int4_pool_serves_deterministically(self, setup):
        """End-to-end int4 pool: completes with the right lengths,
        deterministic across runs, pool holds packed-S4 buffers (quarter
        the bf16 pool bytes)."""
        import jax.numpy as jnp

        from visionselector_tpu.models.qwen25vl import lm as lm_mod

        eng, ids_for, pixels, grid = setup
        reqs = [
            (dict(input_ids=ids_for([8, 9]), pixel_values=pixels,
                  grid_thw=grid), 9),
            (dict(input_ids=np.asarray([7, 8, 9, 10], np.int64)), 6),
        ]

        def run():
            bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4,
                                    kv_quant="int4")
            try:
                out = [bat.submit(r, mx, (-1,)).tokens for r, mx in reqs]
                assert isinstance(bat.pool, lm_mod.QuantKVCache)
                assert bat.pool.k.dtype == jnp.int4
            finally:
                bat.shutdown()
            return out

        a1 = run()
        a2 = run()
        assert a1 == a2
        assert [len(t) for t in a1] == [9, 6]

    def test_kv_quant_flag_validation_and_alias(self, setup):
        import jax.numpy as jnp  # noqa: F401

        eng, *_ = setup
        with pytest.raises(ValueError):
            ContinuousBatcher(eng, n_slots=1, t_max=64, kv_quant="fp8"
                              ).shutdown()
        bat = ContinuousBatcher(eng, n_slots=1, t_max=64, kv_int8=True)
        try:
            assert bat.kv_quant == "int8" and bat.kv_int8
        finally:
            bat.shutdown()

    def test_shutdown_rejects_queued(self, setup):
        eng, ids_for, pixels, grid = setup
        bat = ContinuousBatcher(eng, n_slots=1, t_max=256, chunk=4)
        bat.shutdown()
        with pytest.raises(RuntimeError):
            bat.submit(dict(input_ids=np.asarray([1, 2], np.int64)), 4,
                       (-1,))


def test_blocked_decode_attn_matches_oracle(setup):
    """ContinuousBatcher(decode_attn="blocked_interpret"): the length-aware
    Pallas decode kernel produces the same rollouts as the dense path and
    the one-shot oracle (incl. a text-only slot and mixed lengths)."""
    eng, ids_for, pixels, grid = setup
    reqs = [
        (dict(input_ids=ids_for([8, 9]), pixel_values=pixels,
              grid_thw=grid), 10),
        (dict(input_ids=np.asarray([7, 8, 9, 10], np.int64)), 6),
        (dict(input_ids=ids_for([50, 51, 52]), pixel_values=pixels,
              grid_thw=grid), 13),
    ]
    oracle = [
        eng.generate(**r, max_new_tokens=m, eos_token_ids=(-1,)).tokens
        for r, m in reqs
    ]
    bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4,
                            decode_attn="blocked_interpret")
    try:
        with cf.ThreadPoolExecutor(max_workers=len(reqs)) as ex:
            futs = [ex.submit(bat.submit, r, m, (-1,)) for r, m in reqs]
            results = [f.result(timeout=600) for f in futs]
    finally:
        bat.shutdown()
    for i, (res, want) in enumerate(zip(results, oracle)):
        assert res.tokens == want, (i, res.tokens, want)


def test_blocked_decode_attn_speculative_slots(setup):
    """Speculative slot rounds (lm_decode_chunk) under the blocked kernel
    stay greedy-exact."""
    eng, ids_for, pixels, grid = setup
    req = dict(input_ids=ids_for([8, 9]), pixel_values=pixels, grid_thw=grid)
    want = eng.generate(**req, max_new_tokens=10, eos_token_ids=(-1,)).tokens
    bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4,
                            speculative=3,
                            decode_attn="blocked_interpret")
    try:
        res = bat.submit(dict(req), 10, (-1,))
    finally:
        bat.shutdown()
    assert res.tokens == want, (res.tokens, want)


def test_blocked_decode_attn_int8_pool(setup):
    """kv_int8 + blocked compose: the kernel folds the int8 pool's dequant
    scales in. int8 rounding shifts logits slightly, so assert determinism
    + agreement with the dense-XLA int8 pool (exact: same quantized pool,
    same math), not bf16 equality."""
    eng, ids_for, pixels, grid = setup
    req = dict(input_ids=ids_for([8, 9]), pixel_values=pixels, grid_thw=grid)

    def run(decode_attn):
        bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4,
                                kv_int8=True, decode_attn=decode_attn)
        try:
            return bat.submit(dict(req), 10, (-1,)).tokens
        finally:
            bat.shutdown()

    dense = run(None)
    blocked = run("blocked_interpret")
    assert blocked == dense, (blocked, dense)


def test_auto_window_matches_oracle(setup):
    """auto_window: bucketed static attention windows produce exactly the
    oracle rollouts — mixed lengths, mid-flight joins, slot reuse (the
    window re-buckets as lengths grow and slots come and go)."""
    eng, ids_for, pixels, grid = setup
    reqs = [
        (dict(input_ids=ids_for([8, 9]), pixel_values=pixels,
              grid_thw=grid), 12),
        (dict(input_ids=np.asarray([7, 8, 9, 10], np.int64)), 9),
        (dict(input_ids=ids_for([50]), pixel_values=pixels,
              grid_thw=grid), 16),
        (dict(input_ids=np.asarray([30, 31], np.int64)), 3),
    ]
    oracle = [
        eng.generate(**r, max_new_tokens=m, eos_token_ids=(-1,)).tokens
        for r, m in reqs
    ]
    bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4,
                            auto_window=True)
    bat._window_quantum = 64  # tiny pool: exercise >1 bucket
    try:
        with cf.ThreadPoolExecutor(max_workers=len(reqs)) as ex:
            futs = [ex.submit(bat.submit, r, m, (-1,)) for r, m in reqs]
            results = [f.result(timeout=600) for f in futs]
    finally:
        bat.shutdown()
    for i, (res, want) in enumerate(zip(results, oracle)):
        assert res.tokens == want, (i, res.tokens, want)


def test_auto_window_speculative_matches_oracle(setup):
    """auto_window under fused speculative rounds: host_len stays in sync
    with the device lengths (accepted+1 per round) and rollouts stay
    greedy-exact."""
    eng, ids_for, pixels, grid = setup
    req = dict(input_ids=ids_for([8, 9]), pixel_values=pixels, grid_thw=grid)
    want = eng.generate(**req, max_new_tokens=12, eos_token_ids=(-1,)).tokens
    bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4,
                            speculative=3, auto_window=True)
    bat._window_quantum = 64
    try:
        r1 = bat.submit(dict(req), 12, (-1,))
        r2 = bat.submit(dict(req), 12, (-1,))
    finally:
        bat.shutdown()
    assert r1.tokens == want, (r1.tokens, want)
    assert r2.tokens == want


def test_auto_window_host_len_tracks_device(setup):
    """After a dispatch, host_len equals the device pool's max-over-layers
    length for each live slot."""
    eng, ids_for, pixels, grid = setup
    req = dict(input_ids=ids_for([8, 9]), pixel_values=pixels, grid_thw=grid)
    bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4,
                            auto_window=True)
    try:
        bat.submit(dict(req), 8, (-1,))
        dev_len = np.asarray(bat.pool.length).max(axis=0)  # [S]
        for s in range(bat.n_slots):
            if bat.slots[s] is None and bat.host_len[s]:
                # freed slot: host_len must still match its last device len
                assert bat.host_len[s] == dev_len[s], (
                    s, bat.host_len[s], dev_len[s])
    finally:
        bat.shutdown()


def test_ov_family_continuous_matches_oracle():
    """The batcher is engine-generic: LLaVA-OV-1.5 requests ride the same
    slot pool (RICE admission prefill via _defer_decode, shared Qwen3-flag
    decoder chunk program) and match the one-shot OV oracle."""
    from visionselector_tpu.core.config import llava_ov_tiny
    from visionselector_tpu.models.llava_ov15.model import (
        OVEngine,
        init_ov_params,
    )
    from visionselector_tpu.preprocess.image import preprocess_image
    from visionselector_tpu.preprocess.rope import expand_vision_tokens

    cfg = llava_ov_tiny()
    eng = OVEngine(cfg, init_ov_params(jax.random.PRNGKey(0), cfg),
                   use_selector=True, budget=0.5)
    img = (np.random.RandomState(0).rand(56, 84, 3) * 255).astype(np.uint8)
    px, grid = preprocess_image(
        img, min_pixels=1, max_pixels=10**9,
        temporal_patch_size=cfg.vision.temporal_patch_size)
    ids = expand_vision_tokens(
        [5, 6, 7], [8, 9], grid,
        image_token_id=cfg.image_token_id,
        vision_start_token_id=cfg.vision_start_token_id,
        vision_end_token_id=cfg.vision_end_token_id)
    req = dict(input_ids=ids, pixel_values=px, grid_thw=grid)
    want = eng.generate(**req, max_new_tokens=8, eos_token_ids=(-1,)).tokens
    bat = ContinuousBatcher(eng, n_slots=2, t_max=256, chunk=4)
    try:
        r1 = bat.submit(dict(req), 8, (-1,))
        r2 = bat.submit(dict(req), 8, (-1,))
    finally:
        bat.shutdown()
    assert r1.tokens == want, (r1.tokens, want)
    assert r2.tokens == want
