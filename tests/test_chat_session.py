"""Multi-turn chat sessions with KV reuse: a follow-up turn appends its
tokens through one chunked forward instead of re-prefilling the whole
(vision-heavy) conversation, and must produce the same greedy answer as a
from-scratch prefill over the concatenated token stream."""

import jax
import jax.numpy as jnp
import numpy as np

from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.models.qwen25vl.model import (
    QwenVLEngine,
    continue_chat_session,
    init_params,
    start_chat_session,
)


class TestChatSession:
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

    def test_first_turn_matches_plain_generate(self):
        eng, ids, pixels, grid = self._setup()
        ref = eng.generate(ids, pixels, grid, max_new_tokens=6,
                           eos_token_ids=(-1,))
        res, sess = start_chat_session(eng, ids, pixels, grid,
                                       max_new_tokens=6,
                                       eos_token_ids=(-1,))
        assert res.tokens == ref.tokens
        assert sess.pending == ref.tokens[-1]

    def test_sampled_turns(self):
        """Per-turn sampling: a sampled first turn equals the one-shot
        sampled generate (same key stream); a sampled follow-up turn is
        seed-reproducible and diverges from the greedy follow-up.

        temperature 0.3: high-temperature draws flip on ~1 ulp logit
        noise with random near-uniform weights (see test_continuous)."""
        eng, ids, pixels, grid = self._setup()
        ref = eng.generate(ids, pixels, grid, max_new_tokens=6,
                           eos_token_ids=(-1,), temperature=0.3,
                           top_p=0.9, seed=5)
        res, sess = start_chat_session(eng, ids, pixels, grid,
                                       max_new_tokens=6,
                                       eos_token_ids=(-1,),
                                       temperature=0.3, top_p=0.9, seed=5)
        assert res.tokens == ref.tokens, (res.tokens, ref.tokens)

        turn2 = np.array([41, 42, 43])
        g2, _ = continue_chat_session(eng, sess, turn2, max_new_tokens=6)
        s2a, _ = continue_chat_session(eng, sess, turn2, max_new_tokens=6,
                                       temperature=0.3, top_p=0.9, seed=2)
        s2b, _ = continue_chat_session(eng, sess, turn2, max_new_tokens=6,
                                       temperature=0.3, top_p=0.9, seed=2)
        assert s2a.tokens == s2b.tokens  # seed-reproducible
        assert s2a.tokens != g2.tokens  # sampling actually diverges

    def test_second_turn_matches_from_scratch_prefill(self):
        """Turn 2 via KV reuse == generating over the concatenated stream
        [prompt, answer1, turn2] from scratch (CPU fp32 greedy)."""
        eng, ids, pixels, grid = self._setup()
        res1, sess = start_chat_session(eng, ids, pixels, grid,
                                        max_new_tokens=5,
                                        eos_token_ids=(-1,))
        turn2 = np.array([41, 42, 43])
        res2, sess2 = continue_chat_session(eng, sess, turn2,
                                            max_new_tokens=5)

        # from-scratch oracle: full token stream through a fresh prefill.
        # sess consumed: prompt + res1 tokens (all emitted tokens get
        # consumed when decode runs to budget) + turn2.
        full = np.concatenate([np.asarray(ids), np.asarray(res1.tokens),
                               turn2]).astype(np.int64)
        ref = eng.generate(full, pixels, grid, max_new_tokens=5,
                           eos_token_ids=(-1,))
        assert res2.tokens == ref.tokens, (res2.tokens, ref.tokens)
        assert sess2.pos > sess.pos

    def test_third_turn_continues(self):
        eng, ids, pixels, grid = self._setup()
        _, sess = start_chat_session(eng, ids, pixels, grid,
                                     max_new_tokens=4, eos_token_ids=(-1,))
        r2, sess = continue_chat_session(eng, sess, np.array([41, 42]),
                                         max_new_tokens=4)
        r3, sess = continue_chat_session(eng, sess, np.array([77]),
                                         max_new_tokens=4)
        assert len(r2.tokens) == 4 and len(r3.tokens) == 4
