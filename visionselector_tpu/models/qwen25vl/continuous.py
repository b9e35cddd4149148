"""Continuous batching: requests join and leave the decode loop mid-flight.

The MicroBatcher (``api/serve.py``) coalesces requests that arrive within a
window into ONE batched decode dispatch — latecomers wait for the whole
batch to finish. This engine instead keeps a persistent pool of S decode
slots on device and advances ALL live slots ``chunk`` steps per jitted
dispatch; at every chunk boundary finished slots are freed and queued
requests are admitted into free slots. Short requests never wait for long
ones, and a request admitted mid-decode starts after at most one chunk
(~chunk × step-time). The reference serves strictly batch=1 per process
(``token_compression/selector_model.py:270``).

TPU-native design notes:
- ONE decode program for the whole lifetime: the pool is a fixed
  [L, S, T_max] KV buffer (donated through every call, so it never copies),
  and the chunk is a ``lax.scan`` of fixed length — no per-batch-size or
  per-length recompiles, unlike the power-of-two program family the
  one-shot batched path needs.
- eos detection is HOST-side on each slot's own eos set (the device never
  sees eos): slots stay fully independent — different requests may use
  different stop tokens, the cost is at most chunk-1 wasted steps for a
  row that stopped mid-chunk.
- empty slots still step (their lanes compute garbage) but their per-layer
  cache lengths are restored after the chunk, so the garbage rows sit
  above the valid length and are never attended nor accumulated.
- per-layer, per-slot cache lengths ride through unchanged, so selector,
  uncompressed, FastV-style and text-only prefills share the pool.

Per-slot sampling: each request may carry its own ``temperature``/``top_p``/
``seed``; the chunk program vmaps the one-shot nucleus sampler over slots
(greedy slots select the argmax lane), and each slot's PRNG key is split
once per step exactly like the one-shot ``_decode_loop`` — so a sampled
request's tokens equal its one-shot ``generate(..., temperature, seed)``
rollout (pinned on CPU fp32). Family-agnostic over any engine supporting
``_defer_decode`` (Qwen + OV).
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import threading
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from visionselector_tpu.models.qwen25vl import lm as lm_mod


@functools.partial(jax.jit,
                   static_argnames=("cfg", "k", "sampled", "penalized",
                                    "attn_impl", "attn_window"),
                   donate_argnums=(1, 9))
def _decode_chunk_slots(params, cache, cur, pos, live, temps, tps, tks,
                        keys, pres, rps, cfg, k: int, sampled: bool = False,
                        penalized: bool = False,
                        attn_impl: str | None = None,
                        attn_window: int | None = None):
    """Advance every slot ``k`` decode steps in one dispatch.

    cur/pos/live: [S] current token, rope position, live mask. Dead slots
    keep their token frozen and get their cache lengths restored, so a
    freed slot's state is untouched until a new request overwrites it.
    temps/tps [S] f32, tks [S] i32 (top-k, <= 0 off) and keys [S, 2] u32
    carry per-slot sampling state;
    with ``sampled=False`` (all-greedy chunk) they are dead inputs and the
    program is pure argmax. Each step splits every slot's key once —
    matching the one-shot ``_decode_loop`` RNG stream — so a slot's sampled
    rollout equals its one-shot rollout for the same seed.

    pres [S, V] bool / rps [S] f32 (both donated/dead like the sampling
    state): per-slot repetition-penalty presence masks and penalties.
    With ``penalized=True`` every step penalizes each slot's logits by HF
    processor semantics and accumulates the emitted token into the mask —
    a slot with rps == 1.0 is mathematically untouched (score/1 == score),
    so penalized and plain requests share one pool. ``penalized=False``
    keeps the feature's cost out of the common program entirely.
    Returns (toks [k, S], cache, keys, pres)."""
    len0 = cache.length
    s = cur.shape[0]

    def body(carry, _):
        if penalized:
            tok, pos_c, keys_c, pres_c, cache = carry
        else:
            tok, pos_c, keys_c, cache = carry
            pres_c = None
        embed = lm_mod.embed_tokens(params["lm"], tok)[:, None]  # [S,1,D]
        pos3 = jnp.broadcast_to(pos_c[None, :, None], (3, s, 1))
        hidden, cache = lm_mod.lm_decode_step(
            params["lm"], cache, embed, pos3, cfg.text, attn_impl=attn_impl,
            attn_window=attn_window,
        )
        logits = lm_mod.lm_head(params["lm"], hidden[:, 0], cfg.text)
        if penalized:
            from visionselector_tpu.models.qwen25vl.model import (
                _penalize_logits,
            )

            logits = _penalize_logits(logits, pres_c, rps[:, None])
        if sampled:
            from visionselector_tpu.models.qwen25vl.model import (
                _sample_token,
            )

            ks = jax.vmap(jax.random.split)(keys_c)  # [S, 2, 2]
            keys_c = ks[:, 0]
            tok2 = jax.vmap(_sample_token)(
                logits, ks[:, 1], temps, tps, tks)
            tok2 = tok2.astype(jnp.int32)
        else:
            tok2 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tok2 = jnp.where(live, tok2, tok)
        if penalized:
            # dead slots mark their frozen token — harmless, their row is
            # rewritten at the next admission
            pres_c = pres_c.at[jnp.arange(s), tok2].set(True)
        pos_c = jnp.where(live, pos_c + 1, pos_c)
        if penalized:
            return (tok2, pos_c, keys_c, pres_c, cache), tok2
        return (tok2, pos_c, keys_c, cache), tok2

    if penalized:
        (_, _, keys, pres, cache), toks = jax.lax.scan(
            body, (cur, pos, keys, pres, cache), None, length=k)
    else:
        (_, _, keys, cache), toks = jax.lax.scan(
            body, (cur, pos, keys, cache), None, length=k)
    # ._replace keeps the cache's concrete type (KVCache or QuantKVCache)
    cache = cache._replace(
        length=jnp.where(live[None, :], cache.length, len0))
    return toks, cache, keys, pres


def _lookup_props(buf: jax.Array, n: int, m: int) -> jax.Array:
    """On-device prompt-lookup over a per-slot token window.

    buf [S, C] holds each slot's most recent C tokens (oldest first, newest
    at buf[:, -1]; -1 pads). Finds the most recent EARLIER occurrence of
    the final n-gram and returns the m tokens that followed it ([S, m],
    zero-padded; all-zeros when no match) — the device analog of the host
    ``_prompt_lookup``, restricted to the window so it can run INSIDE a
    scanned multi-round dispatch (no host round trip per round)."""
    s, c = buf.shape
    tail = buf[:, c - n:]  # [S, n]
    num_w = c - n  # candidate starts, excluding the tail's own window
    windows = jnp.stack(
        [buf[:, i:i + num_w] for i in range(n)], axis=-1)  # [S, num_w, n]
    match = jnp.all(windows == tail[:, None, :], axis=-1)  # [S, num_w]
    best = jnp.max(jnp.where(match, jnp.arange(num_w)[None, :], -1), axis=1)
    has = best >= 0
    gidx = best[:, None] + n + jnp.arange(m)[None, :]  # [S, m]
    cont = jnp.take_along_axis(buf, jnp.clip(gidx, 0, c - 1), axis=1)
    return jnp.where((gidx < c) & has[:, None], cont, 0).astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "m", "rounds", "ngram",
                                    "sampled", "penalized", "attn_impl",
                                    "attn_window"),
                   donate_argnums=(1, 10))
def _spec_scan_slots(params, cache, cur, pos, live, buf, temps, tps, tks,
                     keys, pres, rps, cfg, m: int, rounds: int, ngram: int,
                     sampled: bool = False, penalized: bool = False,
                     attn_impl: str | None = None,
                     attn_window: int | None = None):
    """Fused speculative decode: ``rounds`` propose+verify cycles in ONE
    device dispatch (a lax.scan whose body does on-device prompt-lookup ->
    m+1-row verify -> acceptance -> window update).

    The single-round path emits 1..m+1 tokens per HOST round trip — through
    a high-latency link the round trips dominate and a plain chunk-of-k
    program wins (k tokens per trip guaranteed). Scanning the rounds
    on-device restores the amortization: >= rounds tokens per trip (one per
    round minimum, up to rounds*(m+1)), while each round still costs about
    one weight-stream pass — a strict superset of the plain chunk's
    schedule when rounds == chunk.

    Acceptance: greedy slots (temperature 0) keep exact greedy prefixes —
    outputs equal the plain chunk's by construction. With ``sampled=True``
    (the pool holds a sampling slot), sampled slots accept by the
    speculative-sampling rule (``_spec_accept``, point-mass draft): every
    emitted token's marginal law is EXACTLY the nucleus sampler's — same
    distribution as the plain sampled chunk, different draws. A sampled
    slot's stream is self-contained (its proposals come from its own
    window, its key splits once per round), so its rollout is
    seed-reproducible regardless of what else shares the pool.

    ``penalized=True`` (some slot has repetition_penalty != 1): a penalized
    slot rides the fused dispatch at the SEQUENTIAL rate — its proposals
    are force-rejected (a = 0) and its one emitted token per round is the
    penalized argmax (greedy) / penalized nucleus draw (sampled) of row 0's
    logits, which are conditioned only on committed tokens, so the rollout
    is EXACT HF-processor semantics (greedy: bit-equal to the sequential
    chunk). Co-resident plain slots keep full speculative speed — this
    removes the r4 cliff where one penalized request forced the whole pool
    onto the sequential path. ``pres`` [S, V] / ``rps`` [S] are dead inputs
    when ``penalized=False``.

    buf [S, C]: per-slot recent-token window for the lookup (-1 padded).
    Returns (emitted [rounds, S, m+1], accepted [rounds, S], cache, keys,
    pres, buf, cur, pos) — the host consumes accepted[r, s]+1 tokens per
    live slot per round, stopping at its eos/budget."""
    c = buf.shape[1]
    s = cur.shape[0]

    def body(carry, _):
        cur_c, pos_c, buf_c, keys_c, pres_c, cache_c = carry
        len0 = cache_c.length
        props = _lookup_props(buf_c, ngram, m)
        ids = jnp.concatenate([cur_c[:, None], props], axis=1)
        embeds = lm_mod.embed_tokens(params["lm"], ids)
        pos_rows = pos_c[:, None] + jnp.arange(m + 1)[None, :]
        pos3 = jnp.broadcast_to(pos_rows[None], (3,) + pos_rows.shape)
        hidden, cache_c = lm_mod.lm_decode_chunk(
            params["lm"], cache_c, embeds, pos3, cfg.text,
            attn_impl=attn_impl, attn_window=attn_window,
        )
        logits = lm_mod.lm_head(params["lm"], hidden, cfg.text)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        eq = props == greedy[:, :m]
        a = jnp.where(jnp.all(eq, axis=1), m,
                      jnp.argmin(eq, axis=1)).astype(jnp.int32)
        emitted = greedy
        if sampled:
            from visionselector_tpu.models.qwen25vl.model import (
                _nucleus_probs,
                _spec_accept,
            )

            probs = jax.vmap(_nucleus_probs)(logits, temps, tps, tks)
            ks = jax.vmap(jax.random.split)(keys_c)
            keys_c = ks[:, 0]
            em_s, a_s = jax.vmap(_spec_accept)(probs, props, ks[:, 1])
            is_samp = temps > 0.0
            emitted = jnp.where(is_samp[:, None], em_s, greedy)
            a = jnp.where(is_samp, a_s, a)
        if penalized:
            from visionselector_tpu.models.qwen25vl.model import (
                _penalize_logits,
            )

            # penalized slots: force-reject the proposals (a = 0) and emit
            # row 0's penalized pick — exact sequential-rate semantics;
            # plain co-resident slots keep their speculative acceptance
            pen_mask = rps != 1.0
            l0 = _penalize_logits(logits[:, 0], pres_c, rps[:, None])
            e0 = jnp.argmax(l0, axis=-1).astype(jnp.int32)
            if sampled:
                from visionselector_tpu.models.qwen25vl.model import (
                    _sample_token,
                )

                e0s = jax.vmap(_sample_token)(
                    l0, ks[:, 1], temps, tps, tks).astype(jnp.int32)
                e0 = jnp.where(temps > 0.0, e0s, e0)
            emitted = emitted.at[:, 0].set(
                jnp.where(pen_mask, e0, emitted[:, 0]))
            a = jnp.where(pen_mask, 0, a)
            pres_c = pres_c.at[jnp.arange(s), emitted[:, 0]].max(
                pen_mask & live)
        a = jnp.where(live, a, -1)  # dead slots consume nothing
        cache_c = cache_c._replace(
            length=jnp.where(live[None, :], len0 + a[None, :] + 1, len0))
        # append the a+1 emitted tokens to the window (variable per-slot
        # shift via gather over the concatenation)
        ext = jnp.concatenate([buf_c, emitted], axis=1)  # [S, C + m + 1]
        gidx = (a + 1)[:, None] + jnp.arange(c)[None, :]
        buf_c = jnp.take_along_axis(ext, gidx, axis=1)
        cur_c = jnp.where(live, emitted[jnp.arange(s), a], cur_c)
        pos_c = pos_c + jnp.where(live, a + 1, 0)
        return (cur_c, pos_c, buf_c, keys_c, pres_c, cache_c), (emitted, a)

    (cur, pos, buf, keys, pres, cache), (emitted, acc) = jax.lax.scan(
        body, (cur, pos, buf, keys, pres, cache), None, length=rounds)
    return emitted, acc, cache, keys, pres, buf, cur, pos


def window_bucket(need: int, t_max: int) -> Optional[int]:
    """Serving auto-window bucket: ``need`` tokens rounded up to the
    quantum (t_max/8, >= 512 — at most 8 compiled programs per pool), or
    None when the bucket would be the full pool anyway. Single source of
    truth for the batcher AND perf tools (tools/bench_blocked_decode.py)
    so measured window shapes always match what serving dispatches."""
    q = max(512, t_max // 8)
    w = min(t_max, -(-need // q) * q)
    return None if w >= t_max else int(w)


def _fit_t(x, t_max):
    if x.shape[2] > t_max:
        x = x[:, :, :t_max]
    pad = [(0, 0)] * x.ndim
    pad[2] = (0, t_max - x.shape[2])
    return jnp.pad(x, pad)


@functools.partial(jax.jit, donate_argnums=(0,))
def _set_presence_row(pres, row, slot):
    """Install one slot's repetition-penalty presence mask ([V] bool: the
    prompt ids + re-picked first token) into the donated [S, V] pool."""
    return jax.lax.dynamic_update_slice_in_dim(pres, row[None], slot, axis=0)


@functools.partial(jax.jit, donate_argnums=(0,))
def _insert_slot(pool, new_k, new_v, new_len, slot):
    """Scatter one request's prefill KV into pool slot ``slot`` (the pool
    cache is donated — it lives in one device allocation). ``pool`` may be
    a KVCache or a QuantKVCache; new_k/new_v arrive unquantized from the
    prefill and are quantized here when the pool is int8."""
    t_max = pool.k.shape[2]

    def put(buf, upd):
        return jax.lax.dynamic_update_slice_in_dim(
            buf, _fit_t(upd, t_max), slot, axis=1)

    ln = jax.lax.dynamic_update_slice_in_dim(pool.length, new_len, slot,
                                             axis=1)
    if isinstance(pool, lm_mod.QuantKVCache):
        k8, ks = lm_mod.quantize_kv(new_k, pool.k.dtype)
        v8, vs = lm_mod.quantize_kv(new_v, pool.v.dtype)
        return lm_mod.QuantKVCache(
            k=put(pool.k, k8), v=put(pool.v, v8),
            k_scale=put(pool.k_scale, ks), v_scale=put(pool.v_scale, vs),
            length=ln)
    return lm_mod.KVCache(k=put(pool.k, new_k), v=put(pool.v, new_v),
                          length=ln)


@dataclasses.dataclass
class _Slot:
    tokens: list
    max_new: int
    eos: Tuple[int, ...]
    result: object  # GenerationResult skeleton from the prefill
    done_event: threading.Event
    t_submit: float
    item: dict = None
    chunks: int = 0
    # prompt ids + emitted tokens, for prompt-lookup proposals
    # (speculative mode only; None otherwise)
    ctx: list = None
    # per-request speculative observability (GenerationResult.spec_*)
    spec_proposed: int = 0
    spec_accepted: int = 0


class ContinuousBatcher:
    """Slot-based continuous-batching decode engine over one model engine.

    ``submit()`` blocks until the request's GenerationResult is ready;
    internally a single worker thread owns the engine: it prefills queued
    requests into free slots and advances all live slots one chunk per
    device dispatch. Stats (``admitted``, ``mid_flight_joins``,
    ``max_concurrent``) expose the continuous behavior for tests and
    /health."""

    def __init__(self, engine, n_slots: int = 8, t_max: int = 2048,
                 chunk: int = 8, lock: Optional[threading.Lock] = None,
                 prefix_store=None, speculative: int = 0, ngram: int = 3,
                 ctx_window: int = 128, kv_int8: bool = False,
                 prefill_chunk: int = 0, prefill_vit_segments: int = 0,
                 decode_attn: str | None = None,
                 auto_window: bool = False,
                 kv_quant: Optional[str] = None):
        self.engine = engine
        self.n_slots = n_slots
        self.t_max = t_max
        self.chunk = chunk
        # speculative > 0: every dispatch runs ``chunk`` fused on-device
        # propose+verify rounds, each verifying that many prompt-lookup
        # proposals per slot (see _spec_scan_slots); greedy slots keep
        # exact greedy prefixes, sampled slots use speculative-sampling
        # acceptance (same distribution, per-slot reproducible streams)
        self.speculative = speculative
        self.ngram = ngram
        self.ctx_window = ctx_window
        # Quantized slot pool: int8 halves, int4 quarters, pool HBM
        # (2x/4x slot capacity at the same t_max) and the per-step KV
        # read traffic; decode paths quantize on write / dequantize on
        # read (see lm.QuantKVCache). Serving opt-in — one-shot/eval
        # paths keep full-precision caches. ``kv_int8=True`` is the
        # back-compat spelling of ``kv_quant="int8"``.
        if kv_quant not in (None, "", "int8", "int4"):
            raise ValueError(f"kv_quant must be int8 or int4, got "
                             f"{kv_quant!r}")
        self.kv_quant = kv_quant or ("int8" if kv_int8 else None)
        self.kv_int8 = self.kv_quant is not None  # legacy readers
        # prefill_chunk > 0: admission prefills run SEGMENTED — one
        # vision+compaction dispatch, then prefill_chunk-token decoder
        # segments interleaved with decode chunks, so live slots stall at
        # most max(segment, vision dispatch) per iteration instead of the
        # whole fused prefill (vLLM chunked-prefill discipline)
        self.prefill_chunk = prefill_chunk
        # > 1: the vision tower of a segmented admission also runs in
        # layer groups (depth/N layers per dispatch) — for large images
        # the tower is the dominant un-chunkable dispatch otherwise
        self.prefill_vit_segments = prefill_vit_segments
        # decode-attention impl for the slot programs: "blocked" reads only
        # each slot's live prefix of the [S, t_max] pool (length-clamped
        # Pallas tile fetch) instead of the full pool every chunk — wins
        # when typical lengths sit well below t_max. Composes with
        # kv_int8=True (the kernel folds the dequant scales in, so halved
        # tile bytes AND tail skipping).
        self.decode_attn = decode_attn
        # auto_window: bound each dispatch's attention reads by a STATIC
        # bucket of the max live cache length (+ this dispatch's growth).
        # XLA fuses the static slice into the attention einsum, so per-step
        # KV traffic shrinks from t_max to the bucket with zero kernel
        # overhead — the pool is provisioned for the LONGEST admissible
        # request, but typical slots are far shorter. Costs one program
        # compile per bucket (quantum t_max/8, >= 512 — at most 8).
        # Exact: every live slot's post-dispatch length fits the window by
        # construction; dead slots may exceed it, but their outputs are
        # discarded and their lengths restored on-device.
        self.auto_window = auto_window
        # host mirror of each slot's device cache length (max over layers),
        # advanced by exactly what each dispatch consumes on-device
        self.host_len = np.zeros(n_slots, np.int64)
        self._admitting = None  # (ChunkedPrefill, item, slot_idx)
        self._last_decode_t = None  # gap tracking (max_decode_gap_ms)
        # optional external engine lock (the server's): held around device
        # work so session/streaming paths can interleave between chunks
        self.engine_lock = lock if lock is not None else threading.Lock()
        # optional cross-request KV prefix cache: admission prefills
        # through it, so slot fills skip shared (image, prompt) prefixes
        self.prefix_store = prefix_store
        self.cv = threading.Condition()
        self.queue: collections.deque = collections.deque()
        self.slots: list[Optional[_Slot]] = [None] * n_slots
        self.cur = np.zeros(n_slots, np.int32)
        self.pos = np.zeros(n_slots, np.int32)
        self.live = np.zeros(n_slots, bool)
        # per-slot sampling state (temperature 0 = greedy slot)
        self.temps = np.zeros(n_slots, np.float32)
        self.tps = np.ones(n_slots, np.float32)
        self.tks = np.zeros(n_slots, np.int32)  # top-k, <= 0 = off
        self.keys = np.zeros((n_slots, 2), np.uint32)
        # per-slot repetition penalty (1.0 = off) + the device-resident
        # [S, V] presence pool ([~1 MB] bool; lazy with the KV pool). A
        # freed slot's stale presence row is harmless: the next occupant
        # either overwrites it (penalized) or ignores it (rps == 1.0 is
        # the identity transform)
        self.rps = np.ones(n_slots, np.float32)
        self.pres = None
        # the slot-pool cache (KVCache or QuantKVCache), lazy-initialized
        self.pool = None
        self.stats = dict(admitted=0, mid_flight_joins=0, max_concurrent=0,
                          chunks=0, rejected_too_long=0,
                          prefill_chunks=0, chunked_admissions=0,
                          # max wall-clock between consecutive decode
                          # dispatches while slots were live: the worst
                          # stall a streaming request saw (admission work
                          # lands in these gaps; chunked prefill bounds it)
                          max_decode_gap_ms=0.0,
                          # spec_steps: verify rounds (one per dispatch x
                          # rounds, regardless of live-slot count);
                          # spec_accepted: accepted proposals consumed;
                          # spec_tokens: tokens actually emitted through
                          # the speculative path (all slots)
                          spec_steps=0, spec_proposed=0, spec_accepted=0,
                          spec_tokens=0)
        self._running = True
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # -- public API ------------------------------------------------------

    def submit(self, request: dict, max_new_tokens: int = 64,
               eos_token_ids: Optional[Tuple[int, ...]] = None,
               temperature: float = 0.0, top_p: float = 1.0,
               seed: int = 0, top_k: int = 0,
               repetition_penalty: float = 1.0):
        """request: generate() kwargs (input_ids, pixel_values, grid_thw);
        sampling knobs may ride in the dict or as explicit kwargs.
        Blocks until decode finishes; returns the GenerationResult.

        ``repetition_penalty`` follows HF processor semantics exactly (the
        prefill's last-row logits are penalized too): each penalized slot
        carries a presence row in a device-resident [S, V] bool pool, and
        the chunk program applies/accumulates it per step. While any
        penalized slot is live, speculative dispatches fall back to the
        plain chunk (a parallel multi-row verify cannot see tokens emitted
        earlier in the same round)."""
        request = dict(request)
        temperature = float(request.pop("temperature", temperature))
        top_p = float(request.pop("top_p", top_p))
        seed = int(request.pop("seed", seed))
        top_k = int(request.pop("top_k", top_k))
        repetition_penalty = float(
            request.pop("repetition_penalty", repetition_penalty))
        item = dict(request=request, max_new=max_new_tokens,
                    eos=eos_token_ids, done=threading.Event(),
                    temperature=temperature, top_p=top_p, seed=seed,
                    top_k=top_k, repetition_penalty=repetition_penalty,
                    result=None, error=None, t_submit=time.perf_counter())
        with self.cv:
            if not self._running:
                raise RuntimeError("batcher shut down")
            self.queue.append(item)
            self.cv.notify_all()
        item["done"].wait()
        if item["error"] is not None:
            raise item["error"]
        return item["result"]

    def shutdown(self):
        with self.cv:
            self._running = False
            self.cv.notify_all()
        self._thread.join(timeout=30)

    # -- worker ----------------------------------------------------------

    def _free_slots(self):
        busy = self._admitting[2] if self._admitting is not None else -1
        return [i for i, s in enumerate(self.slots)
                if s is None and i != busy]

    def _mark_decode(self):
        """Track the max wall gap between consecutive decode dispatches
        over a continuously-live pool (the streaming stall metric)."""
        now = time.perf_counter()
        if self._last_decode_t is not None:
            self.stats["max_decode_gap_ms"] = max(
                self.stats["max_decode_gap_ms"],
                (now - self._last_decode_t) * 1e3)
        self._last_decode_t = now

    def _init_pool(self, proto_cache):
        shp = proto_cache.k.shape  # [L, 1, T, H, D]
        full = (shp[0], self.n_slots, self.t_max, shp[3], shp[4])
        length = jnp.zeros((shp[0], self.n_slots), jnp.int32)
        self.pres = jnp.zeros(
            (self.n_slots, self.engine.cfg.text.vocab_size), jnp.bool_)
        if self.kv_quant:
            qdt = jnp.int4 if self.kv_quant == "int4" else jnp.int8
            self.pool = lm_mod.QuantKVCache(
                k=jnp.zeros(full, qdt), v=jnp.zeros(full, qdt),
                k_scale=jnp.zeros(full[:4], jnp.float32),
                v_scale=jnp.zeros(full[:4], jnp.float32),
                length=length)
        else:
            self.pool = lm_mod.KVCache(
                k=jnp.zeros(full, proto_cache.k.dtype),
                v=jnp.zeros(full, proto_cache.k.dtype), length=length)

    def _admit(self, item, slot_idx):
        """Fused one-shot admission prefill, then slot install.

        Penalized requests bypass the prefix store: its reuse path does
        not expose the prefill's last-row logits, which HF's processor
        penalizes to pick the FIRST token (one-shot
        ``generate_prefix_cached`` bypasses the store the same way)."""
        eng = self.engine
        if (self.prefix_store is not None
                and item.get("repetition_penalty", 1.0) == 1.0):
            from visionselector_tpu.models.qwen25vl.model import (
                prefix_cached_prefill,
            )

            state = prefix_cached_prefill(
                eng, self.prefix_store, **item["request"],
                max_new_tokens=item["max_new"],
                eos_token_ids=item["eos"],
            )
        else:
            state = eng.generate(
                **item["request"], max_new_tokens=item["max_new"],
                eos_token_ids=item["eos"], _defer_decode=True,
            )
        self._install(state, item, slot_idx)

    def _chunk_eligible(self, item) -> bool:
        """Chunked admission handles selector/orig vision requests on
        engines exposing ``start_chunked_prefill``; strategy captures are
        fused programs and text-only prefills are already cheap, and the
        prefix store's fused reuse path wins over segmenting."""
        return (
            self.prefill_chunk > 0
            and self.prefix_store is None
            and getattr(self.engine, "strategy", None) is None
            and hasattr(self.engine, "start_chunked_prefill")
            and (item["request"].get("pixel_values") is not None
                 or item["request"].get("pixel_values_videos") is not None)
        )

    def _install(self, state, item, slot_idx):
        """Move a finished admission prefill into slot ``slot_idx``."""
        eng = self.engine
        eos = tuple(state.eos_token_ids)
        rp = float(item.get("repetition_penalty", 1.0))
        pres_row = None
        if rp != 1.0:
            from visionselector_tpu.models.qwen25vl.model import (
                _rep_penalty_setup,
            )

            # HF semantics: the prefill's last-row logits are penalized
            # too, so the first token is re-picked before any use
            ids = np.asarray(item["request"]["input_ids"]).reshape(-1)
            pres_row, state.next_token = _rep_penalty_setup(
                eng.cfg.text.vocab_size, ids, state.logits,
                state.next_token, rp, item["temperature"], item["top_p"],
                item.get("top_k", 0), item["seed"])
        if state.next_token in eos or item["max_new"] <= 1:
            state.result.tokens = (
                [] if state.next_token in eos or item["max_new"] < 1
                else [state.next_token])
            state.result.total_seconds = (
                time.perf_counter() - item["t_submit"])
            item["result"] = state.result
            item["done"].set()
            return
        t_valid = int(np.asarray(state.cache.length).max())
        # a fused speculative dispatch may overshoot a finishing slot's
        # budget by up to chunk rounds of m+1 rows
        headroom = max(self.chunk,
                       self.chunk * (self.speculative + 1)
                       if self.speculative > 0 else 0)
        if t_valid + item["max_new"] + headroom > self.t_max:
            # request too long for the slot pool: serve it one-shot
            self.stats["rejected_too_long"] += 1
            item["result"] = eng.generate(
                **item["request"], max_new_tokens=item["max_new"],
                eos_token_ids=item["eos"],
                temperature=item["temperature"], top_p=item["top_p"],
                seed=item["seed"], top_k=item.get("top_k", 0),
                repetition_penalty=rp)
            item["done"].set()
            return
        if self.pool is None:
            self._init_pool(state.cache)
        self.pool = _insert_slot(
            self.pool, state.cache.k, state.cache.v,
            state.cache.length.astype(jnp.int32),
            jnp.asarray(slot_idx, jnp.int32))
        self.cur[slot_idx] = state.next_token
        self.pos[slot_idx] = state.start_pos
        self.live[slot_idx] = True
        self.host_len[slot_idx] = t_valid
        self.temps[slot_idx] = item["temperature"]
        self.tps[slot_idx] = item["top_p"]
        self.tks[slot_idx] = item.get("top_k", 0)
        self.rps[slot_idx] = rp
        if pres_row is not None:
            self.pres = _set_presence_row(
                self.pres, pres_row, jnp.asarray(slot_idx, jnp.int32))
        self.keys[slot_idx] = np.asarray(
            jax.random.PRNGKey(item["seed"]), np.uint32)
        ctx = None
        if self.speculative > 0:
            ids = np.asarray(item["request"]["input_ids"]).reshape(-1)
            ctx = list(map(int, ids)) + [state.next_token]
        self.slots[slot_idx] = _Slot(
            tokens=[state.next_token], max_new=item["max_new"], eos=eos,
            result=state.result, done_event=item["done"],
            t_submit=item["t_submit"], item=item, ctx=ctx)
        self.stats["admitted"] += 1
        if sum(s is not None for i, s in enumerate(self.slots)
               if i != slot_idx):
            self.stats["mid_flight_joins"] += 1
        self.stats["max_concurrent"] = max(
            self.stats["max_concurrent"],
            sum(s is not None for s in self.slots))

    def _attn_window(self, growth: int):
        """STATIC attention window for the next dispatch (or None).

        max live length + this dispatch's on-device growth, rounded up to
        the bucket quantum so the set of compiled programs stays bounded.
        None when windowing is off, nothing is live, or the bucket would
        be the full pool anyway."""
        if not self.auto_window:
            return None
        live_lens = self.host_len[self.live]
        if live_lens.size == 0:
            return None
        return window_bucket(int(live_lens.max()) + growth, self.t_max)

    def _fail_all(self, exc: Exception):
        """Deliver ``exc`` to every live slot and queued item, then mark
        the batcher dead (a poisoned pool must not serve further)."""
        with self.cv:
            self._running = False
            if self._admitting is not None:
                _, item, _ = self._admitting
                item["error"] = exc
                item["done"].set()
                self._admitting = None
            for i, slot in enumerate(self.slots):
                if slot is not None:
                    slot.item["error"] = exc
                    slot.done_event.set()
                    self.slots[i] = None
                    self.live[i] = False
            while self.queue:
                item = self.queue.popleft()
                item["error"] = exc
                item["done"].set()

    def _finalize(self, idx, slot):
        slot.result.tokens = slot.tokens[: slot.max_new]
        slot.result.total_seconds = time.perf_counter() - slot.t_submit
        slot.result.decode_dispatches = slot.chunks
        if self.speculative > 0:
            slot.result.spec_proposed = slot.spec_proposed
            slot.result.spec_accepted = slot.spec_accepted
        slot.item["result"] = slot.result
        slot.done_event.set()
        self.slots[idx] = None
        self.live[idx] = False

    def _run(self):
        while True:
            with self.cv:
                while (self._running and not self.queue
                       and not any(self.live)
                       and self._admitting is None):
                    self.cv.wait()
                if not self._running:
                    if self._admitting is not None:
                        _, item, _ = self._admitting
                        item["error"] = RuntimeError("batcher shut down")
                        item["done"].set()
                        self._admitting = None
                    for item in self.queue:
                        item["error"] = RuntimeError("batcher shut down")
                        item["done"].set()
                    return
                pending = []
                start_chunked = None
                free = self._free_slots()
                while self.queue and free and self._admitting is None:
                    item = self.queue.popleft()
                    idx = free.pop(0)
                    if self._chunk_eligible(item):
                        # one segmented admission at a time; its vision
                        # dispatch runs below, outside the cv
                        start_chunked = (item, idx)
                        break
                    pending.append((item, idx))
            for item, idx in pending:
                try:
                    with self.engine_lock:
                        self._admit(item, idx)
                except Exception as e:  # noqa: BLE001 — report to waiter
                    item["error"] = e
                    item["done"].set()
            if start_chunked is not None:
                item, idx = start_chunked
                try:
                    with self.engine_lock:
                        job = self.engine.start_chunked_prefill(
                            **item["request"], max_new_tokens=item["max_new"],
                            eos_token_ids=item["eos"],
                            prefill_chunk=self.prefill_chunk,
                            vit_segments=self.prefill_vit_segments,
                        )
                        if job is None:  # not eligible after all
                            self._admit(item, idx)
                        else:
                            self._admitting = (job, item, idx)
                except Exception as e:  # noqa: BLE001 — report to waiter
                    item["error"] = e
                    item["done"].set()
            if self._admitting is not None:
                # ONE decoder segment per loop iteration; live slots get
                # their decode chunk in between
                job, item, idx = self._admitting
                try:
                    with self.engine_lock:
                        done = job.step()
                        self.stats["prefill_chunks"] += 1
                        if done:
                            self._install(job.finish(), item, idx)
                            self._admitting = None
                            self.stats["chunked_admissions"] += 1
                except Exception as e:  # noqa: BLE001 — report to waiter
                    item["error"] = e
                    item["done"].set()
                    self._admitting = None
            if not any(self.live):
                self._last_decode_t = None
                continue
            sampled = bool(np.any(self.temps[self.live] > 0.0))
            penalized = bool(np.any(self.rps[self.live] != 1.0))
            try:
                if self.speculative > 0:
                    # penalized slots ride the fused dispatch at the
                    # sequential rate (exact per-step penalty on row 0);
                    # plain slots keep speculative speed (r4's whole-pool
                    # sequential fallback removed)
                    self._spec_round(sampled, penalized)
                    self._mark_decode()
                    continue
                with self.engine_lock:
                    toks, cache, keys, pres = _decode_chunk_slots(
                        self.engine.params, self.pool,
                        jnp.asarray(self.cur), jnp.asarray(self.pos),
                        jnp.asarray(self.live), jnp.asarray(self.temps),
                        jnp.asarray(self.tps), jnp.asarray(self.tks),
                        jnp.asarray(self.keys), self.pres,
                        jnp.asarray(self.rps),
                        self.engine.cfg, self.chunk, sampled, penalized,
                        attn_impl=self.decode_attn,
                        attn_window=self._attn_window(self.chunk),
                    )
                # device cache lengths advanced by `chunk` for every slot
                # live at dispatch (dead slots were rolled back on-device)
                self.host_len[self.live] += self.chunk
            except Exception as e:  # noqa: BLE001 — fail fast, not hang
                # A dispatch failure (runtime error, invalid pool after a
                # failed donating call) poisons the shared pool: waking
                # every waiter with the error and dying beats leaving
                # done-events unset forever; submit() then raises
                # "batcher shut down" for future callers.
                self._fail_all(e)
                return
            self.pool = cache
            self.pres = pres
            if sampled:
                # np.array (copy): np.asarray of a device array is
                # read-only, which would break the next _admit's write
                self.keys = np.array(keys)
            self.stats["chunks"] += 1
            toks = np.asarray(toks)  # [k, S] (blocks on the dispatch)
            self._mark_decode()
            for i, slot in enumerate(self.slots):
                if slot is None:
                    continue
                slot.chunks += 1
                finished = False
                for t in toks[:, i].tolist():
                    if t in slot.eos:
                        finished = True
                        break
                    slot.tokens.append(t)
                    if slot.ctx is not None:
                        slot.ctx.append(t)
                    if len(slot.tokens) >= slot.max_new:
                        finished = True
                        break
                if finished:
                    self._finalize(i, slot)
                else:
                    self.cur[i] = slot.tokens[-1]
                    self.pos[i] += self.chunk

    def _spec_round(self, sampled: bool = False, penalized: bool = False):
        """One fused speculative dispatch: ``chunk`` on-device
        propose+verify rounds per host round trip (``_spec_scan_slots``),
        then a per-round, per-slot accepted-prefix harvest. Penalized slots
        ride along at the sequential rate (see _spec_scan_slots)."""
        m = self.speculative
        rounds = self.chunk
        c = self.ctx_window
        buf = np.full((self.n_slots, c), -1, np.int32)
        for i, slot in enumerate(self.slots):
            if slot is not None:
                tail = slot.ctx[-c:]
                buf[i, c - len(tail):] = tail
        with self.engine_lock:
            emitted, acc, cache, keys, pres, _, _, _ = _spec_scan_slots(
                self.engine.params, self.pool,
                jnp.asarray(self.cur), jnp.asarray(self.pos),
                jnp.asarray(self.live), jnp.asarray(buf),
                jnp.asarray(self.temps), jnp.asarray(self.tps),
                jnp.asarray(self.tks), jnp.asarray(self.keys), self.pres,
                jnp.asarray(self.rps),
                self.engine.cfg, m, rounds, self.ngram, sampled, penalized,
                attn_impl=self.decode_attn,
                attn_window=self._attn_window(rounds * (m + 1)),
            )
        self.pool = cache
        self.pres = pres
        if sampled:
            self.keys = np.array(keys)  # np.asarray would be read-only
        self.stats["chunks"] += 1
        self.stats["spec_steps"] += rounds
        emitted = np.asarray(emitted)  # [rounds, S, m+1]
        acc = np.asarray(acc)  # [rounds, S]
        # each round advanced a live slot's device length by accepted+1
        # (dead slots report -1 and were rolled back on-device)
        self.host_len += np.sum(np.where(acc >= 0, acc + 1, 0), axis=0)
        for i, slot in enumerate(self.slots):
            if slot is None:
                continue
            slot.chunks += 1
            consumed = 0
            finished = False
            pen_slot = self.rps[i] != 1.0
            for r in range(rounds):
                a_i = int(acc[r, i])
                if not pen_slot:  # penalized slots force-reject by design
                    self.stats["spec_proposed"] += m
                    self.stats["spec_accepted"] += max(a_i, 0)
                    slot.spec_proposed += m
                    slot.spec_accepted += max(a_i, 0)
                for t in emitted[r, i, : a_i + 1].tolist():
                    if t in slot.eos:
                        finished = True
                        break
                    slot.tokens.append(t)
                    slot.ctx.append(t)
                    consumed += 1
                    if len(slot.tokens) >= slot.max_new:
                        finished = True
                        break
                if finished:
                    break
            self.stats["spec_tokens"] += consumed
            if finished:
                self._finalize(i, slot)
            else:
                self.cur[i] = slot.tokens[-1]
                self.pos[i] += consumed
