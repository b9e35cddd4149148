"""Group Relative Policy Optimization (reference parity:
``llava-ov-15/src/train/train_grpo.py`` + ``src/trainer/grpo_trainer.py`` —
trl's ``GRPOTrainer`` subclassed for the Qwen-VL input surface, plus
``src/train/reward_funcs.py``).

Semantics reproduced (``grpo_trainer.py``):
- rollout: ``num_generations`` sampled completions per prompt
  (:814-900), completion masked after the first EOS (:901-907).
- group-relative advantage: ``A = r - mean_group``, optionally
  ``/ (std_group + 1e-4)`` with torch's unbiased std (:997-1005).
- clipped token-level surrogate (:1117-1160): ``coef1 = exp(pi - old)``,
  ``coef2 = clamp(coef1, 1-eps_low, 1+eps_high)``,
  ``loss = -min(coef1*A, coef2*A) (+ beta * KL(pi || ref))`` with
  ``KL = exp(ref-pi) - (ref-pi) - 1``; ``old = detach(pi)`` in the
  single-iteration regime the reference runs (num_iterations == 1,
  :922-928).
- loss reductions ``grpo`` / ``bnpo`` / ``dr_grpo`` (:1150-1157).
- reward functions by name suffix ``*_reward`` (``reward_funcs.py``):
  accuracy (``<answer>`` extraction + exact/numeric match) and format
  (``<think>..</think><answer>..</answer>``).

TPU-native shape: rollouts ride the existing ``QwenVLEngine`` sampling
decode (one compiled decode program, distinct seeds per group member — no
vLLM side-car process); scoring is ONE jitted step that vmaps the
uncompressed train forward over the stacked [B*G] completion batch, with
the frozen reference params as a non-differentiated argument (same
program-shape trick as ``train/dpo.py``).
"""

from __future__ import annotations

import functools
import re
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from visionselector_tpu.core.config import VLConfig
from visionselector_tpu.train.loss import IGNORE_INDEX, TrainBatchSample
from visionselector_tpu.train.sft import SFTScheduleConfig, make_optimizer


class GRPOScheduleConfig(NamedTuple):
    total_steps: int = 1000
    lr: float = 1e-6  # trl GRPO default scale
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    max_grad_norm: float = 1.0
    remat: bool = False
    beta: float = 0.04  # KL weight (trl default; 0 skips the ref forward)
    epsilon_low: float = 0.2
    epsilon_high: float = 0.2
    loss_type: str = "grpo"  # "grpo" | "bnpo" | "dr_grpo"
    num_generations: int = 4
    scale_rewards: bool = True
    temperature: float = 1.0
    top_p: float = 1.0
    max_completion_length: int = 64
    tune_mm_vision: bool = False
    tune_mm_mlp: bool = False
    tune_mm_llm: bool = True
    lora_rank: int = 0

    def sft_view(self) -> SFTScheduleConfig:
        return SFTScheduleConfig(
            total_steps=self.total_steps, lr=self.lr,
            weight_decay=self.weight_decay, warmup_ratio=self.warmup_ratio,
            max_grad_norm=self.max_grad_norm, remat=self.remat,
            tune_mm_vision=self.tune_mm_vision,
            tune_mm_mlp=self.tune_mm_mlp, tune_mm_llm=self.tune_mm_llm,
            lora_rank=self.lora_rank,
        )


class GRPOState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def init_grpo_state(params: dict, sched: GRPOScheduleConfig) -> GRPOState:
    opt = make_optimizer(params, sched.sft_view())
    return GRPOState(params=params, opt_state=opt.init(params),
                     step=jnp.zeros((), jnp.int32))


def group_advantages(
    rewards: np.ndarray, num_generations: int, scale_rewards: bool = True,
) -> np.ndarray:
    """[B*G] rewards -> group-relative advantages (``grpo_trainer.py``
    :997-1005; std is torch's unbiased/ddof=1)."""
    if num_generations < 2:
        raise ValueError(
            "GRPO needs num_generations >= 2 (a 1-member group has no "
            "relative advantage; trl rejects this too)")
    r = np.asarray(rewards, np.float32).reshape(-1, num_generations)
    adv = r - r.mean(axis=1, keepdims=True)
    if scale_rewards:
        std = r.std(axis=1, keepdims=True, ddof=1)
        adv = adv / (std + 1e-4)
    return adv.reshape(-1)


def per_token_logps(
    params: dict, sample: TrainBatchSample, cfg: VLConfig,
    remat: bool = False, temperature: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """(per-token log P(label | prefix) zeroed outside the completion,
    completion-position mask), both [T_pad - 1]. The completion region is
    where labels != IGNORE_INDEX — exactly the SFT/DPO convention. Works
    for both families (sample-type dispatch via ``sft.forward_logits``).
    ``temperature`` divides the logits so the scored distribution matches
    the SAMPLING distribution of the rollouts (trl ``_get_per_token_logps``
    scales by ``self.temperature``)."""
    from visionselector_tpu.train.sft import forward_logits

    logits = forward_logits(params, sample, cfg, remat=remat)
    logits = logits[:-1].astype(jnp.float32) / temperature
    labels = sample.labels[1:]
    valid = labels != IGNORE_INDEX
    safe = jnp.where(valid, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
    return (gold - logz) * valid, valid


@functools.partial(jax.jit, static_argnames=("cfg", "sched"))
def grpo_train_step(
    state: GRPOState,
    ref_params: dict,
    batch: TrainBatchSample,
    advantages: jax.Array,
    cfg: VLConfig,
    sched: GRPOScheduleConfig,
) -> Tuple[GRPOState, dict]:
    """One GRPO update on a stacked [B*G] completion batch with
    precomputed advantages [B*G] (host-side reward + group normalization).
    ``ref_params`` is the frozen reference policy (used when beta > 0)."""

    def logps(params):
        return jax.vmap(
            lambda s: per_token_logps(params, s, cfg, remat=sched.remat,
                                      temperature=sched.temperature)
        )(batch)

    if sched.beta > 0.0:
        ref_lp, _ = logps(ref_params)  # no gradient path

    def batch_loss(params):
        pol_lp, mask = logps(params)
        maskf = mask.astype(jnp.float32)
        adv = advantages[:, None].astype(jnp.float32)
        # num_iterations == 1: old == detach(policy) (grpo_trainer.py:922-928)
        old_lp = jax.lax.stop_gradient(pol_lp)
        coef1 = jnp.exp(pol_lp - old_lp)
        coef2 = jnp.clip(coef1, 1.0 - sched.epsilon_low,
                         1.0 + sched.epsilon_high)
        pt_loss = -jnp.minimum(coef1 * adv, coef2 * adv)
        metrics = {}
        if sched.beta > 0.0:
            delta = ref_lp - pol_lp
            kl = jnp.exp(delta) - delta - 1.0
            pt_loss = pt_loss + sched.beta * kl
            metrics["kl"] = (kl * maskf).sum() / jnp.maximum(maskf.sum(), 1)
        n_tok = jnp.maximum(maskf.sum(), 1.0)
        if sched.loss_type == "bnpo":
            loss = (pt_loss * maskf).sum() / n_tok
        elif sched.loss_type == "dr_grpo":
            loss = (pt_loss * maskf).sum() / (
                pt_loss.shape[0] * sched.max_completion_length)
        else:  # "grpo": per-sequence mean, then batch mean
            per_seq = (pt_loss * maskf).sum(-1) / jnp.maximum(
                maskf.sum(-1), 1.0)
            loss = per_seq.mean()
        clipped = (
            ((coef1 < 1.0 - sched.epsilon_low) & (adv < 0))
            | ((coef1 > 1.0 + sched.epsilon_high) & (adv > 0))
        )
        metrics["clip_ratio"] = (clipped * maskf).sum() / n_tok
        metrics["completion_tokens"] = maskf.sum(-1).mean()
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(batch_loss, has_aux=True)(
        state.params
    )
    opt = make_optimizer(state.params, sched.sft_view())
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = dict(metrics)
    metrics.update(loss=loss, grad_norm=optax.global_norm(grads),
                   advantage_mean=advantages.mean())
    return GRPOState(params=params, opt_state=opt_state,
                     step=state.step + 1), metrics


@functools.partial(jax.jit, static_argnames=("cfg", "sched"))
def grpo_train_step_accum(
    state: GRPOState,
    ref_params: dict,
    batch: TrainBatchSample,
    advantages: jax.Array,
    cfg: VLConfig,
    sched: GRPOScheduleConfig,
) -> Tuple[GRPOState, dict]:
    """Gradient-accumulated GRPO step: leading [A] micro axis on the
    completion batch and advantages — equivalent to ``grpo_train_step`` on
    the concatenated A*(B*G) batch, one micro-batch of activations live at
    a time. Grads sum in fp32. Only the per-sequence-mean ``grpo``
    reduction decomposes into equal-weight micro means — other loss types
    are rejected."""
    if sched.loss_type != "grpo":
        raise ValueError(
            "grpo_train_step_accum supports loss_type='grpo' only "
            "(bnpo/dr_grpo weight by global token counts and do not "
            f"decompose across micro-steps); got {sched.loss_type!r}")

    def micro_loss(params, mb, adv):
        pol_lp, mask = jax.vmap(
            lambda s: per_token_logps(params, s, cfg, remat=sched.remat,
                                      temperature=sched.temperature)
        )(mb)
        maskf = mask.astype(jnp.float32)
        advc = adv[:, None].astype(jnp.float32)
        old_lp = jax.lax.stop_gradient(pol_lp)
        coef1 = jnp.exp(pol_lp - old_lp)
        coef2 = jnp.clip(coef1, 1.0 - sched.epsilon_low,
                         1.0 + sched.epsilon_high)
        pt_loss = -jnp.minimum(coef1 * advc, coef2 * advc)
        n_tok = jnp.maximum(maskf.sum(), 1.0)
        metrics = {}
        if sched.beta > 0.0:
            ref_lp, _ = jax.vmap(
                lambda s: per_token_logps(ref_params, s, cfg,
                                          remat=sched.remat,
                                          temperature=sched.temperature)
            )(mb)
            delta = ref_lp - pol_lp
            kl = jnp.exp(delta) - delta - 1.0
            pt_loss = pt_loss + sched.beta * kl
            metrics["kl"] = (kl * maskf).sum() / n_tok
        clipped = (
            ((coef1 < 1.0 - sched.epsilon_low) & (advc < 0))
            | ((coef1 > 1.0 + sched.epsilon_high) & (advc > 0))
        )
        metrics["clip_ratio"] = (clipped * maskf).sum() / n_tok
        metrics["completion_tokens"] = maskf.sum(-1).mean()
        per_seq = (pt_loss * maskf).sum(-1) / jnp.maximum(maskf.sum(-1), 1.0)
        return per_seq.mean(), metrics

    def micro(gsum, xs):
        mb, adv = xs
        (loss, metrics), g = jax.value_and_grad(
            micro_loss, has_aux=True)(state.params, mb, adv)
        gsum = jax.tree.map(lambda a, b: a + b.astype(jnp.float32),
                            gsum, g)
        return gsum, (loss, metrics)

    zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                         state.params)
    gsum, (losses, metrics) = jax.lax.scan(micro, zeros,
                                           (batch, advantages))
    a = losses.shape[0]
    grads = jax.tree.map(lambda g, p: (g / a).astype(p.dtype),
                         gsum, state.params)
    opt = make_optimizer(state.params, sched.sft_view())
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = {k: jnp.mean(v) for k, v in dict(metrics).items()}
    metrics.update(loss=losses.mean(), grad_norm=optax.global_norm(grads),
                   advantage_mean=advantages.mean())
    return GRPOState(params=params, opt_state=opt_state,
                     step=state.step + 1), metrics


# ---------------------------------------------------------------------------
# Reward functions (reference: llava-ov-15/src/train/reward_funcs.py).
# Same contract: f(completions: [str], solution: [str], **kw) -> [float].


_ANSWER_RE = re.compile(r"<answer>(.*?)</answer>", re.DOTALL)
_FORMAT_RE = re.compile(r"<think>.*?</think>\s*<answer>.*?</answer>",
                        re.DOTALL)


def _extract_answer(text: str) -> str:
    m = _ANSWER_RE.search(text)
    return (m.group(1) if m else text).strip()


def accuracy_reward(completions: Sequence[str], solution: Sequence[str],
                    **kwargs) -> List[float]:
    """1.0 when the extracted answers match — exact string, else numeric
    equality (stand-in for the reference's math_verify symbolic check,
    ``reward_funcs.py:6-47``; math_verify is not in this environment)."""
    out = []
    for content, sol in zip(completions, solution):
        student, truth = _extract_answer(content), _extract_answer(sol)
        reward = 0.0
        if student == truth:
            reward = 1.0
        else:
            try:
                if abs(float(student) - float(truth)) < 1e-6:
                    reward = 1.0
            except ValueError:
                pass
        out.append(reward)
    return out


def format_reward(completions: Sequence[str], **kwargs) -> List[float]:
    """1.0 when the completion opens with the <think>/<answer> scaffold
    (``reward_funcs.py:50-55``; re.match semantics — anchored at start)."""
    return [1.0 if _FORMAT_RE.match(c) else 0.0 for c in completions]


REWARD_FUNCS = {"accuracy": accuracy_reward, "format": format_reward}


# ---------------------------------------------------------------------------
# Rollout: sample num_generations completions per prompt via the engine.


def rollout_group(
    engine,
    input_ids: np.ndarray,
    pixel_values: Optional[np.ndarray],
    grid_thw: Optional[np.ndarray],
    sched: GRPOScheduleConfig,
    seed: int = 0,
    eos_token_ids: Optional[Tuple[int, ...]] = None,
) -> List[np.ndarray]:
    """num_generations sampled completions for one prompt (the reference's
    per-prompt generation fan-out, ``grpo_trainer.py:843-900``) — one
    compiled decode program, a distinct seed per group member."""
    outs = []
    for g in range(sched.num_generations):
        res = engine.generate(
            input_ids, pixel_values, grid_thw,
            max_new_tokens=sched.max_completion_length,
            temperature=sched.temperature, top_p=sched.top_p,
            seed=seed * 1000003 + g,
            eos_token_ids=eos_token_ids,
        )
        outs.append(np.asarray(res.tokens, np.int32))
    return outs


def build_grpo_batch(
    cfg: VLConfig,
    image,
    prompt_before: Sequence[int],
    prompt_after: Sequence[int],
    completions: Sequence[Sequence[int]],
    budget: float,
    s_bucket: int,
    t_bucket: int,
    min_pixels: int = 56 * 56,
    max_pixels: int = 28 * 28 * 1280,
    family: str = "qwen25vl",
) -> TrainBatchSample:
    """Stack one prompt's G completions into a [G] TrainBatchSample (or
    OVTrainSample for ``family="llava_ov15"``) whose labels supervise
    exactly the completion tokens."""
    from visionselector_tpu.train.data import build_train_sample, stack_samples

    if family == "llava_ov15":
        from visionselector_tpu.train.ov_loss import build_ov_train_sample

        def builder(comp):
            return build_ov_train_sample(
                cfg, image, prompt_before, prompt_after, comp,
                budget=budget, s_bucket=s_bucket, t_bucket=t_bucket,
                min_pixels=min_pixels, max_pixels=max_pixels,
            )
    else:
        def builder(comp):
            return build_train_sample(
                cfg, image, prompt_before, prompt_after, comp,
                budget=budget, s_bucket=s_bucket, t_bucket=t_bucket,
                min_pixels=min_pixels, max_pixels=max_pixels,
            )

    return stack_samples([builder([int(t) for t in c])
                          for c in completions])


def build_grpo_sample(
    cfg,
    images: Sequence,
    prompt_ids: Sequence[int],
    slots: Sequence[int],
    completion: Sequence[int],
    budget: float,
    s_bucket: int,
    t_bucket: int,
    min_pixels: int = 56 * 56,
    max_pixels: int = 28 * 28 * 1280,
    family: str = "qwen25vl",
):
    """One rollout -> training sample supervising EXACTLY the sampled
    completion tokens (no decode/re-encode round trip, which BPE does not
    guarantee to preserve).

    ``prompt_ids`` are the RAW (unexpanded) prompt tokens; ``slots[i]`` is
    the offset where image ``i``'s vision run belongs. Multi-image records
    ride the Qwen dataset record builder (one grid row per image,
    ``data_qwen.py:233-242`` parity); the OV family is single-image, like
    its SFT record builder."""
    comp = [int(t) for t in completion]
    prompt_ids = list(prompt_ids)
    slots = list(slots)
    assert slots, "GRPO training samples need at least one image"
    if family == "llava_ov15":
        assert len(slots) == 1, "OV GRPO: single-image records"
        from visionselector_tpu.train.ov_loss import build_ov_train_sample

        return build_ov_train_sample(
            cfg, images[0], prompt_ids[: slots[0]], prompt_ids[slots[0]:],
            comp, budget=budget, s_bucket=s_bucket, t_bucket=t_bucket,
            min_pixels=min_pixels, max_pixels=max_pixels,
        )
    from visionselector_tpu.train.dataset import build_sample_from_record
    from visionselector_tpu.train.loss import IGNORE_INDEX

    rec = {
        "ids": prompt_ids + comp,
        "labels": [IGNORE_INDEX] * len(prompt_ids) + comp,
        "image": images[0],
        "images": list(images),
        "image_slot": slots[0],
        "image_slots": slots,
    }
    return build_sample_from_record(
        cfg, rec, budget=budget, s_bucket=s_bucket, t_bucket=t_bucket,
        min_pixels=min_pixels, max_pixels=max_pixels,
    )
