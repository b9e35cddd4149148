"""Direct Preference Optimization (reference parity:
``llava-ov-15/src/train/train_dpo.py`` + ``src/trainer/dpo_trainer.py`` —
trl's ``DPOTrainer`` subclassed for the VLM input surface).

Semantics reproduced (``dpo_trainer.py:92-185``):
- chosen/rejected share the prompt + vision inputs; per-sequence log-prob is
  the SUM of label log-probs over completion positions only (prompt masked).
- ``sigmoid`` loss: ``-logsigmoid(beta * ((pi_c - ref_c) - (pi_r - ref_r)))``
  against a FROZEN reference model (the policy's starting weights).
- ``ipo`` loss: length-normalized logps, ``(margin - 1/(2*beta))**2``.
- ``rpo_alpha``: adds ``alpha * CE(chosen)`` (the NLL term, :161-170).

TPU-native shape: one jitted step evaluates policy and reference on the
stacked [chosen; rejected] batch (the reference's ``concatenated_forward``
becomes a vmap over a [2B] sample axis — one program, XLA batches the
matmuls); the frozen reference params ride along as a non-differentiated
argument, so no second model object or weight copy exists on device beyond
the required extra forward.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from visionselector_tpu.core.config import VLConfig
from visionselector_tpu.train.loss import (
    IGNORE_INDEX,
    TrainBatchSample,
    cross_entropy,
)
from visionselector_tpu.train.sft import (
    SFTScheduleConfig,
    forward_logits,
    make_optimizer,
)


class DPOScheduleConfig(NamedTuple):
    total_steps: int = 1000
    lr: float = 5e-7  # trl DPO default scale; reference passes via CLI
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    max_grad_norm: float = 1.0
    remat: bool = False
    beta: float = 0.1  # trl default; reference --beta
    loss_type: str = "sigmoid"  # "sigmoid" | "ipo"
    rpo_alpha: float = 0.0  # > 0 adds alpha * CE(chosen)
    label_smoothing: float = 0.0  # cDPO robust smoothing (trl semantics)
    tune_mm_vision: bool = False
    tune_mm_mlp: bool = False
    tune_mm_llm: bool = True
    lora_rank: int = 0

    def sft_view(self) -> SFTScheduleConfig:
        """The freeze-policy/optimizer subset shared with SFT."""
        return SFTScheduleConfig(
            total_steps=self.total_steps, lr=self.lr,
            weight_decay=self.weight_decay, warmup_ratio=self.warmup_ratio,
            max_grad_norm=self.max_grad_norm, remat=self.remat,
            tune_mm_vision=self.tune_mm_vision,
            tune_mm_mlp=self.tune_mm_mlp, tune_mm_llm=self.tune_mm_llm,
            lora_rank=self.lora_rank,
        )


class DPOState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def init_dpo_state(params: dict, sched: DPOScheduleConfig) -> DPOState:
    opt = make_optimizer(params, sched.sft_view())
    return DPOState(params=params, opt_state=opt.init(params),
                    step=jnp.zeros((), jnp.int32))


def sequence_logps(
    params: dict, sample: TrainBatchSample, cfg: VLConfig,
    remat: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(sum log P(label | prefix) over completion positions, completion
    length, CE) for one sample. Labels use IGNORE_INDEX outside the
    completion, exactly like the SFT collator — the reference's
    ``loss_mask`` (``dpo_trainer.py:117-145``)."""
    logits = forward_logits(params, sample, cfg, remat=remat)
    logits = logits[:-1].astype(jnp.float32)
    labels = sample.labels[1:]
    valid = labels != IGNORE_INDEX
    safe = jnp.where(valid, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
    per_token = (gold - logz) * valid
    ce = -per_token.sum() / jnp.maximum(valid.sum(), 1)
    return per_token.sum(), valid.sum(), ce


def dpo_losses(
    policy_c, policy_r, ref_c, ref_r, len_c, len_r,
    sched: DPOScheduleConfig,
) -> Tuple[jax.Array, dict]:
    """Per-pair DPO loss from policy/reference sequence logps [B]."""
    beta = sched.beta
    if sched.loss_type == "ipo":
        pc = policy_c / jnp.maximum(len_c, 1)
        pr = policy_r / jnp.maximum(len_r, 1)
        rc = ref_c / jnp.maximum(len_c, 1)
        rr = ref_r / jnp.maximum(len_r, 1)
        margin = (pc - rc) - (pr - rr)
        losses = (margin - 1.0 / (2.0 * beta)) ** 2
    else:
        margin = (policy_c - ref_c) - (policy_r - ref_r)
        ls = sched.label_smoothing
        losses = (
            -jax.nn.log_sigmoid(beta * margin) * (1.0 - ls)
            - jax.nn.log_sigmoid(-beta * margin) * ls
        )
    reward_c = beta * (policy_c - ref_c)
    reward_r = beta * (policy_r - ref_r)
    metrics = {
        "rewards_chosen": reward_c.mean(),
        "rewards_rejected": reward_r.mean(),
        "reward_margin": (reward_c - reward_r).mean(),
        "reward_accuracy": (reward_c > reward_r).astype(jnp.float32).mean(),
    }
    return losses.mean(), metrics


# NOTE: no buffer donation here — the natural call pattern passes the
# policy's starting params as ref_params, and at step 0 those alias
# state.params exactly (donating would trip XLA's donated-buffer-reuse
# check: `f(donate(a), a)`).
@functools.partial(jax.jit, static_argnames=("cfg", "sched"))
def dpo_train_step(
    state: DPOState,
    ref_params: dict,
    chosen: TrainBatchSample,
    rejected: TrainBatchSample,
    cfg: VLConfig,
    sched: DPOScheduleConfig,
) -> Tuple[DPOState, dict]:
    """One DPO step on a batch of (chosen, rejected) sample pairs (leading
    batch axis on both). ``ref_params`` is the frozen reference policy."""

    def logps(params, batch):
        return jax.vmap(
            lambda s: sequence_logps(params, s, cfg, remat=sched.remat)
        )(batch)

    # Reference logps: no gradient path (ref_params is not differentiated).
    ref_c, len_c, _ = logps(ref_params, chosen)
    ref_r, len_r, _ = logps(ref_params, rejected)

    def batch_loss(params):
        pol_c, _, ce_c = logps(params, chosen)
        pol_r, _, _ = logps(params, rejected)
        loss, metrics = dpo_losses(
            pol_c, pol_r, ref_c, ref_r, len_c, len_r, sched)
        nll = ce_c.mean()
        if sched.rpo_alpha > 0:
            loss = loss + sched.rpo_alpha * nll
        metrics["nll_chosen"] = nll
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(batch_loss, has_aux=True)(
        state.params
    )
    opt = make_optimizer(state.params, sched.sft_view())
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = dict(metrics)
    metrics.update(loss=loss, grad_norm=optax.global_norm(grads))
    return DPOState(params=params, opt_state=opt_state,
                    step=state.step + 1), metrics


@functools.partial(jax.jit, static_argnames=("cfg", "sched"))
def dpo_train_step_accum(
    state: DPOState,
    ref_params: dict,
    chosen: TrainBatchSample,
    rejected: TrainBatchSample,
    cfg: VLConfig,
    sched: DPOScheduleConfig,
) -> Tuple[DPOState, dict]:
    """Gradient-accumulated DPO step over a leading [A] micro-step axis on
    both pair batches — equivalent to ``dpo_train_step`` on the
    concatenated A*B pair batch, with one micro-batch of activations live
    at a time (``lax.scan``). Grads sum in fp32."""

    def pair_loss(params, c, r):
        def lp(p, b):
            return jax.vmap(
                lambda s: sequence_logps(p, s, cfg, remat=sched.remat))(b)

        ref_c, len_c, _ = lp(ref_params, c)
        ref_r, len_r, _ = lp(ref_params, r)
        pol_c, _, ce_c = lp(params, c)
        pol_r, _, _ = lp(params, r)
        loss, metrics = dpo_losses(
            pol_c, pol_r, ref_c, ref_r, len_c, len_r, sched)
        nll = ce_c.mean()
        if sched.rpo_alpha > 0:
            loss = loss + sched.rpo_alpha * nll
        metrics["nll_chosen"] = nll
        return loss, metrics

    def micro(gsum, pair):
        c, r = pair
        (loss, metrics), g = jax.value_and_grad(
            pair_loss, has_aux=True)(state.params, c, r)
        gsum = jax.tree.map(lambda a, b: a + b.astype(jnp.float32),
                            gsum, g)
        return gsum, (loss, metrics)

    zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                         state.params)
    gsum, (losses, metrics) = jax.lax.scan(micro, zeros,
                                           (chosen, rejected))
    a = losses.shape[0]
    grads = jax.tree.map(lambda g, p: (g / a).astype(p.dtype),
                         gsum, state.params)
    opt = make_optimizer(state.params, sched.sft_view())
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = {k: jnp.mean(v) for k, v in dict(metrics).items()}
    metrics.update(loss=losses.mean(), grad_norm=optax.global_norm(grads))
    return DPOState(params=params, opt_state=opt_state,
                    step=state.step + 1), metrics


def build_dpo_pair_from_record(
    cfg: VLConfig,
    record: dict,
    tokenizer,
    budget: float,
    s_bucket: int,
    t_bucket: int,
    image_root: str = "",
    min_pixels: int = 56 * 56,
    max_pixels: int = 28 * 28 * 1280,
    family: str = "qwen25vl",
) -> Tuple[TrainBatchSample, TrainBatchSample]:
    """One jsonl preference record -> (chosen, rejected) TrainBatchSamples
    (``family="llava_ov15"`` -> OVTrainSamples, the reference DPO entry's
    own family).

    Record schema (the reference's DPO dataset,
    ``llava-ov-15/src/dataset/dpo_dataset.py``): ``{"image": path,
    "prompt": str, "chosen": str, "rejected": str}``; the prompt may also be
    a ``conversations`` list whose final assistant turn is replaced. Both
    samples share the identical prompt + image; only the supervised
    completion (and therefore the DPO loss mask) differs."""
    import os

    from visionselector_tpu.train.dataset import (
        build_sample_from_record,
        render_conversation,
    )

    img_path = record.get("image")
    paths = ([] if not img_path
             else img_path if isinstance(img_path, list) else [img_path])

    if "conversations" in record:
        base = list(record["conversations"])
        if base and base[-1].get("from", base[-1].get("role")) in (
                "gpt", "assistant"):
            base = base[:-1]
    else:
        prompt = record["prompt"]
        if "<image>" not in prompt and paths:
            prompt = "<image>" * len(paths) + prompt
        base = [{"from": "human", "value": prompt}]

    from PIL import Image

    images = []
    for p in paths:
        with Image.open(os.path.join(image_root, p)) as im:
            images.append(im.convert("RGB").copy())
    image = images[0] if images else None
    if family == "llava_ov15":
        assert len(images) <= 1, "OV DPO records: single image"

    if family == "llava_ov15":
        from visionselector_tpu.train.ov_loss import (
            build_ov_sample_from_record as builder,
        )
    else:
        builder = build_sample_from_record

    # The DPO "prompt" is EVERYTHING before the final completion — earlier
    # assistant turns in a conversations record are context, not supervised
    # (the reference masks all but the answer, ``dpo_trainer.py:117-145``).
    prompt_len = len(render_conversation(base, tokenizer)[0])

    def build(answer_text):
        ids, labels, slots = render_conversation(
            base + [{"from": "gpt", "value": answer_text}], tokenizer
        )
        labels = [IGNORE_INDEX] * prompt_len + labels[prompt_len:]
        rec = {
            "ids": ids, "labels": labels,
            "image_slot": slots[0] if slots else -1,
            "image_slots": slots,
            "image": image, "images": images,
            "video": None,
        }
        return builder(
            cfg, rec, budget=budget, s_bucket=s_bucket, t_bucket=t_bucket,
            min_pixels=min_pixels, max_pixels=max_pixels,
        )

    return build(record["chosen"]), build(record["rejected"])
