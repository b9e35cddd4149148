"""Baseline full-model SFT (reference parity:
``qwen-vl-finetune/qwenvl/train/train_qwen.py`` — plain CE training with the
``tune_mm_vision`` / ``tune_mm_mlp`` / ``tune_mm_llm`` freeze policy,
``set_model`` :70-93).

TPU-native: the trainable subset is an optax ``masked`` transform over the
full parameter pytree (frozen leaves get zero updates and no optimizer
state), replacing per-parameter ``requires_grad`` flips. The data-parallel
mesh + ``core.mesh.shard_params`` weight sharding are the ZeRO analog.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from visionselector_tpu.core.config import VLConfig
from visionselector_tpu.models.qwen25vl import lm as lm_mod
from visionselector_tpu.models.qwen25vl import vit as vit_mod
from visionselector_tpu.train.loss import TrainBatchSample, cross_entropy


class SFTScheduleConfig(NamedTuple):
    total_steps: int = 1000
    lr: float = 1e-5
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    max_grad_norm: float = 1.0  # reference TrainingArguments default
    remat: bool = False  # gradient checkpointing on the LM layer scan
    tune_mm_vision: bool = False
    tune_mm_mlp: bool = False
    tune_mm_llm: bool = True
    # LoRA: rank > 0 trains ONLY the adapter leaves (reference requires
    # freeze_llm with lora_enable, train_sft_visionselector.py:160-161)
    lora_rank: int = 0


class SFTState(NamedTuple):
    params: dict  # FULL tree (frozen leaves ride along, untouched)
    opt_state: optax.OptState
    step: jax.Array


def trainable_mask(params: dict, sched: SFTScheduleConfig) -> dict:
    """Pytree of bools mirroring ``set_model``'s freeze policy: visual.* =
    tune_mm_vision, visual merger.* = tune_mm_mlp (overrides vision flag for
    merger leaves, as the reference applies it after), lm.* = tune_mm_llm;
    scorer never trains here (that is the selector entry's job)."""

    def mark(path, _leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if sched.lora_rank > 0:
            from visionselector_tpu.train.lora import lora_leaf

            return lora_leaf(name)
        if name.startswith("visual/merger"):
            return sched.tune_mm_mlp
        if name.startswith("visual"):
            return sched.tune_mm_vision
        if name.startswith("lm"):
            return sched.tune_mm_llm
        return False  # scorer & anything else

    return jax.tree_util.tree_map_with_path(mark, params)


def make_optimizer(params: dict,
                   sched: SFTScheduleConfig) -> optax.GradientTransformation:
    warmup = max(1, int(sched.total_steps * sched.warmup_ratio))
    lr = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=sched.lr, warmup_steps=warmup,
        decay_steps=max(sched.total_steps, warmup + 1),
    )
    mask = trainable_mask(params, sched)
    not_mask = jax.tree.map(lambda m: not m, mask)
    # masked() leaves unmasked updates untouched — frozen leaves must be
    # explicitly zeroed, then AdamW runs (with state) only on trainables.
    inner = optax.adamw(lr, weight_decay=sched.weight_decay)
    if sched.max_grad_norm > 0:
        inner = optax.chain(
            optax.clip_by_global_norm(sched.max_grad_norm), inner)
    return optax.chain(
        optax.masked(optax.set_to_zero(), not_mask),
        optax.masked(inner, mask),
    )


def init_sft_state(params: dict, sched: SFTScheduleConfig) -> SFTState:
    opt = make_optimizer(params, sched)
    return SFTState(params=params, opt_state=opt.init(params),
                    step=jnp.zeros((), jnp.int32))


def sft_forward_logits(
    params: dict, sample: TrainBatchSample, cfg: VLConfig,
    remat: bool = False,
) -> jax.Array:
    """Uncompressed forward to logits [T_pad, V]: full ViT -> scatter ->
    decoder -> lm_head. Shared by the SFT CE loss and the DPO sequence
    log-prob scorer (``train/dpo.py``)."""
    vision_embeds = vit_mod.vit_forward(
        params["visual"], sample.pixel_values, sample.rot_pos_ids,
        sample.window_seg_ids, sample.full_seg_ids, sample.reverse_index,
        cfg.vision,
    )
    text_embeds = lm_mod.embed_tokens(params["lm"], sample.input_ids)
    t_pad, d = text_embeds.shape
    full = jnp.zeros((t_pad + 1, d), text_embeds.dtype)
    full = full.at[:t_pad].set(text_embeds)
    full = full.at[sample.image_positions].set(
        vision_embeds.astype(text_embeds.dtype)
    )
    hidden, _ = lm_mod.lm_prefill(
        params["lm"], full[:t_pad][None], sample.position_ids[:, None, :],
        sample.seg_ids[None], cfg.text, remat=remat,
    )
    return lm_mod.lm_head(params["lm"], hidden[0], cfg.text)


def forward_logits(params, sample, cfg, remat: bool = False) -> jax.Array:
    """Family dispatch on the (static) sample type: Qwen
    ``TrainBatchSample`` -> ``sft_forward_logits``; OV ``OVTrainSample`` ->
    ``ov_loss.ov_forward_logits``. Shared by the SFT CE loss and the
    DPO/GRPO log-prob scorers (the reference's SFT/DPO/GRPO entries are
    OV-family, ``llava-ov-15/src/train/train_{sft,dpo,grpo}.py``)."""
    from visionselector_tpu.train.ov_loss import (
        OVTrainSample,
        ov_forward_logits,
    )

    if isinstance(sample, OVTrainSample):
        return ov_forward_logits(params, sample, cfg, remat=remat)
    return sft_forward_logits(params, sample, cfg, remat=remat)


def sft_train_forward(
    params: dict, sample: TrainBatchSample, cfg: VLConfig,
    remat: bool = False,
) -> Tuple[jax.Array, dict]:
    """Plain CE forward: full ViT -> scatter -> decoder -> CE (no selector);
    both families via the sample-type dispatch."""
    logits = forward_logits(params, sample, cfg, remat=remat)
    ce = cross_entropy(logits[:-1], sample.labels[1:])
    return ce, {"ce": ce}


@functools.partial(jax.jit, static_argnames=("cfg", "sched"),
                   donate_argnums=(0,))
def sft_train_step(
    state: SFTState,
    batch: TrainBatchSample,
    cfg: VLConfig,
    sched: SFTScheduleConfig,
) -> Tuple[SFTState, dict]:
    def batch_loss(params):
        def per_sample(sample):
            return sft_train_forward(params, sample, cfg,
                                     remat=sched.remat)

        losses, metrics = jax.vmap(per_sample)(batch)
        return losses.mean(), jax.tree.map(jnp.mean, metrics)

    (loss, metrics), grads = jax.value_and_grad(batch_loss, has_aux=True)(
        state.params
    )
    opt = make_optimizer(state.params, sched)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = dict(metrics)
    metrics.update(loss=loss, grad_norm=optax.global_norm(grads))
    return SFTState(params=params, opt_state=opt_state,
                    step=state.step + 1), metrics


@functools.partial(jax.jit, static_argnames=("cfg", "sched"),
                   donate_argnums=(0,))
def sft_train_step_accum(
    state: SFTState,
    batches: TrainBatchSample,
    cfg: VLConfig,
    sched: SFTScheduleConfig,
) -> Tuple[SFTState, dict]:
    """Gradient-accumulated SFT step over a leading [A] micro-step axis —
    equivalent to ``sft_train_step`` on the concatenated A*B batch, with
    only one micro-batch of activations live at a time (``lax.scan``).
    Matches the reference's ``--gradient_accumulation_steps`` recipe knob
    (``qwen-vl-finetune/scripts/sft_3b.sh:48``). Grads sum in fp32."""

    def micro_loss(params, mb):
        def per_sample(sample):
            return sft_train_forward(params, sample, cfg,
                                     remat=sched.remat)

        losses, metrics = jax.vmap(per_sample)(mb)
        return losses.mean(), jax.tree.map(jnp.mean, metrics)

    def micro(gsum, mb):
        (loss, metrics), g = jax.value_and_grad(
            micro_loss, has_aux=True)(state.params, mb)
        gsum = jax.tree.map(lambda a, b: a + b.astype(jnp.float32),
                            gsum, g)
        return gsum, (loss, metrics)

    zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                         state.params)
    gsum, (losses, metrics) = jax.lax.scan(micro, zeros, batches)
    a = losses.shape[0]
    grads = jax.tree.map(lambda g, p: (g / a).astype(p.dtype),
                         gsum, state.params)
    opt = make_optimizer(state.params, sched)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = {k: jnp.mean(v) for k, v in dict(metrics).items()}
    metrics.update(loss=losses.mean(), grad_norm=optax.global_norm(grads))
    return SFTState(params=params, opt_state=opt_state,
                    step=state.step + 1), metrics
