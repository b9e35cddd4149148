"""Dynamic-Qwen training: Gumbel-ST predictor SFT (Dynamic-LLaVA port).

Reference parity:
- ``qwen-vl-finetune/qwenvl/train/train_qwen_dynamic.py:57-92`` —
  GumbelTauScheduledTrainer sets ``tau = start * (end/start)^(step/total)``
  each step (exponential decay).
- ``qwen-vl-finetune/compression_method/dynamic_model.py:427-467,735-743`` —
  the VisionPredictor scores image hidden states at decoder layer 2; training
  samples a straight-through Gumbel keep mask; loss = CE +
  ``mask_loss_weight * (mean(keep_mask) - budget)^2`` (weight 100,
  ``dynamic_model.py:559``). Only ``image_score_predictor`` trains.

TPU-native deviation (documented): the reference hides dropped tokens from
attention through a 4D ``text_image_mask``; here the straight-through keep
mask *multiplies* the image hidden rows at the target layer — the same
gradient path through the ST estimator, but expressible as a static-shape
elementwise op instead of a per-sample attention mask rebuild (XLA-friendly,
and consistent with how the selector's soft-mask training works).
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
from visionselector_tpu.selector.baselines.dynamic import (
    gumbel_keep_mask,
    predictor_forward,
    tau_schedule,
)
from visionselector_tpu.train.loss import TrainBatchSample, cross_entropy


class DynamicScheduleConfig(NamedTuple):
    total_steps: int = 1000
    lr: float = 5e-5
    tau_start: float = 1.0
    tau_end: float = 0.1
    budget: float = 0.2
    mask_loss_weight: float = 100.0  # dynamic_model.py:559
    target_layer: int = 2
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    max_grad_norm: float = 1.0  # reference TrainingArguments default
    remat: bool = False  # gradient checkpointing on the LM layer scans


class DynamicTrainState(NamedTuple):
    predictor_params: dict
    opt_state: optax.OptState
    step: jax.Array
    rng: jax.Array


def make_optimizer(sched: DynamicScheduleConfig) -> optax.GradientTransformation:
    warmup = max(1, int(sched.total_steps * sched.warmup_ratio))
    lr = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=sched.lr, warmup_steps=warmup,
        decay_steps=max(sched.total_steps, warmup + 1),
    )
    opt = optax.adamw(lr, weight_decay=sched.weight_decay)
    if sched.max_grad_norm > 0:
        opt = optax.chain(
            optax.clip_by_global_norm(sched.max_grad_norm), opt)
    return opt


def init_dynamic_train_state(predictor_params: dict,
                             sched: DynamicScheduleConfig,
                             seed: int = 0) -> DynamicTrainState:
    opt = make_optimizer(sched)
    return DynamicTrainState(
        predictor_params=predictor_params,
        opt_state=opt.init(predictor_params),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(seed),
    )


def dynamic_train_forward(
    predictor_params: dict,
    frozen_params: dict,
    sample: TrainBatchSample,
    cfg: VLConfig,
    tau: jax.Array,
    rng: jax.Array,
    sched: DynamicScheduleConfig,
) -> Tuple[jax.Array, dict]:
    """One sample's composite loss (CE + keep-ratio MSE)."""
    vision_embeds = vit_mod.vit_forward(
        frozen_params["visual"], sample.pixel_values, sample.rot_pos_ids,
        sample.window_seg_ids, sample.full_seg_ids, sample.reverse_index,
        cfg.vision,
    )  # [L_pad, D]
    l_pad = vision_embeds.shape[0]

    text_embeds = lm_mod.embed_tokens(frozen_params["lm"], sample.input_ids)
    t_pad, d = text_embeds.shape
    full = jnp.zeros((t_pad + 1, d), text_embeds.dtype)
    full = full.at[:t_pad].set(text_embeds)
    full = full.at[sample.image_positions].set(
        vision_embeds.astype(text_embeds.dtype)
    )
    embeds = full[:t_pad]

    layers = frozen_params["lm"]["layers"]
    target = sched.target_layer
    pre = jax.tree.map(lambda a: a[:target], layers)
    hidden, _ = lm_mod.lm_prefill_layers(
        pre, embeds[None], sample.position_ids[:, None, :],
        sample.seg_ids[None], cfg.text, remat=sched.remat,
    )  # [1, T_pad, D]

    # predictor over image rows (buffered gather; sentinel row = zeros)
    h_pad = jnp.concatenate([hidden[0], jnp.zeros((1, d), hidden.dtype)])
    x_img = h_pad[jnp.minimum(sample.image_positions, t_pad)]  # [L_pad, D]
    row_ok = (jnp.arange(l_pad) < sample.num_merged)
    logits = predictor_forward(
        predictor_params, x_img.astype(jnp.float32)[None],
        policy=row_ok.astype(jnp.float32)[None, :, None],
    )[0]  # [L_pad, 2]
    keep = gumbel_keep_mask(rng, logits, tau) * row_ok  # [L_pad] ST in {0,1}

    # multiply image hidden rows by the keep decision (see module docstring)
    scale = jnp.ones((t_pad + 1,), hidden.dtype)
    scale = scale.at[sample.image_positions].set(keep.astype(hidden.dtype))
    hidden = hidden * scale[:t_pad][None, :, None]

    post = jax.tree.map(lambda a: a[target:], layers)
    x, _ = lm_mod.lm_prefill_layers(
        post, hidden, sample.position_ids[:, None, :],
        sample.seg_ids[None], cfg.text, remat=sched.remat,
    )
    x = vit_mod.rms_norm(
        x, frozen_params["lm"]["final_ln_scale"], cfg.text.rms_norm_eps
    )
    lm_logits = lm_mod.lm_head(frozen_params["lm"], x[0], cfg.text)

    ce = cross_entropy(lm_logits[:-1], sample.labels[1:])
    n_img = jnp.maximum(row_ok.sum(), 1).astype(jnp.float32)
    keep_ratio = keep.sum() / n_img
    mask_loss = (keep_ratio - sched.budget) ** 2
    loss = ce + sched.mask_loss_weight * mask_loss
    return loss, {"ce": ce, "mask_loss": mask_loss, "keep_ratio": keep_ratio}


def export_predictor_to_safetensors(predictor_params: dict, path: str,
                                    prefix: str = "model.image_score_predictor.") -> None:
    """Flat safetensors export of the trained VisionPredictor (named under the
    reference module path, ``dynamic_model.py:302``)."""
    import numpy as np
    from safetensors.numpy import save_file

    flat = {}

    def walk(tree, name):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{name}.{k}" if name else k)
        else:
            flat[prefix + name] = np.ascontiguousarray(np.asarray(tree))

    walk(predictor_params, "")
    save_file(flat, path)


@functools.partial(jax.jit, static_argnames=("cfg", "sched"))
def dynamic_train_step(
    state: DynamicTrainState,
    frozen_params: dict,
    batch: TrainBatchSample,
    cfg: VLConfig,
    sched: DynamicScheduleConfig,
) -> Tuple[DynamicTrainState, dict]:
    tau = tau_schedule(state.step, sched.total_steps, sched.tau_start,
                       sched.tau_end)
    rng, sub = jax.random.split(state.rng)

    def batch_loss(pp):
        n = jax.tree.leaves(batch)[0].shape[0]
        keys = jax.random.split(sub, n)

        def per_sample(sample, key):
            return dynamic_train_forward(
                pp, frozen_params, sample, cfg, tau, key, sched
            )

        losses, metrics = jax.vmap(per_sample)(batch, keys)
        return losses.mean(), jax.tree.map(jnp.mean, metrics)

    (loss, metrics), grads = jax.value_and_grad(batch_loss, has_aux=True)(
        state.predictor_params
    )
    opt = make_optimizer(sched)
    updates, opt_state = opt.update(
        grads, state.opt_state, state.predictor_params
    )
    predictor_params = optax.apply_updates(state.predictor_params, updates)
    metrics = dict(metrics)
    metrics.update(loss=loss, tau=tau, grad_norm=optax.global_norm(grads))
    return (
        DynamicTrainState(predictor_params=predictor_params,
                          opt_state=opt_state, step=state.step + 1, rng=rng),
        metrics,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "sched"))
def dynamic_train_step_accum(
    state: DynamicTrainState,
    frozen_params: dict,
    batches: TrainBatchSample,
    cfg: VLConfig,
    sched: DynamicScheduleConfig,
) -> Tuple[DynamicTrainState, dict]:
    """Gradient-accumulated predictor step over a leading [A] micro-step
    axis (see ``train_step_accum``): lax.scan over micro-batches, fp32
    grad sum, one optimizer update. Per-sample Gumbel keys fold in the
    micro-step index so samples across micro-batches draw independently."""
    tau = tau_schedule(state.step, sched.total_steps, sched.tau_start,
                       sched.tau_end)
    rng, sub = jax.random.split(state.rng)

    def micro(carry, inp):
        gsum = carry
        mb, mkey = inp

        def batch_loss(pp):
            n = jax.tree.leaves(mb)[0].shape[0]
            keys = jax.random.split(mkey, n)

            def per_sample(sample, key):
                return dynamic_train_forward(
                    pp, frozen_params, sample, cfg, tau, key, sched
                )

            losses, metrics = jax.vmap(per_sample)(mb, keys)
            return losses.mean(), jax.tree.map(jnp.mean, metrics)

        (loss, metrics), g = jax.value_and_grad(batch_loss, has_aux=True)(
            state.predictor_params
        )
        gsum = jax.tree.map(lambda a, b: a + b.astype(jnp.float32),
                            gsum, g)
        return gsum, (loss, metrics)

    a = jax.tree.leaves(batches)[0].shape[0]
    mkeys = jax.random.split(sub, a)
    zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                         state.predictor_params)
    gsum, (losses, metrics) = jax.lax.scan(micro, zeros, (batches, mkeys))
    grads = jax.tree.map(lambda g, p: (g / a).astype(p.dtype),
                         gsum, state.predictor_params)
    opt = make_optimizer(sched)
    updates, opt_state = opt.update(
        grads, state.opt_state, state.predictor_params
    )
    predictor_params = optax.apply_updates(state.predictor_params, updates)
    metrics = {k: jnp.mean(v) for k, v in dict(metrics).items()}
    metrics.update(loss=losses.mean(), tau=tau,
                   grad_norm=optax.global_norm(grads))
    return (
        DynamicTrainState(predictor_params=predictor_params,
                          opt_state=opt_state, step=state.step + 1, rng=rng),
        metrics,
    )
