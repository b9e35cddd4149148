"""Data-parallel training step for the LIS selector (frozen backbone).

Reference recipe (``qwen-vl-finetune/qwenvl/train/train_qwen_selector.py``):
only ``importance_scorer`` is trainable (``set_model`` :127-157), AdamW, lr
5e-5 cosine, bf16, ZeRO-3 across 8 GPUs, reg_weight annealed 0.1 -> 2.0.

TPU-native: the batch is sharded over the mesh 'data' axis and the loss is a
mean over the global batch — XLA inserts the gradient all-reduce. Frozen
backbone params are captured as non-differentiated inputs (no optimizer state,
no grads — the ZeRO memory win falls out of optax state existing only for the
12.85M scorer). Backbone weights can additionally be sharded over the 'model'
axis (``core.mesh.shard_params``) for ZeRO-3-style memory scaling.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from visionselector_tpu.core.config import VLConfig
from visionselector_tpu.train.loss import (
    TrainBatchSample,
    reg_weight_schedule,
    selector_train_forward,
)


class TrainState(NamedTuple):
    scorer_params: dict
    opt_state: optax.OptState
    step: jax.Array


class ScheduleConfig(NamedTuple):
    total_steps: int = 1000
    lr: float = 5e-5
    reg_weight_start: float = 0.1
    reg_weight_end: float = 2.0
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    # reference TrainingArguments defaults: clip grads at global-norm 1.0
    max_grad_norm: float = 1.0
    # gradient checkpointing (jax.checkpoint on the scanned LM layer):
    # exact, trades one extra forward for O(1)-layer activation memory
    remat: bool = False


def make_optimizer(sched: ScheduleConfig) -> optax.GradientTransformation:
    warmup = max(1, int(sched.total_steps * sched.warmup_ratio))
    lr = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=sched.lr,
        warmup_steps=warmup,
        decay_steps=max(sched.total_steps, warmup + 1),
    )
    opt = optax.adamw(lr, weight_decay=sched.weight_decay)
    if sched.max_grad_norm > 0:
        opt = optax.chain(
            optax.clip_by_global_norm(sched.max_grad_norm), opt)
    return opt


def init_train_state(params: dict, sched: ScheduleConfig) -> TrainState:
    opt = make_optimizer(sched)
    return TrainState(
        scorer_params=params["scorer"],
        opt_state=opt.init(params["scorer"]),
        step=jnp.zeros((), jnp.int32),
    )


def batch_loss(
    scorer_params: dict,
    frozen_params: dict,
    batch: TrainBatchSample,
    cfg: VLConfig,
    reg_weight: jax.Array,
    k_max: int,
    remat: bool = False,
) -> Tuple[jax.Array, dict]:
    """Mean loss over the (globally sharded) batch. Batch arrays have a
    leading batch dim; vmapped per-sample."""
    params = dict(frozen_params)
    params["scorer"] = scorer_params

    from visionselector_tpu.core.config import OVConfig

    if isinstance(cfg, OVConfig):
        from visionselector_tpu.train.ov_loss import ov_selector_train_forward

        def per_sample(sample):
            return ov_selector_train_forward(
                params, sample, cfg, reg_weight, k_max, remat=remat
            )
    else:
        def per_sample(sample):
            return selector_train_forward(params, sample, cfg, reg_weight,
                                          k_max, remat=remat)

    losses, metrics = jax.vmap(per_sample)(batch)
    return losses.mean(), jax.tree.map(jnp.mean, metrics)


# Note: no buffer donation — the trainable scorer is only ~13M params and
# callers (tests, evals) legitimately reuse state pytrees.
@functools.partial(jax.jit, static_argnames=("cfg", "k_max", "sched"))
def train_step(
    state: TrainState,
    frozen_params: dict,
    batch: TrainBatchSample,
    cfg: VLConfig,
    k_max: int,
    sched: ScheduleConfig,
) -> Tuple[TrainState, dict]:
    reg_weight = reg_weight_schedule(
        state.step, sched.total_steps, sched.reg_weight_start,
        sched.reg_weight_end,
    )
    (loss, metrics), grads = jax.value_and_grad(batch_loss, has_aux=True)(
        state.scorer_params, frozen_params, batch, cfg, reg_weight, k_max,
        sched.remat,
    )
    opt = make_optimizer(sched)
    updates, opt_state = opt.update(
        grads, state.opt_state, state.scorer_params
    )
    scorer_params = optax.apply_updates(state.scorer_params, updates)
    metrics = dict(metrics)
    metrics.update(
        loss=loss,
        reg_weight=reg_weight,
        grad_norm=optax.global_norm(grads),
    )
    return (
        TrainState(scorer_params=scorer_params, opt_state=opt_state,
                   step=state.step + 1),
        metrics,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "k_max", "sched"))
def train_step_accum(
    state: TrainState,
    frozen_params: dict,
    batches: TrainBatchSample,
    cfg: VLConfig,
    k_max: int,
    sched: ScheduleConfig,
) -> Tuple[TrainState, dict]:
    """Gradient-accumulated step: ``batches`` carries a leading [A]
    micro-step axis; equivalent to ``train_step`` on the concatenated
    A*B batch (equal-sized micro-batches, so the mean of micro-means is
    the global mean), but ``lax.scan`` keeps only ONE micro-batch of
    activations live at a time — the memory knob the reference reaches
    for with ``--gradient_accumulation_steps``
    (``qwen-vl-finetune/scripts/sft_3b.sh:48``). One jitted program: no
    host round trip between micro-steps, grads accumulate in fp32."""
    reg_weight = reg_weight_schedule(
        state.step, sched.total_steps, sched.reg_weight_start,
        sched.reg_weight_end,
    )

    def micro(gsum, mb):
        (loss, metrics), g = jax.value_and_grad(batch_loss, has_aux=True)(
            state.scorer_params, frozen_params, mb, cfg, reg_weight, k_max,
            sched.remat,
        )
        gsum = jax.tree.map(lambda a, b: a + b.astype(jnp.float32),
                            gsum, g)
        return gsum, (loss, metrics)

    zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                         state.scorer_params)
    gsum, (losses, metrics) = jax.lax.scan(micro, zeros, batches)
    a = losses.shape[0]
    grads = jax.tree.map(
        lambda g, p: (g / a).astype(p.dtype), gsum, state.scorer_params)
    opt = make_optimizer(sched)
    updates, opt_state = opt.update(
        grads, state.opt_state, state.scorer_params
    )
    scorer_params = optax.apply_updates(state.scorer_params, updates)
    metrics = {k: jnp.mean(v) for k, v in dict(metrics).items()}
    metrics.update(
        loss=losses.mean(),
        reg_weight=reg_weight,
        grad_norm=optax.global_norm(grads),
    )
    return (
        TrainState(scorer_params=scorer_params, opt_state=opt_state,
                   step=state.step + 1),
        metrics,
    )
