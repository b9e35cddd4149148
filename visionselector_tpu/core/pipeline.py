"""Pipeline parallelism: stage-sharded decoder layers, GPipe schedule.

TPU-native design (the reference has NO pipeline parallelism — SURVEY §2.9
lists it absent; this is the scaling slot for models deeper than one chip's
HBM, complementing dp/tp/sp/ep which live in ``core.mesh``,
``models.qwen25vl.vit.vit_forward_sp`` and ``models.qwen25vl.lm.moe_mlp_ep``):

- The scan-stacked layer params (leading axis = layer) shard contiguously
  over a ``stage`` mesh axis — each device holds ``L / S`` layers, exactly
  the memory win pipeline parallelism exists for.
- Activations flow stage-to-stage over ICI with ``lax.ppermute`` inside one
  ``shard_map``; the batch splits into M microbatches and the classic GPipe
  schedule runs ``M + S - 1`` ticks, each tick = one local ``lax.scan`` over
  the stage's layers. Bubble fraction is the usual ``(S-1)/(M+S-1)``.
- Everything is jit-compiled SPMD: no host round trips between ticks, and
  the whole schedule is differentiable (``ppermute``/``psum`` have exact
  transposes), so the same function serves training.

Scope: the full-sequence (prefill / training-forward) path. KV-cache decode
is latency-bound and pipeline parallelism does not help it; use tensor
parallelism there (``core.mesh.param_sharding_rules``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _shard_map():
    try:  # jax >= 0.7: top-level, no check_rep
        from jax import shard_map

        return shard_map, {}
    except ImportError:
        from jax.experimental.shard_map import shard_map

        return shard_map, {"check_rep": False}


def gpipe(
    stage_fn,
    layer_params,
    first_input_mb: jax.Array,
    extras_mb,
    mesh,
    axis: str = "stage",
):
    """Run ``stage_fn`` over stage-sharded ``layer_params`` with a GPipe
    schedule.

    stage_fn(local_layer_params, x, extras) -> y
        runs the LOCAL contiguous layer stack on one microbatch activation
        ``x`` (same shape in and out) with per-microbatch side inputs
        ``extras`` (e.g. rope cos/sin, segment ids).
    layer_params: pytree whose leaves have leading layer axis L (L % S == 0);
        sharded over ``axis`` by the shard_map in_spec.
    first_input_mb: [M, ...] initial activations, microbatch-major (consumed
        by stage 0; later stages receive activations via ppermute).
    extras_mb: pytree of [M, ...] arrays, replicated to every stage.

    Returns [M, ...] outputs of the LAST stage, replicated on every device.
    """
    n_stages = mesh.shape[axis]
    n_micro = first_input_mb.shape[0]
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def body(local_layers, first_mb, extras):
        stage = jax.lax.axis_index(axis)
        state = jnp.zeros_like(first_mb[0])
        out = jnp.zeros_like(first_mb)
        for step in range(n_micro + n_stages - 1):
            # stage s works on microbatch (step - s); clip to a valid index
            # during pipeline fill/drain bubbles (the result is discarded).
            idx = jnp.clip(step - stage, 0, n_micro - 1)
            x_first = jax.lax.dynamic_index_in_dim(
                first_mb, idx, 0, keepdims=False
            )
            x_in = jnp.where(stage == 0, x_first, state)
            ex = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, idx, 0, keepdims=False
                ),
                extras,
            )
            y = stage_fn(local_layers, x_in, ex)
            out_idx = step - (n_stages - 1)
            if 0 <= out_idx < n_micro:  # static: step/n_stages are python
                out = jnp.where(stage == n_stages - 1,
                                out.at[out_idx].set(y), out)
            state = jax.lax.ppermute(y, axis, perm)
        # broadcast the last stage's outputs to every device
        return jax.lax.psum(
            jnp.where(stage == n_stages - 1, out, jnp.zeros_like(out)), axis
        )

    shard_map, kwargs = _shard_map()
    layer_spec = jax.tree.map(lambda _: P(axis), layer_params)
    extras_spec = jax.tree.map(lambda _: P(), extras_mb)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(layer_spec, P(), extras_spec),
        out_specs=P(),
        **kwargs,
    )(layer_params, first_input_mb, extras_mb)


def lm_prefill_layers_pp(
    layers: dict,
    inputs_embeds: jax.Array,
    position_ids: jax.Array,
    seg_ids: jax.Array,
    cfg,
    mesh,
    n_microbatches: int,
    axis: str = "stage",
) -> jax.Array:
    """Pipeline-parallel twin of ``lm.lm_prefill_layers`` (hidden states
    only — the training-forward path; KV collection belongs to the
    single-stage prefill).

    The batch axis splits into ``n_microbatches`` (B % M == 0); rope cos/sin
    are precomputed per microbatch on the host side of the shard_map so each
    stage applies identical rotary math. Numerically equal to the scan
    version (same layer body, same dtypes) — asserted by
    ``tests/test_pipeline.py``.
    """
    from visionselector_tpu.kernels.attention import attention
    from visionselector_tpu.models.qwen25vl.lm import (
        _apply_mrope,
        _dense,
        _mlp,
        _qkv,
        _repeat_kv,
        mrope_cos_sin,
        rms_norm,
    )

    n_stages = mesh.shape[axis]
    n_layers = jax.tree.leaves(layers)[0].shape[0]
    assert n_layers % n_stages == 0, (n_layers, n_stages)
    b, t = inputs_embeds.shape[:2]
    m = n_microbatches
    assert b % m == 0, (b, m)

    cos, sin = mrope_cos_sin(position_ids, cfg)  # [B, T, Dh]
    n_rep = cfg.num_attention_heads // cfg.num_key_value_heads

    def mb(x):  # batch-major -> microbatch-major
        return x.reshape(m, b // m, *x.shape[1:])

    def stage_fn(local_layers, x, ex):
        cos_mb, sin_mb, seg_mb = ex

        def layer(x, p):
            h = rms_norm(x, p["input_ln_scale"], cfg.rms_norm_eps)
            q, k, v = _qkv(h, p, cfg)
            q, k = _apply_mrope(q, k, cos_mb, sin_mb)
            attn = attention(
                q, _repeat_kv(k, n_rep), _repeat_kv(v, n_rep),
                seg_mb, seg_mb, causal=True,
            )
            bb, tt = x.shape[:2]
            x = x + _dense(attn.reshape(bb, tt, -1), p, "o_kernel")
            h = rms_norm(x, p["post_ln_scale"], cfg.rms_norm_eps)
            x = x + _mlp(h, p, cfg)
            return x, None

        x, _ = jax.lax.scan(layer, x, local_layers)
        return x

    out = gpipe(
        stage_fn,
        layers,
        mb(inputs_embeds),
        (mb(cos), mb(sin), mb(seg_ids)),
        mesh,
        axis=axis,
    )
    return out.reshape(b, t, *out.shape[3:])
