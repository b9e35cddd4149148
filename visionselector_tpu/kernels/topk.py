"""Differentiable and hard top-k operators.

``soft_topk`` re-derives the reference's custom autograd op
(``qwen-vl-finetune/compression_method/selector_model.py:49-91``) as a
``jax.custom_vjp``:

  forward: find per-row threshold t by 64-step bisection such that
           sum_j sigmoid(x_j + t) == k; return p = sigmoid(x + t).
  backward: vjp with the analytic Jacobian  J = -v v^T / s + diag(v),
           where v = sigmoid'(x + t), s = sum(v)  (no gradient w.r.t. k).

The fixed-iteration bisection is a ``fori_loop`` — jit/scan friendly; no
data-dependent control flow reaches XLA.

``hard_topk_indices`` reproduces the inference-side selection
(``qwen-evaluation/token_compression/selector_model.py:186-188``):
``scores.topk(k).indices`` then ascending sort, with ties broken toward lower
indices (torch semantics; jax.lax.top_k documents the same tie-break), padded to
a static ``k_max`` for XLA-stable shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _find_ts(xs: jax.Array, k: jax.Array, iters: int = 64) -> jax.Array:
    """Per-row threshold t with sum(sigmoid(x + t)) == k. xs: [B, N], k: scalar
    or [B]. Returns [B, 1] float32."""
    xs = xs.astype(jnp.float32)
    k = jnp.asarray(k, jnp.float32)
    if k.ndim == 0:
        k = jnp.broadcast_to(k, (xs.shape[0],))
    lo = -jnp.max(xs, axis=1, keepdims=True) - 10.0
    hi = -jnp.min(xs, axis=1, keepdims=True) + 10.0

    def body(_, carry):
        lo, hi = carry
        mid = (hi + lo) / 2.0
        too_small = jnp.sum(jax.nn.sigmoid(xs + mid), axis=1) < k  # [B]
        too_small = too_small[:, None]
        lo = jnp.where(too_small, mid, lo)
        hi = jnp.where(too_small, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return (lo + hi) / 2.0


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def soft_topk(xs: jax.Array, k: jax.Array, iters: int = 64) -> jax.Array:
    """Differentiable top-k mask: p = sigmoid(x + t), sum(p) == k.

    xs: [B, N] scores. k: scalar or [B] (float ok; no gradient). Returns [B, N]
    float32 soft membership mass.
    """
    ts = _find_ts(xs, k, iters)
    return jax.nn.sigmoid(xs.astype(jnp.float32) + ts)


def _soft_topk_fwd(xs, k, iters):
    ts = _find_ts(xs, k, iters)
    ps = jax.nn.sigmoid(xs.astype(jnp.float32) + ts)
    return ps, (xs, ts)


def _soft_topk_bwd(iters, res, g):
    xs, ts = res
    z = xs.astype(jnp.float32) + ts
    sig = jax.nn.sigmoid(z)
    v = sig * (1.0 - sig)  # sigmoid'(x + t)
    s = jnp.sum(v, axis=1, keepdims=True)
    uv = g * v
    t1 = -jnp.sum(uv, axis=1, keepdims=True) * v / s
    dx = (t1 + uv).astype(xs.dtype)
    return dx, None


soft_topk.defvjp(_soft_topk_fwd, _soft_topk_bwd)


def hard_topk_indices(
    scores: jax.Array,
    k: jax.Array,
    k_max: int,
    valid_len: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k indices (sorted ascending) with a static output size.

    Args:
        scores: [N] float scores (padding rows may hold any value).
        k: dynamic scalar, 1 <= k <= k_max.
        k_max: static bound on k (output size).
        valid_len: dynamic count of real rows; rows >= valid_len are excluded.

    Returns:
        (indices [k_max] int32 ascending — entries at slot >= k are the padding
         sentinel N (sorts after all real indices), valid [k_max] bool).
    """
    n = scores.shape[0]
    s = scores.astype(jnp.float32)
    if valid_len is not None:
        row_ok = jnp.arange(n) < valid_len
        s = jnp.where(row_ok, s, -jnp.inf)
    # lax.top_k breaks ties toward lower indices (matches torch.topk ordering
    # used by the reference before its ascending sort).
    _, idx = jax.lax.top_k(s, k_max)
    keep = jnp.arange(k_max) < k
    idx = jnp.where(keep, idx, n)  # sentinel: beyond-range index
    idx = jnp.sort(idx)
    valid = idx < n
    return idx.astype(jnp.int32), valid


def hard_topk_mask(scores: jax.Array, k: jax.Array, k_max: int,
                   valid_len: jax.Array | None = None) -> jax.Array:
    """0/1 mask of the hard top-k selection (constraint target for the
    annealed BCE loss; ``selector_model.py:167-171``). scores: [N] -> [N]."""
    idx, valid = hard_topk_indices(scores, k, k_max, valid_len)
    mask = jnp.zeros(scores.shape[0] + 1, jnp.float32)
    mask = mask.at[idx].set(jnp.where(valid, 1.0, 0.0))
    return mask[:-1]
