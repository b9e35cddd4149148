"""Learnable Importance Scorer (LIS).

Re-design of ``TransformerScorer``
(``qwen-evaluation/token_compression/selector_scorer.py:7-55``): two linear
projections q, k and ``scores = mean_j(q @ k^T / sqrt(h))``.

TPU optimization: the mean over attention logits is linear, so

    mean_j (q_i . k_j) / sqrt(h)  ==  q_i . mean_j(k_j) / sqrt(h)

— an O(N·h) matvec instead of the reference's O(N²·h) full attention matrix
(mathematically identical; we compute in fp32). ``exact=True`` materializes the
full matrix for cross-checking.

Init is near-zero (std=1e-4) so an untrained scorer minimally perturbs
downstream behavior, matching ``selector_scorer.py:24-31``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from visionselector_tpu.core.config import SelectorConfig


def init_scorer_params(key: jax.Array, cfg: SelectorConfig, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    std = cfg.init_scale
    return {
        "k_kernel": (jax.random.normal(k1, (cfg.in_features, cfg.hidden_dim)) * std).astype(dtype),
        "k_bias": jnp.zeros((cfg.hidden_dim,), dtype),
        "q_kernel": (jax.random.normal(k2, (cfg.in_features, cfg.hidden_dim)) * std).astype(dtype),
        "q_bias": jnp.zeros((cfg.hidden_dim,), dtype),
    }


def scorer_num_params(cfg: SelectorConfig) -> int:
    return 2 * (cfg.in_features * cfg.hidden_dim + cfg.hidden_dim)


def score_tokens(
    params: dict,
    tokens: jax.Array,
    valid_len: jax.Array | None = None,
    exact: bool = False,
) -> jax.Array:
    """Importance scores for merged vision tokens.

    Args:
        tokens: [N, D] (or [B, N, D]) merged vision tokens; rows >= valid_len
            are padding and are excluded from the key mean.
    Returns: [N] (or [B, N]) fp32 scores. Padding rows get score 0 (callers
        exclude them via ``valid_len`` in selection).
    """
    squeeze = tokens.ndim == 2
    x = tokens[None] if squeeze else tokens  # [B, N, D]
    xf = x.astype(jnp.float32)
    b, n, _ = xf.shape
    hidden = params["q_kernel"].shape[1]

    q = xf @ params["q_kernel"].astype(jnp.float32) + params["q_bias"].astype(jnp.float32)
    k = xf @ params["k_kernel"].astype(jnp.float32) + params["k_bias"].astype(jnp.float32)

    if valid_len is None:
        mask = jnp.ones((b, n, 1), jnp.float32)
        count = jnp.full((b, 1), float(n))
    else:
        vl = jnp.broadcast_to(jnp.asarray(valid_len), (b,))
        mask = (jnp.arange(n)[None, :] < vl[:, None]).astype(jnp.float32)[..., None]
        count = vl.astype(jnp.float32)[:, None]

    scale = hidden**-0.5
    if exact:
        attn = jnp.einsum("bnd,bmd->bnm", q, k) * scale
        scores = (attn * mask.transpose(0, 2, 1)).sum(-1) / count
    else:
        k_mean = (k * mask).sum(axis=1) / count  # [B, h]
        scores = jnp.einsum("bnd,bd->bn", q, k_mean) * scale

    return scores[0] if squeeze else scores
