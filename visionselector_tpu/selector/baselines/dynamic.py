"""Dynamic-Qwen: trained token-selection predictor (Dynamic-LLaVA port).

Re-design of the reference's VisionPredictor + dynamic forward
(``qwen-evaluation/token_compression/dynamic_block.py:324-377``,
``dynamic_model.py:387-495``): a small transformer scorer over image hidden
states at decoder layer 2,

    down_mlp (LayerNorm -> Linear -> GELU) ->
    2 pre-LN encoder blocks (timm-style) ->
    [local features | policy-masked global mean] -> 3-layer MLP -> 2 logits.

Inference keeps the top ``int(N * budget)`` image tokens ranked by
``log_softmax(logits)[..., 0]`` (``dynamic_model.py:466-477``).

Training uses Gumbel-softmax sampling with an exponentially decayed
temperature (``train_qwen_dynamic.py:57-92``) and a keep-ratio MSE penalty
(``dynamic_model.py:760-766``) — provided here as ``gumbel_keep_mask`` and
``tau_schedule``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_predictor_params(key, input_dim: int, d_model: int = 512,
                          num_heads: int = 8, mlp_ratio: float = 4.0,
                          num_layers: int = 2, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 12)

    def nrm(k, shape, std=0.02):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    i = 0

    def nk():
        nonlocal i
        i += 1
        return ks[i - 1]

    hidden = int(d_model * mlp_ratio)
    blocks = {
        "norm1_scale": jnp.ones((num_layers, d_model), dtype),
        "norm1_bias": jnp.zeros((num_layers, d_model), dtype),
        "norm2_scale": jnp.ones((num_layers, d_model), dtype),
        "norm2_bias": jnp.zeros((num_layers, d_model), dtype),
        # timm Attention: separate q/k/v linears, no bias by default
        "q_kernel": nrm(nk(), (num_layers, d_model, d_model)),
        "k_kernel": nrm(nk(), (num_layers, d_model, d_model)),
        "v_kernel": nrm(nk(), (num_layers, d_model, d_model)),
        "proj_kernel": nrm(nk(), (num_layers, d_model, d_model)),
        "proj_bias": jnp.zeros((num_layers, d_model), dtype),
        "fc1_kernel": nrm(nk(), (num_layers, d_model, hidden)),
        "fc1_bias": jnp.zeros((num_layers, hidden), dtype),
        "fc2_kernel": nrm(nk(), (num_layers, hidden, d_model)),
        "fc2_bias": jnp.zeros((num_layers, d_model), dtype),
    }
    return {
        "down_ln_scale": jnp.ones((input_dim,), dtype),
        "down_ln_bias": jnp.zeros((input_dim,), dtype),
        "down_kernel": nrm(nk(), (input_dim, d_model)),
        "down_bias": jnp.zeros((d_model,), dtype),
        "blocks": blocks,
        "out1_kernel": nrm(nk(), (d_model, d_model // 2)),
        "out1_bias": jnp.zeros((d_model // 2,), dtype),
        "out2_kernel": nrm(nk(), (d_model // 2, d_model // 4)),
        "out2_bias": jnp.zeros((d_model // 4,), dtype),
        "out3_kernel": nrm(nk(), (d_model // 4, 2)),
        "out3_bias": jnp.zeros((2,), dtype),
    }


def _layer_norm(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias).astype(x.dtype)


def predictor_forward(params: dict, x: jax.Array,
                      policy: jax.Array | None = None,
                      num_heads: int = 8) -> jax.Array:
    """x: [B, N, input_dim]; policy: [B, N, 1] keep mask. -> logits [B, N, 2]."""
    b, n, _ = x.shape
    if policy is None:
        policy = jnp.ones((b, n, 1), jnp.float32)
    h = _layer_norm(x, params["down_ln_scale"], params["down_ln_bias"])
    h = jax.nn.gelu(h @ params["down_kernel"] + params["down_bias"],
                    approximate=False)
    h = h * policy.astype(h.dtype)

    d_model = h.shape[-1]
    dh = d_model // num_heads

    def block(h, p):
        y = _layer_norm(h, p["norm1_scale"], p["norm1_bias"])
        q = (y @ p["q_kernel"]).reshape(b, n, num_heads, dh)
        k = (y @ p["k_kernel"]).reshape(b, n, num_heads, dh)
        v = (y @ p["v_kernel"]).reshape(b, n, num_heads, dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * dh**-0.5
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        h = h + attn.reshape(b, n, d_model) @ p["proj_kernel"] + p["proj_bias"]
        y = _layer_norm(h, p["norm2_scale"], p["norm2_bias"])
        y = jax.nn.gelu(y @ p["fc1_kernel"] + p["fc1_bias"], approximate=False)
        h = h + y @ p["fc2_kernel"] + p["fc2_bias"]
        return h, None

    h, _ = jax.lax.scan(block, h, params["blocks"])

    c = h.shape[-1]
    local = h[..., : c // 2]
    pol = policy.astype(jnp.float32)
    global_feat = (h[..., c // 2 :] * pol).sum(axis=1, keepdims=True) / (
        pol.sum(axis=1, keepdims=True)
    )
    h = jnp.concatenate(
        [local, jnp.broadcast_to(global_feat, local.shape)], axis=-1
    )
    h = jax.nn.gelu(h @ params["out1_kernel"] + params["out1_bias"],
                    approximate=False)
    h = jax.nn.gelu(h @ params["out2_kernel"] + params["out2_bias"],
                    approximate=False)
    return h @ params["out3_kernel"] + params["out3_bias"]


def tau_schedule(step, total_steps, start: float = 1.0, end: float = 0.1):
    """Exponential Gumbel temperature decay (``train_qwen_dynamic.py:72-76``)."""
    frac = jnp.clip(jnp.asarray(step, jnp.float32) / max(total_steps, 1), 0, 1)
    return start * (end / start) ** frac


def gumbel_keep_mask(key, logits: jax.Array, tau) -> jax.Array:
    """Differentiable straight-through Gumbel-softmax keep decision.

    logits [.., 2] -> keep mask [..] in {0,1} forward, soft backward (channel 0
    is 'keep', matching the eval ranking channel)."""
    g = -jnp.log(-jnp.log(jax.random.uniform(key, logits.shape) + 1e-10) + 1e-10)
    soft = jax.nn.softmax((logits + g) / tau, axis=-1)
    hard = jax.nn.one_hot(jnp.argmax(soft, -1), 2, dtype=soft.dtype)
    st = hard + soft - jax.lax.stop_gradient(soft)
    return st[..., 0]


class DynamicSelect:
    """LLM-side trained selection strategy (plugs into the two-stage prefill)."""

    llm_side = True
    capture = "dart"  # only needs hidden states at the target layer
    name = "dynamic"

    def __init__(self, predictor_params: dict | None = None,
                 target_layer: int = 2, seed: int = 0):
        self.target_layer = target_layer
        self.seed = seed
        self.predictor_params = predictor_params  # lazily sized to the model
        self._fwd = jax.jit(predictor_forward, static_argnames=("num_heads",))

    def select(self, fastv_scores, key_l1, hidden_t, image_positions, budget):
        if self.predictor_params is None:
            self.predictor_params = init_predictor_params(
                jax.random.PRNGKey(self.seed), int(hidden_t.shape[-1])
            )
        x = jnp.asarray(hidden_t[image_positions], jnp.float32)[None]
        logits = self._fwd(self.predictor_params, x)
        score = np.asarray(jax.nn.log_softmax(logits, -1))[0, :, 0]
        n = len(image_positions)
        k = max(1, int(n * budget))
        top = np.sort(np.argsort(-score, kind="stable")[:k])
        return image_positions[top]
