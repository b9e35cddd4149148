"""LoRA adapters for the decoder (reference parity: peft LoRA in
``llava-ov-15/src/train/train_sft_visionselector.py:300-310`` — rank 64,
alpha 16, LM linear targets, frozen base — and the merge tool
``src/merge_lora_weights.py``).

TPU-native design: adapters are extra leaves inside the scan-stacked
``layers`` dict (``<kernel>_lora_a`` [n, in, r], ``<kernel>_lora_b``
[n, r, out], ``<kernel>_lora_scale`` scalar = alpha/rank), so the decoder's
``_dense`` picks them up transparently — base weights may even be int8. B
initializes to zero (peft convention: adapters start as a no-op).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

DEFAULT_TARGETS: Tuple[str, ...] = (
    "q_kernel", "k_kernel", "v_kernel", "o_kernel",
    "gate_kernel", "up_kernel", "down_kernel",
)


def add_lora_params(
    lm_params: dict,
    key: jax.Array,
    rank: int = 64,
    alpha: int = 16,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> dict:
    """Return lm_params with LoRA leaves added for each target kernel."""
    layers = dict(lm_params["layers"])
    ks = jax.random.split(key, len(targets))
    for k, name in zip(ks, targets):
        w = layers[name]  # [n, in, out] (dtype may be int8)
        n, din, dout = w.shape
        layers[name + "_lora_a"] = (
            jax.random.normal(k, (n, din, rank)) * (1.0 / rank)
        ).astype(dtype)
        layers[name + "_lora_b"] = jnp.zeros((n, rank, dout), dtype)
        layers[name + "_lora_scale"] = jnp.full((n,), alpha / rank, jnp.float32)
    out = dict(lm_params)
    out["layers"] = layers
    return out


def merge_lora_params(lm_params: dict) -> dict:
    """Fold LoRA adapters into the dense kernels and drop the adapter leaves
    (``merge_lora_weights.py`` semantics). int8 base kernels are dequantized,
    merged, and re-quantized is NOT attempted — merged output is fp."""
    layers = dict(lm_params["layers"])
    names = [n[: -len("_lora_a")] for n in layers if n.endswith("_lora_a")]
    for name in names:
        a = layers.pop(name + "_lora_a")
        b = layers.pop(name + "_lora_b")
        scale = layers.pop(name + "_lora_scale")
        w = layers[name]
        if w.dtype == jnp.int8:
            w = w.astype(jnp.float32) * layers.pop(name + "_scale")[:, None, :]
            out_dtype = a.dtype  # dequantized base merges to the adapter fp
        else:
            out_dtype = w.dtype
        delta = jnp.einsum("nir,nro->nio", a.astype(jnp.float32),
                           b.astype(jnp.float32)) * scale[:, None, None]
        layers[name] = (w.astype(jnp.float32) + delta).astype(out_dtype)
    out = dict(lm_params)
    out["layers"] = layers
    return out


def lora_leaf(path_name: str) -> bool:
    return "_lora_a" in path_name or "_lora_b" in path_name
