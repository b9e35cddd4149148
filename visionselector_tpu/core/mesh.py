"""Device mesh and sharding helpers.

The reference scales with torchrun DDP + DeepSpeed ZeRO (NCCL); the TPU-native
equivalent is a single ``jax.sharding.Mesh`` with named axes and jit-propagated
shardings — XLA inserts the collectives over ICI (SURVEY.md §2.9, §5.8):

- ``data``: batch sharding (DDP equivalent; gradient psum is implicit in the
  mean over the global batch).
- ``model``: tensor-parallel / weight-sharding axis (ZeRO-3 / TP equivalent):
  large parameter matrices are sharded on a hidden dimension.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (n_data, n_model, len(devices))
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def param_sharding_rules(path: tuple, leaf) -> P:
    """Weight-sharding spec: shard the biggest matrices over 'model'.

    Heuristic rules keyed on parameter names (works for both ViT and LM trees):
    - embeddings / lm_head: shard the vocab dim,
    - mlp gate/up: shard the intermediate (output) dim; down: input dim,
    - attention qkv/q/k/v: shard the head (output) dim; o/proj: input dim,
    - everything else (norms, biases, scorer): replicated.
    """
    name = "/".join(str(p) for p in path)
    ndim = getattr(leaf, "ndim", 0)
    if ndim == 0:
        return P()
    last = ndim - 1

    def spec(axis):
        parts = [None] * ndim
        parts[axis] = "model"
        return P(*parts)

    if "embed_tokens" in name or "lm_head" in name:
        return spec(0 if "embed_tokens" in name else last)
    # NOTE: MoE expert kernels ("expert_gate_kernel" etc.) intentionally fall
    # through to the substring rules below and shard their INTERMEDIATE dim:
    # _moe_mlp scans over the expert axis, and sharding a scanned leading axis
    # would force an all-gather per iteration while replicating the compute.
    # Intermediate-dim sharding splits every expert matmul across the model
    # axis (true tensor parallelism inside each expert).
    if any(k in name for k in ("gate_kernel", "up_kernel", "qkv_kernel",
                               "q_kernel", "k_kernel", "v_kernel",
                               "fc1_kernel")):
        return spec(last) if ndim >= 2 else P()
    if any(k in name for k in ("down_kernel", "o_kernel", "proj_kernel",
                               "fc2_kernel")):
        return spec(last - 1) if ndim >= 2 else P()
    return P()


def shard_params(params, mesh: Mesh):
    """Apply weight-sharding rules; divisibility-checked with fallback to
    replication (small dims on tiny configs may not divide the mesh)."""
    n_model = mesh.shape["model"]

    def place(path, leaf):
        spec = param_sharding_rules(path, leaf)
        # replicate if the sharded dim does not divide
        for i, s in enumerate(spec):
            if s == "model" and leaf.shape[i] % n_model != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(
        lambda p, l: place(tuple(getattr(x, "key", getattr(x, "idx", x)) for x in p), l),
        params,
    )


def batch_sharding(mesh: Mesh):
    """Leading-axis data sharding for a batch pytree."""
    def spec_for(leaf):
        parts = [None] * leaf.ndim
        if leaf.ndim >= 1:
            parts[0] = "data"
        return NamedSharding(mesh, P(*parts))

    return spec_for


def accum_batch_sharding(mesh: Mesh):
    """Data sharding for gradient-accumulation batches [A, B, ...]: the
    micro-step axis A is scanned (unsharded), the batch axis B shards
    over 'data'."""
    def spec_for(leaf):
        parts = [None] * leaf.ndim
        if leaf.ndim >= 2:
            parts[1] = "data"
        return NamedSharding(mesh, P(*parts))

    return spec_for
