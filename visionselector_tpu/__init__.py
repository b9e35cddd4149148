"""VisionSelector-TPU: a TPU-native learnable visual token compression framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
JulietChoo/VisionSelector reference (learnable importance scoring + differentiable
top-k token compression for VLMs), built for TPU:

- Functional models over parameter pytrees, compiled with ``jax.jit``/``pjit``.
- Pallas flash-attention kernels with segment-id (varlen) support covering both the
  ViT window attention and causal LLM prefill over compressed sequences.
- A differentiable top-k operator implemented with ``jax.custom_vjp`` (bisection
  forward, analytic Jacobian-vector-product backward).
- Host-side preprocessing (smart_resize, patchify, window/rope index construction)
  feeding statically-shaped, bucketed device programs.
- Data/tensor-parallel scaling via ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
