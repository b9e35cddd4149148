"""Test configuration: force CPU with 8 virtual devices for mesh tests.

The environment pre-sets ``JAX_PLATFORMS=axon`` (one real TPU behind a slow
tunnel); tests must run on the host CPU, so override via jax.config before any
backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["VST_ATTN_IMPL"] = "xla"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import warnings

# CPU backend doesn't support buffer donation; the decode loop donates the KV
# cache for TPU. Quiet the benign warning in tests.
warnings.filterwarnings(
    "ignore", message="Some donated buffers were not usable"
)
