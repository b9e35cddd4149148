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


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables at every module boundary.

    The full suite compiles hundreds of XLA:CPU programs in one process;
    letting them all stay live eventually segfaults a LATER compile inside
    ``backend_compile_and_load`` (observed deterministically per module
    composition — e.g. test_hf_parity's mixed image+video generate after
    ~34% of the suite — while the same test passes standalone or in any
    short composition; not OOM, 120+ GB free; independent of the native C
    loader, reproduced with VST_NATIVE=0). Dropping executables between
    modules keeps the live-code footprint bounded. Costs per-module
    recompiles of shared tiny-config programs (~minutes over the suite).
    """
    yield
    import jax

    jax.clear_caches()
