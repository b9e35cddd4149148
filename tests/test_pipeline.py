"""Pipeline parallelism (core/pipeline.py): GPipe stage-sharded layers.

Asserts the pipelined forward equals the single-device ``lm_prefill_layers``
scan (values) and that gradients flow through the ppermute schedule (the
training-forward contract), on the 8-virtual-CPU-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.core.pipeline import lm_prefill_layers_pp
from visionselector_tpu.models.qwen25vl.lm import lm_prefill_layers
from visionselector_tpu.models.qwen25vl.model import init_params


def _setup(b=4, t=24, seed=0, depth=4):
    cfg = qwen25vl_tiny()
    params = init_params(jax.random.PRNGKey(seed), cfg)
    layers = params["lm"]["layers"]
    n = jax.tree.leaves(layers)[0].shape[0]
    if depth > n:  # tile the tiny config's stack to the requested depth
        assert depth % n == 0
        layers = jax.tree.map(
            lambda x: jnp.concatenate([x] * (depth // n), axis=0), layers
        )
    txt = cfg.text
    rng = np.random.RandomState(seed)
    x = jnp.asarray(
        rng.randn(b, t, txt.hidden_size).astype(np.float32) * 0.1
    )
    pos = jnp.asarray(
        np.broadcast_to(np.arange(t), (3, b, t)).astype(np.int32)
    )
    seg = jnp.ones((b, t), jnp.int32)
    return cfg, layers, x, pos, seg


def _stage_mesh(n_stages):
    devs = jax.devices()
    if len(devs) < n_stages:
        pytest.skip(f"needs {n_stages} devices")
    return Mesh(np.array(devs[:n_stages]), ("stage",))


class TestPipelineForward:
    @pytest.mark.parametrize("n_stages,n_micro", [(2, 2), (4, 4), (2, 4)])
    def test_matches_scan(self, n_stages, n_micro):
        cfg, layers, x, pos, seg = _setup()
        n_layers = jax.tree.leaves(layers)[0].shape[0]
        if n_layers % n_stages:
            pytest.skip("layer count not divisible")
        ref, _ = lm_prefill_layers(layers, x, pos, seg, cfg.text)
        mesh = _stage_mesh(n_stages)
        out = lm_prefill_layers_pp(
            layers, x, pos, seg, cfg.text, mesh, n_microbatches=n_micro
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_padding_microbatch_mix(self):
        """Ragged segment ids (padding rows) survive the pipeline."""
        cfg, layers, x, pos, seg = _setup(b=4, t=16, depth=4)
        seg = seg.at[1, 8:].set(0).at[3, 4:].set(0)
        ref, _ = lm_prefill_layers(layers, x, pos, seg, cfg.text)
        mesh = _stage_mesh(4)
        out = lm_prefill_layers_pp(
            layers, x, pos, seg, cfg.text, mesh, n_microbatches=2
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )


class TestPipelineGrad:
    def test_grads_match_scan(self):
        """d(loss)/d(layer params) through the pipeline == through the scan
        — pipeline parallelism is a training feature, not inference-only."""
        cfg, layers, x, pos, seg = _setup(b=2, t=12)
        mesh = _stage_mesh(2)

        def loss_scan(layers):
            h, _ = lm_prefill_layers(layers, x, pos, seg, cfg.text)
            return (h.astype(jnp.float32) ** 2).mean()

        def loss_pp(layers):
            h = lm_prefill_layers_pp(
                layers, x, pos, seg, cfg.text, mesh, n_microbatches=2
            )
            return (h.astype(jnp.float32) ** 2).mean()

        g_ref = jax.grad(loss_scan)(layers)
        g_pp = jax.grad(loss_pp)(layers)
        flat_ref = jax.tree.leaves(g_ref)
        flat_pp = jax.tree.leaves(g_pp)
        assert len(flat_ref) == len(flat_pp)
        for a, b in zip(flat_ref, flat_pp):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=5e-3, atol=1e-5
            )
