"""Sequence-parallel ViT: patch axis sharded over the mesh 'model' axis.

Window layers run with zero communication under the window-aligned layout
(shards are whole 64-patch slots); full-attention layers all-gather k/v.
Sharded output must equal the single-device tower.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.core.mesh import make_mesh
from visionselector_tpu.models.qwen25vl import vit as vit_mod
from visionselector_tpu.models.qwen25vl.model import init_params
from visionselector_tpu.preprocess.indices import (
    aligned_window_len,
    build_vision_batch,
)

CFG = qwen25vl_tiny()


def build_aligned(grid, n_shards):
    rng = np.random.RandomState(0)
    n = int((grid[:, 0] * grid[:, 1] * grid[:, 2]).sum())
    pixels = rng.randn(n, CFG.vision.patch_dim).astype(np.float32)
    kw = dict(
        window_size=CFG.vision.window_size,
        spatial_merge_size=CFG.vision.spatial_merge_size,
        patch_size=CFG.vision.patch_size,
    )
    need = aligned_window_len(grid, **kw)
    win = CFG.vision.window_size // CFG.vision.spatial_merge_size \
        // CFG.vision.patch_size
    slot = win * win * CFG.vision.spatial_merge_unit
    unit = n_shards * slot
    pad = -(-need // unit) * unit
    return build_vision_batch(pixels, grid, pad_to=pad, align_windows=True,
                              **kw)


class TestSequenceParallelViT:
    @pytest.mark.parametrize("grid", [
        np.array([[1, 8, 16]]),                    # one image
        np.array([[1, 8, 8], [1, 12, 8]]),         # multi-image (full-attn
                                                   # segments straddle shards)
    ])
    def test_matches_single_device(self, grid):
        mesh = make_mesh(n_data=2, n_model=4)
        vb = build_aligned(grid, 4)
        params = init_params(jax.random.PRNGKey(0), CFG,
                             with_selector=False)["visual"]
        args = (jnp.asarray(vb.pixel_values), jnp.asarray(vb.rot_pos_ids),
                jnp.asarray(vb.window_seg_ids), jnp.asarray(vb.full_seg_ids),
                jnp.asarray(vb.reverse_index))
        want = np.asarray(
            vit_mod.vit_forward(params, *args, CFG.vision)
        )[: vb.num_merged]
        got = np.asarray(
            jax.jit(
                lambda p, *a: vit_mod.vit_forward_sp(
                    p, *a, CFG.vision, mesh=mesh
                )
            )(params, *args)
        )[: vb.num_merged]
        np.testing.assert_allclose(got, want, atol=2e-5)
