"""Tensor-parallel inference: _prefill with model-axis-sharded weights must
equal the single-device forward (SURVEY §2.9 TP analog; the 7B-on-v5e
fallback besides int8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.core.mesh import make_mesh, shard_params
from visionselector_tpu.models.qwen25vl.model import init_params

CFG = qwen25vl_tiny()


class TestTPInference:
    def test_sharded_prefill_matches_single_device(self):
        import __graft_entry__ as g

        params = init_params(jax.random.PRNGKey(0), CFG)
        inputs, k_max = g._example_inputs(CFG)

        from visionselector_tpu.models.qwen25vl.model import _prefill

        def run(p):
            out = _prefill(p, CFG, k_max, True, *inputs.values())
            return np.asarray(out[0]), np.asarray(out[6])  # token, logits

        tok_ref, logits_ref = run(params)

        mesh = make_mesh(n_data=4, n_model=2, devices=jax.devices()[:8])
        sharded = shard_params(params, mesh)
        tok_tp, logits_tp = run(sharded)

        assert tok_tp == tok_ref
        np.testing.assert_allclose(logits_tp, logits_ref, atol=2e-4, rtol=1e-3)


class TestExpertParallel:
    def test_ep_shard_map_matches_dense(self):
        """True expert parallelism: expert axis sharded over 'model' via
        shard_map (each device scans only its local experts, one psum) must
        equal the dense single-device _moe_mlp."""
        import jax.numpy as jnp

        from visionselector_tpu.core.config import llava_ov_moe_tiny
        from visionselector_tpu.core.mesh import make_mesh
        from visionselector_tpu.models.llava_ov15.model import init_ov_params
        from visionselector_tpu.models.qwen25vl import lm as lm_mod

        cfg = llava_ov_moe_tiny()
        params = init_ov_params(jax.random.PRNGKey(0), cfg)
        layer0 = jax.tree.map(lambda a: a[0], params["lm"]["layers"])
        x = jnp.asarray(
            np.random.RandomState(0).randn(1, 8, cfg.text.hidden_size),
            jnp.float32,
        )
        dense = lm_mod._moe_mlp(x, layer0, cfg.text)
        mesh = make_mesh(n_data=4, n_model=2, devices=jax.devices()[:8])
        ep = lm_mod.moe_mlp_ep(x, layer0, cfg.text, mesh)
        np.testing.assert_allclose(
            np.asarray(ep), np.asarray(dense), atol=2e-5, rtol=1e-4
        )

    def test_moe_forward_matches_single_device(self):
        """Expert kernels shard their intermediate dim over the model axis
        (TP inside each expert — the scanned expert axis must stay unsharded
        or every scan iteration would regather); sharded forward must equal
        the single-device one."""
        import jax.numpy as jnp

        from visionselector_tpu.core.config import llava_ov_moe_tiny
        from visionselector_tpu.models.llava_ov15.model import init_ov_params
        from visionselector_tpu.models.qwen25vl import lm as lm_mod

        cfg = llava_ov_moe_tiny()
        params = init_ov_params(jax.random.PRNGKey(0), cfg)

        t = 8
        ids = jnp.asarray(np.random.RandomState(0).randint(0, 1000, t))
        embeds = lm_mod.embed_tokens(params["lm"], ids)[None]
        pos = jnp.broadcast_to(jnp.arange(t), (3, 1, t))
        seg = jnp.ones((1, t), jnp.int32)

        def run(p):
            h, _ = lm_mod.lm_prefill(p["lm"], embeds, pos, seg, cfg.text)
            return np.asarray(h)

        ref = run(params)
        mesh = make_mesh(n_data=4, n_model=2, devices=jax.devices()[:8])
        sharded = shard_params(params, mesh)
        from jax.sharding import NamedSharding, PartitionSpec

        sh = sharded["lm"]["layers"]["expert_gate_kernel"].sharding
        assert isinstance(sh, NamedSharding)
        # [n_layers, E, d, mi]: intermediate (last) dim sharded, expert
        # (scanned) axis replicated
        assert sh.spec == PartitionSpec(None, None, None, "model"), sh.spec
        sh_down = sharded["lm"]["layers"]["expert_down_kernel"].sharding
        assert sh_down.spec == PartitionSpec(None, None, "model", None), \
            sh_down.spec
        np.testing.assert_allclose(run(sharded), ref, atol=2e-5, rtol=1e-4)


class TestTPServing:
    def test_tp_continuous_batcher_matches_single_device(self):
        """Continuous batching over model-axis-sharded weights: the slot
        pool, chunk program, and admissions pick the sharding up through
        GSPMD propagation; rollouts equal the single-device oracle
        (SURVEY §2.9 TP extended from prefill to the serving decode path)."""
        import numpy as np

        from visionselector_tpu.models.qwen25vl.continuous import (
            ContinuousBatcher,
        )
        from visionselector_tpu.models.qwen25vl.model import QwenVLEngine
        from visionselector_tpu.preprocess.image import preprocess_image
        from visionselector_tpu.preprocess.rope import expand_vision_tokens

        params = init_params(jax.random.PRNGKey(0), CFG)
        img = (np.random.RandomState(0).rand(56, 84, 3) * 255).astype(
            np.uint8)
        pixels, grid = preprocess_image(img)
        ids = expand_vision_tokens(
            [5, 6, 7], [8, 9], grid,
            image_token_id=CFG.image_token_id,
            vision_start_token_id=CFG.vision_start_token_id,
            vision_end_token_id=CFG.vision_end_token_id)
        req = dict(input_ids=ids, pixel_values=pixels, grid_thw=grid)

        eng = QwenVLEngine(CFG, params, use_selector=True, budget=0.5)
        want = eng.generate(
            **req, max_new_tokens=10, eos_token_ids=(-1,)).tokens

        mesh = make_mesh(n_data=4, n_model=2, devices=jax.devices()[:8])
        eng_tp = QwenVLEngine(CFG, shard_params(params, mesh),
                              use_selector=True, budget=0.5)
        bat = ContinuousBatcher(eng_tp, n_slots=2, t_max=256, chunk=4)
        try:
            r1 = bat.submit(dict(req), 10, (-1,))
            r2 = bat.submit(dict(req), 10, (-1,))
        finally:
            bat.shutdown()
        assert r1.tokens == want, (r1.tokens, want)
        assert r2.tokens == want

    def test_serve_tp_flag_shards_engine(self):
        """serve --tp N: weights land model-axis-sharded; /generate output
        equals the unsharded server's."""
        import argparse
        import json
        import threading
        import urllib.request

        from visionselector_tpu.api.serve import build_server

        def mk(tp):
            args = argparse.Namespace(
                model_path=None, method="selector", budget=0.5,
                host="127.0.0.1", port=0, tp=tp)
            httpd = build_server(args)
            port = httpd.server_address[1]
            threading.Thread(target=httpd.serve_forever,
                             daemon=True).start()
            return httpd, port

        def ask(port):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps({"prompt": "hi there",
                                 "max_new_tokens": 6}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                return json.loads(r.read())

        h1, p1 = mk(0)
        h2, p2 = mk(2)
        try:
            a = ask(p1)
            b = ask(p2)
            assert a["tokens"] == b["tokens"], (a, b)
            leaves = jax.tree_util.tree_leaves(
                h2.server_obj.engine.params)
            assert any(
                getattr(x.sharding, "spec", None) is not None
                and "model" in str(x.sharding.spec) for x in leaves)
        finally:
            for h in (h1, h2):
                h.shutdown()
                if hasattr(h, "server_obj"):
                    h.server_obj.close()
