"""Training tests: loss wiring, gradient flow, annealing, 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visionselector_tpu.core.config import qwen25vl_tiny
from visionselector_tpu.core.mesh import batch_sharding, make_mesh, shard_params
from visionselector_tpu.models.qwen25vl.model import init_params
from visionselector_tpu.train.data import build_train_sample, stack_samples
from visionselector_tpu.train.loss import (
    IGNORE_INDEX,
    bce,
    cross_entropy,
    reg_weight_schedule,
    selector_train_forward,
)
from visionselector_tpu.train.train_step import (
    ScheduleConfig,
    batch_loss,
    init_train_state,
    train_step,
)

CFG = qwen25vl_tiny()
S_BUCKET = 64
T_BUCKET = 64
BUDGET = 0.25
K_MAX = max(1, int((S_BUCKET // 4) * BUDGET))


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches():
    """Full-suite runs accumulate hundreds of live compiled CPU
    executables by this module; XLA's CPU backend then segfaults inside
    backend_compile on this module's SFT program (reproduced 3x at the
    same test; each suite half passes in isolation, so no single module
    is at fault — it is total compile-cache pressure). Dropping the jit
    caches at the module boundary keeps the process inside the backend's
    envelope; later modules recompile their own programs as usual."""
    jax.clear_caches()
    yield


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), CFG)


def make_batch(batch_size=2, seed=0):
    rng = np.random.RandomState(seed)
    samples = []
    for i in range(batch_size):
        img = (rng.rand(56, 56, 3) * 255).astype(np.uint8)
        samples.append(
            build_train_sample(
                CFG, img,
                prompt_before=[101, 102],
                prompt_after=[103],
                answer_ids=[201, 202, 203],
                budget=BUDGET,
                s_bucket=S_BUCKET,
                t_bucket=T_BUCKET,
                min_pixels=1, max_pixels=10**9,
            )
        )
    batch = stack_samples(samples)
    return jax.tree.map(jnp.asarray, batch)


class TestLossPieces:
    def test_cross_entropy_ignores_masked(self):
        logits = jnp.asarray(np.random.RandomState(0).randn(5, 11), jnp.float32)
        labels = jnp.asarray([1, IGNORE_INDEX, 3, IGNORE_INDEX, 5])
        ce = cross_entropy(logits, labels)
        # manual
        lp = jax.nn.log_softmax(logits, -1)
        want = -(lp[0, 1] + lp[2, 3] + lp[4, 5]) / 3
        np.testing.assert_allclose(float(ce), float(want), rtol=1e-6)

    def test_bce_masked_mean(self):
        p = jnp.asarray([0.9, 0.1, 0.5, 0.7])
        y = jnp.asarray([1.0, 0.0, 1.0, 0.0])
        valid = jnp.asarray([1.0, 1.0, 1.0, 0.0])
        got = float(bce(p, y, valid))
        want = -(np.log(0.9) + np.log(0.9) + np.log(0.5)) / 3
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_reg_weight_anneal(self):
        assert float(reg_weight_schedule(jnp.asarray(0), 100)) == pytest.approx(0.1)
        assert float(reg_weight_schedule(jnp.asarray(50), 100)) == pytest.approx(1.05)
        assert float(reg_weight_schedule(jnp.asarray(100), 100)) == pytest.approx(2.0)
        assert float(reg_weight_schedule(jnp.asarray(200), 100)) == pytest.approx(2.0)


class TestTrainForward:
    def test_forward_finite(self, params):
        batch = make_batch(1)
        sample = jax.tree.map(lambda x: x[0], batch)
        loss, metrics = selector_train_forward(
            params, sample, CFG, jnp.asarray(0.5), K_MAX
        )
        assert np.isfinite(float(loss))
        # soft mass should approximate k
        np.testing.assert_allclose(
            float(metrics["soft_mass"]), float(sample.k), rtol=0.05
        )

    def test_grads_flow_only_through_scorer(self, params):
        batch = make_batch(2)
        grads = jax.grad(
            lambda sp: batch_loss(sp, params, batch, CFG, jnp.asarray(1.0), K_MAX)[0]
        )(params["scorer"])
        norms = jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads)
        assert any(v > 0 for v in jax.tree.leaves(norms)), norms


class TestTrainStep:
    def test_loss_decreases(self, params):
        # pin reg_weight so the curriculum doesn't inflate the loss while the
        # scorer optimizes (annealing is tested separately above)
        sched = ScheduleConfig(
            total_steps=20, lr=5e-3, reg_weight_start=1.0, reg_weight_end=1.0
        )
        state = init_train_state(params, sched)
        batch = make_batch(2)
        losses, bces = [], []
        for _ in range(8):
            state, metrics = train_step(
                state, params, batch, CFG, K_MAX, sched
            )
            losses.append(float(metrics["loss"]))
            bces.append(float(metrics["bce"]))
        # train on one fixed batch: composite loss and the BCE constraint term
        # must both shrink
        assert losses[-1] < losses[0], losses
        assert bces[-1] < bces[0], bces
        assert int(state.step) == 8

    def test_mesh_data_parallel(self, params):
        """Full train step on a (4 data, 2 model) mesh of 8 CPU devices."""
        mesh = make_mesh(n_data=4, n_model=2)
        sharded_frozen = shard_params(params, mesh)
        sched = ScheduleConfig(total_steps=10)
        state = init_train_state(params, sched)
        batch = make_batch(4)
        spec = batch_sharding(mesh)
        batch = jax.tree.map(lambda x: jax.device_put(x, spec(x)), batch)
        state2, metrics = train_step(
            state, sharded_frozen, batch, CFG, K_MAX, sched
        )
        assert np.isfinite(float(metrics["loss"]))

        # sharded result must match single-device result
        state_ref = init_train_state(params, sched)
        batch_local = jax.tree.map(lambda x: jax.device_put(x, jax.devices()[0]), batch)
        state3, metrics3 = train_step(
            state_ref, params, batch_local, CFG, K_MAX, sched
        )
        np.testing.assert_allclose(
            float(metrics["loss"]), float(metrics3["loss"]), rtol=1e-5
        )


class TestRematAndClipping:
    def test_remat_is_exact(self, params):
        """Gradient checkpointing is a pure memory knob: loss, grads and
        the updated params are identical with remat on and off."""
        batch = make_batch(2)
        sched_off = ScheduleConfig(total_steps=10, remat=False)
        sched_on = ScheduleConfig(total_steps=10, remat=True)
        s_off, m_off = train_step(
            init_train_state(params, sched_off), params, batch, CFG,
            K_MAX, sched_off)
        s_on, m_on = train_step(
            init_train_state(params, sched_on), params, batch, CFG,
            K_MAX, sched_on)
        np.testing.assert_allclose(float(m_off["loss"]),
                                   float(m_on["loss"]), rtol=1e-6)
        np.testing.assert_allclose(float(m_off["grad_norm"]),
                                   float(m_on["grad_norm"]), rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
            s_off.scorer_params, s_on.scorer_params)

    def test_grad_clipping_engages(self):
        """make_optimizer clips at the global norm: a huge threshold
        matches the unclipped update; a small one rescales the gradient
        before AdamW sees it."""
        import optax

        from visionselector_tpu.train.train_step import make_optimizer

        g = {"w": jnp.asarray([3.0, 4.0])}  # ||g|| = 5
        p = {"w": jnp.zeros(2)}

        def update(sched):
            opt = make_optimizer(sched)
            st = opt.init(p)
            u, _ = opt.update(g, st, p)
            return u

        u_off = update(ScheduleConfig(total_steps=10, max_grad_norm=0.0))
        u_big = update(ScheduleConfig(total_steps=10, max_grad_norm=1e9))
        jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b),
                     u_off, u_big)
        # clipped at 0.5: AdamW should see g * (0.5 / 5)
        u_clip = update(ScheduleConfig(total_steps=10, max_grad_norm=0.5))
        opt_ref = make_optimizer(
            ScheduleConfig(total_steps=10, max_grad_norm=0.0))
        st = opt_ref.init(p)
        u_ref, _ = opt_ref.update(
            jax.tree.map(lambda x: x * 0.1, g), st, p)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
            u_clip, u_ref)


class TestBaselineSFT:
    def test_sft_step_trains_only_masked_leaves(self, params):
        """train_qwen.py parity: tune_mm_llm trains the LM, vision/scorer
        frozen; loss decreases."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from visionselector_tpu.train.data import (
            build_train_sample,
            stack_samples,
        )
        from visionselector_tpu.train.sft import (
            SFTScheduleConfig,
            init_sft_state,
            sft_train_step,
            trainable_mask,
        )

        cfg = CFG
        rng = np.random.RandomState(0)
        samples = [build_train_sample(
            cfg, (rng.rand(56, 56, 3) * 255).astype(np.uint8),
            [101, 102], [103], [201, 202, 203],
            budget=0.25, s_bucket=64, t_bucket=64,
            min_pixels=1, max_pixels=10**9,
        ) for _ in range(2)]
        batch = jax.tree.map(jnp.asarray, stack_samples(samples))

        sched = SFTScheduleConfig(total_steps=6, lr=5e-4, tune_mm_llm=True)
        mask = trainable_mask(params, sched)
        assert mask["lm"]["embed_tokens"] is True
        assert mask["visual"]["patch_embed_kernel"] is False
        assert mask["visual"]["merger_fc1_kernel"] is False
        assert mask["scorer"]["q_kernel"] is False

        state = init_sft_state(jax.tree.map(jnp.copy, params), sched)
        vis_before = np.asarray(state.params["visual"]["patch_embed_kernel"])
        losses = []
        for _ in range(6):
            state, metrics = sft_train_step(state, batch, cfg, sched)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses
        # frozen leaves unchanged, trainable moved
        np.testing.assert_array_equal(
            np.asarray(state.params["visual"]["patch_embed_kernel"]),
            vis_before,
        )
        assert not np.array_equal(
            np.asarray(state.params["lm"]["embed_tokens"]),
            np.asarray(params["lm"]["embed_tokens"]),
        )

    def test_mlp_flag_overrides_vision(self):
        import jax

        from visionselector_tpu.models.qwen25vl.model import init_params
        from visionselector_tpu.train.sft import (
            SFTScheduleConfig,
            trainable_mask,
        )

        p = init_params(jax.random.PRNGKey(0), CFG)
        sched = SFTScheduleConfig(tune_mm_vision=True, tune_mm_mlp=False,
                                  tune_mm_llm=False)
        mask = trainable_mask(p, sched)
        assert mask["visual"]["qkv_kernel" if "qkv_kernel" in mask["visual"]
                              else "patch_embed_kernel"] is True
        assert mask["visual"]["merger_fc1_kernel"] is False

    def test_sft_cli_smoke(self, tmp_path, capsys):
        import json
        import os

        import numpy as np

        from visionselector_tpu.api.train import main

        out = str(tmp_path / "sft")
        rc = main([
            "--output-dir", out, "--smoke", "--method", "sft",
            "--total-steps", "2", "--batch-size", "2", "--save-steps", "2",
            "--log-steps", "1", "--tune-mm-llm",
        ])
        assert rc == 0
        lines = [l for l in capsys.readouterr().out.splitlines()
                 if l.startswith("{")]
        assert np.isfinite(json.loads(lines[-1])["loss"])
        assert os.path.exists(os.path.join(out, "checkpoint-2"))

    def test_ov_sft_cli_smoke(self, tmp_path, capsys):
        """OV-family baseline SFT (reference
        ``llava-ov-15/src/train/train_sft.py`` generic finetune) through
        the sample-type dispatch in ``train/sft.py:forward_logits``."""
        import json
        import os

        import numpy as np

        from visionselector_tpu.api.train import main

        out = str(tmp_path / "ovsft")
        rc = main([
            "--output-dir", out, "--smoke", "--method", "sft",
            "--family", "llava_ov15", "--total-steps", "2",
            "--batch-size", "2", "--save-steps", "2", "--log-steps", "1",
        ])
        assert rc == 0
        lines = [l for l in capsys.readouterr().out.splitlines()
                 if l.startswith("{")]
        assert np.isfinite(json.loads(lines[-1])["loss"])
        assert os.path.exists(os.path.join(out, "checkpoint-2"))

    def test_accum_cli_smoke(self, tmp_path, capsys):
        import json

        import numpy as np

        from visionselector_tpu.api.train import main

        out = str(tmp_path / "accum")
        rc = main([
            "--output-dir", out, "--smoke", "--total-steps", "2",
            "--batch-size", "2", "--grad-accum-steps", "2",
            "--save-steps", "2", "--log-steps", "1",
        ])
        assert rc == 0
        lines = [l for l in capsys.readouterr().out.splitlines()
                 if l.startswith("{")]
        assert np.isfinite(json.loads(lines[-1])["loss"])

    def test_prefetch_matches_sync(self, tmp_path, capsys):
        """--prefetch builds batches in a background thread; the stream
        cursor is owned by that thread alone, so the batch order (and
        every logged loss) must equal the synchronous loop's."""
        import json

        from visionselector_tpu.api.train import main

        losses = {}
        for pf in ("0", "2"):
            out = str(tmp_path / f"pf{pf}")
            rc = main([
                "--output-dir", out, "--smoke", "--total-steps", "3",
                "--batch-size", "2", "--save-steps", "3",
                "--log-steps", "1", "--prefetch", pf,
            ])
            assert rc == 0
            lines = [l for l in capsys.readouterr().out.splitlines()
                     if l.startswith("{")]
            losses[pf] = [json.loads(l)["loss"] for l in lines]
        assert losses["0"] == losses["2"]


class TestBatchPrefetcher:
    def test_preserves_order(self):
        from visionselector_tpu.train.prefetch import BatchPrefetcher

        it = iter(range(100))
        pf = BatchPrefetcher(lambda: next(it), size=4)
        got = [next(pf) for _ in range(50)]
        pf.close()
        assert got == list(range(50))

    def test_propagates_exception(self):
        from visionselector_tpu.train.prefetch import BatchPrefetcher

        state = {"n": 0}

        def make():
            state["n"] += 1
            if state["n"] > 3:
                raise ValueError("boom")
            return state["n"]

        pf = BatchPrefetcher(make, size=1)
        seen = []
        with pytest.raises(ValueError, match="boom"):
            for _ in range(10):
                seen.append(next(pf))
        assert seen == [1, 2, 3]
        pf.close()

    def test_close_joins_thread(self):
        import time as _time

        from visionselector_tpu.train.prefetch import BatchPrefetcher

        pf = BatchPrefetcher(lambda: _time.sleep(0.01) or 0, size=2)
        next(pf)
        pf.close()
        assert not pf._thread.is_alive()


class TestGradAccum:
    """Gradient accumulation: an accumulated step over A equal micro-batches
    must equal one step over the concatenated A*B batch (mean-of-means ==
    global mean), while lax.scan keeps one micro-batch of activations live
    at a time — reference --gradient_accumulation_steps (sft_3b.sh:48)."""

    def _split(self, batch, a):
        return jax.tree.map(
            lambda x: x.reshape((a, x.shape[0] // a) + x.shape[1:]), batch)

    def test_selector_accum_equals_big_batch(self, params):
        from visionselector_tpu.train.train_step import train_step_accum

        sched = ScheduleConfig(total_steps=10, lr=5e-3,
                               reg_weight_start=1.0, reg_weight_end=1.0)
        batch = make_batch(4)
        s1, m1 = train_step(init_train_state(params, sched), params, batch,
                            CFG, K_MAX, sched)
        s2, m2 = train_step_accum(init_train_state(params, sched), params,
                                  self._split(batch, 2), CFG, K_MAX, sched)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree.leaves(s1.scorer_params),
                        jax.tree.leaves(s2.scorer_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-7)
        assert int(s2.step) == 1

    def test_sft_accum_equals_big_batch(self, params):
        from visionselector_tpu.train.sft import (
            SFTScheduleConfig,
            init_sft_state,
            sft_train_step,
            sft_train_step_accum,
        )

        sched = SFTScheduleConfig(total_steps=10, lr=1e-3)
        batch = make_batch(4)
        s1, m1 = sft_train_step(
            init_sft_state(jax.tree.map(jnp.copy, params), sched), batch,
            CFG, sched)
        s2, m2 = sft_train_step_accum(
            init_sft_state(jax.tree.map(jnp.copy, params), sched),
            self._split(batch, 2), CFG, sched)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-5)
        la, lb = jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)
        for a, b in zip(la, lb):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=2e-2, atol=3e-3)

    def test_dynamic_accum_runs(self, params):
        """Dynamic predictor accum: Gumbel keys differ per micro-batch so
        exact equality isn't defined; assert a finite step that updates."""
        from visionselector_tpu.selector.baselines.dynamic import (
            init_predictor_params,
        )
        from visionselector_tpu.train.dynamic_train import (
            DynamicScheduleConfig,
            dynamic_train_step_accum,
            init_dynamic_train_state,
        )

        sched = DynamicScheduleConfig(total_steps=10, lr=1e-3, budget=0.25)
        predictor = init_predictor_params(
            jax.random.PRNGKey(0), CFG.text.hidden_size, d_model=32,
            num_heads=4)
        state = init_dynamic_train_state(predictor, sched, seed=0)
        before = jax.tree.map(np.asarray, state.predictor_params)
        batch = make_batch(4)
        state2, metrics = dynamic_train_step_accum(
            state, params, self._split(batch, 2), CFG, sched)
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["grad_norm"]) > 0
        # warmup-cosine lr is 0 at step 0; the second step moves params
        state3, _ = dynamic_train_step_accum(
            state2, params, self._split(batch, 2), CFG, sched)
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(before),
                            jax.tree.leaves(state3.predictor_params)))
        assert changed

    def test_selector_accum_on_mesh(self, params):
        from visionselector_tpu.core.mesh import accum_batch_sharding
        from visionselector_tpu.train.train_step import train_step_accum

        mesh = make_mesh(n_data=4, n_model=2)
        sched = ScheduleConfig(total_steps=10)
        batch = self._split(make_batch(4), 1)  # [1, 4, ...]
        spec = accum_batch_sharding(mesh)
        batch = jax.tree.map(lambda x: jax.device_put(x, spec(x)), batch)
        state2, metrics = train_step_accum(
            init_train_state(params, sched), shard_params(params, mesh),
            batch, CFG, K_MAX, sched)
        assert np.isfinite(float(metrics["loss"]))
