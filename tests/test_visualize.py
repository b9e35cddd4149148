"""Visualization output tests."""

import os

import numpy as np

from visionselector_tpu.eval.visualize import (
    render_heatmap,
    render_mask,
    score_grid,
    visualize_selection,
)


class TestVisualize:
    def test_score_grid_shape(self):
        grid = np.array([[1, 8, 10]])
        scores = np.arange(20, dtype=np.float32)
        g = score_grid(scores, grid)
        assert g.shape == (4, 5)
        assert g[0, 1] == 1.0

    def test_heatmap_and_mask(self):
        img = (np.random.RandomState(0).rand(56, 70, 3) * 255).astype(np.uint8)
        grid = np.array([[1, 8, 10]])
        scores = np.random.RandomState(1).rand(20).astype(np.float32)
        hm = render_heatmap(img, scores, grid)
        assert hm.shape == img.shape and hm.dtype == np.uint8
        mask = render_mask(img, [0, 5, 19], grid)
        assert mask.shape == img.shape
        # dropped regions dimmed, kept regions untouched
        assert mask.astype(int).sum() < img.astype(int).sum()

    def test_end_to_end_files(self, tmp_path):
        img = (np.random.RandomState(0).rand(56, 56, 3) * 255).astype(np.uint8)
        grid = np.array([[1, 8, 8]])
        scores = np.random.RandomState(1).rand(16).astype(np.float32)
        out = visualize_selection(
            img, scores, [1, 2, 3], grid, str(tmp_path / "viz")
        )
        assert len(out) == 2
        for p in out:
            assert os.path.exists(p)

    def test_engine_scores_exposed(self):
        import jax

        from visionselector_tpu.core.config import qwen25vl_tiny
        from visionselector_tpu.models.qwen25vl.model import (
            QwenVLEngine,
            init_params,
        )
        from visionselector_tpu.preprocess.image import preprocess_image
        from visionselector_tpu.preprocess.rope import expand_vision_tokens

        cfg = qwen25vl_tiny()
        params = init_params(jax.random.PRNGKey(0), cfg)
        img = (np.random.RandomState(3).rand(56, 56, 3) * 255).astype(np.uint8)
        pixels, grid = preprocess_image(img, min_pixels=1, max_pixels=10**9)
        ids = expand_vision_tokens([100], [300], grid)
        eng = QwenVLEngine(cfg, params, use_selector=True, budget=0.5)
        res = eng.generate(ids, pixels, grid, max_new_tokens=1)
        assert res.scores is not None
        assert res.scores.shape == (res.num_vision_tokens,)
        # heatmap renders from the engine output directly
        hm = render_heatmap(img, res.scores, grid)
        assert hm.shape == img.shape


class TestPredictVisualize:
    def test_predict_writes_pngs(self, tmp_path, capsys):
        import json
        import os

        from visionselector_tpu.api.predict import main

        vdir = str(tmp_path / "viz")
        rc = main(["--method", "selector", "--budget", "0.5",
                   "--max-new-tokens", "1", "--visualize-dir", vdir])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert len(out["visualizations"]) == 2
        for p in out["visualizations"]:
            assert os.path.exists(p)


class TestEvalVisualize:
    def test_run_eval_writes_per_sample_pngs(self, tmp_path):
        import json
        import os

        import numpy as np
        from PIL import Image

        img_path = tmp_path / "img.png"
        Image.fromarray(
            (np.random.RandomState(0).rand(56, 56, 3) * 255).astype(np.uint8)
        ).save(img_path)
        with open(tmp_path / "chartqa.jsonl", "w") as f:
            f.write(json.dumps({"question": "q?", "answers": ["1"],
                                "image": "img.png"}) + "\n")

        from visionselector_tpu.api.run_eval import main

        vdir = str(tmp_path / "viz")
        rc = main([
            "--data-dir", str(tmp_path), "--tasks", "chartqa",
            "--method", "selector", "--budgets", "0.5", "--limit", "1",
            "--output-dir", str(tmp_path / "res"), "--visualize-dir", vdir,
        ])
        assert rc == 0
        names = os.listdir(vdir)
        assert any(n.endswith("_heatmap.png") for n in names)
        assert any(n.endswith("_mask.png") for n in names)
