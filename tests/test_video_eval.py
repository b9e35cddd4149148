"""Video preprocessing utilities + video eval pipeline tests."""

import json
import os

import numpy as np
import pytest

from visionselector_tpu.preprocess.video import (
    load_video_frames,
    process_video,
    smart_nframes,
    video_pixel_budget,
)


class TestSmartNFrames:
    def test_nframes_mode(self):
        assert smart_nframes({"nframes": 7}, total_frames=100, video_fps=30) == 8
        assert smart_nframes({"nframes": 8}, total_frames=100, video_fps=30) == 8

    def test_fps_mode(self):
        # 30s video at 30fps, sample at 2fps -> 60 frames
        assert smart_nframes({}, total_frames=900, video_fps=30) == 60

    def test_fps_min_max_bounds(self):
        # tiny video: clamps to min_frames (4) but never above total
        assert smart_nframes({}, total_frames=6, video_fps=30) == 4
        # max_frames bound
        n = smart_nframes({"max_frames": 16}, total_frames=10000, video_fps=1)
        assert n == 16

    def test_invalid(self):
        with pytest.raises(AssertionError):
            smart_nframes({"fps": 2, "nframes": 4}, 100, 30)

    def test_budget(self):
        b = video_pixel_budget(64)
        assert 128 * 28 * 28 <= b <= 768 * 28 * 28


class TestLoadFrames:
    def test_array_input(self):
        vid = (np.random.RandomState(0).rand(20, 32, 32, 3) * 255).astype(np.uint8)
        frames, fps = load_video_frames(vid, {"nframes": 4})
        assert frames.shape[0] == 4

    def test_frame_dir(self, tmp_path):
        from PIL import Image

        for i in range(6):
            Image.fromarray(
                (np.random.RandomState(i).rand(32, 32, 3) * 255).astype(np.uint8)
            ).save(tmp_path / f"frame_{i:03d}.png")
        frames, _ = load_video_frames(str(tmp_path), {"nframes": 4})
        assert frames.shape == (4, 32, 32, 3)

    def test_npy_file(self, tmp_path):
        vid = (np.random.RandomState(0).rand(10, 32, 32, 3) * 255).astype(np.uint8)
        np.save(tmp_path / "v.npy", vid)
        frames, _ = load_video_frames(str(tmp_path / "v.npy"), {"nframes": 2})
        assert frames.shape[0] == 2


class TestVideoEval:
    def test_videomme_style_pipeline(self, tmp_path):
        """End-to-end: frames-dir video task through run_eval at 10% retention."""
        from PIL import Image

        vid_dir = tmp_path / "vid0"
        os.makedirs(vid_dir)
        for i in range(8):
            Image.fromarray(
                (np.random.RandomState(i).rand(56, 56, 3) * 255).astype(np.uint8)
            ).save(vid_dir / f"f{i:02d}.png")
        with open(tmp_path / "videomme.jsonl", "w") as f:
            f.write(json.dumps({
                "question": "What happens? A. x B. y",
                "answers": ["A"],
                "video": "vid0",
            }) + "\n")

        from visionselector_tpu.api.run_eval import main

        out = str(tmp_path / "res")
        rc = main([
            "--data-dir", str(tmp_path), "--tasks", "videomme",
            "--method", "selector", "--budgets", "0.1", "--limit", "1",
            "--output-dir", out,
        ])
        assert rc == 0
        with open(os.path.join(out, "selector_0.1_rank0.json")) as f:
            res = json.load(f)
        assert "videomme/multiple_choice" in res["results"]


class TestVideoTaskRegistry:
    @pytest.mark.parametrize("task", [
        "mlvu", "longvideobench", "mvbench",
        # secondary video MC suites (r5 breadth pass)
        "egoschema", "nextqa_mc_test", "perceptiontest_val_mc",
        "tempcompass_mc",
    ])
    def test_new_video_tasks_run(self, tmp_path, task):
        """Video suite breadth (paper's 13-benchmark claim, README.md:47)."""
        from PIL import Image

        vid_dir = tmp_path / "vid0"
        os.makedirs(vid_dir)
        for i in range(4):
            Image.fromarray(
                (np.random.RandomState(i).rand(56, 56, 3) * 255).astype(np.uint8)
            ).save(vid_dir / f"f{i:02d}.png")
        with open(tmp_path / f"{task}.jsonl", "w") as f:
            f.write(json.dumps({
                "question": "What happens? A. x B. y",
                "answers": ["B"],
                "video": "vid0",
            }) + "\n")

        from visionselector_tpu.api.run_eval import main

        out = str(tmp_path / "res")
        rc = main([
            "--data-dir", str(tmp_path), "--tasks", task,
            "--method", "selector", "--budgets", "0.2", "--limit", "1",
            "--output-dir", out,
        ])
        assert rc == 0
        with open(os.path.join(out, "selector_0.2_rank0.json")) as f:
            res = json.load(f)
        assert f"{task}/multiple_choice" in res["results"]
