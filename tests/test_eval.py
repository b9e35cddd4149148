"""Evaluation harness tests: metrics goldens, sharding, end-to-end run."""

import json
import os

import numpy as np
import pytest

from visionselector_tpu.eval import metrics as M
from visionselector_tpu.eval.extract_time import extract
from visionselector_tpu.eval.tasks import (
    TASKS,
    load_task_docs,
    shard_requests,
)


class TestMetrics:
    def test_relaxed_accuracy_numeric_tolerance(self):
        assert M.relaxed_match("104", "100") is True  # 4% off
        assert M.relaxed_match("106", "100") is False  # 6% off
        assert M.relaxed_match("25%", "0.25") is True
        assert M.relaxed_match("cat", "Cat") is True
        assert M.relaxed_match("cat", "dog") is False

    def test_anls(self):
        assert M.anls("hello", ["hello"]) == 1.0
        assert M.anls("helo", ["hello"]) == pytest.approx(0.8)
        assert M.anls("xyz", ["hello"]) == 0.0  # below 0.5 threshold

    def test_vqa_accuracy_consensus(self):
        answers = ["cat"] * 3 + ["dog"] * 7
        assert M.vqa_accuracy("the cat", answers) == 1.0  # article stripped
        assert M.vqa_accuracy("bird", answers) == 0.0
        answers = ["cat"] * 2 + ["dog"] * 8
        assert M.vqa_accuracy("cat", answers) == pytest.approx(2 / 3)

    def test_contains(self):
        assert M.contains_accuracy("The text says HELLO world", ["hello"]) == 1.0
        assert M.contains_accuracy("nothing", ["hello"]) == 0.0

    def test_multiple_choice(self):
        assert M.multiple_choice_match("The answer is B.", "B") == 1.0
        assert M.multiple_choice_match("b", "B") == 1.0
        assert M.multiple_choice_match("A", "B") == 0.0

    def test_yes_no_and_pope(self):
        assert M.yes_no_match("Yes, it is", "yes") == 1.0
        agg = M.pope_aggregate(["yes", "yes", "no", "no"],
                               ["yes", "no", "no", "yes"])
        assert agg["accuracy"] == 0.5
        assert agg["precision"] == 0.5
        assert agg["recall"] == 0.5

    def test_squad_f1(self):
        assert M.squad_f1("12 dollars", ["12 dollars"]) == 1.0
        assert M.squad_f1("the price is 12 dollars", ["12 dollars"]) == \
            pytest.approx(2 * (2 / 4) * 1.0 / (2 / 4 + 1.0))
        assert M.squad_f1("unknown", ["12 dollars"]) == 0.0
        # articles/punctuation stripped, max over refs
        assert M.squad_f1("The cat!", ["cat", "dog"]) == 1.0

    def test_cider_d_properties(self):
        refs = [
            ["a man rides a brown horse on the beach"],
            ["two dogs play with a red ball in the park"],
            ["a plate of pasta sits on the wooden table"],
        ]
        # identity: every prediction == its reference -> 10.0 per image
        mean_score, per_img = M.cider_d([r[0] for r in refs], refs)
        assert mean_score == pytest.approx(10.0, abs=1e-6)
        assert all(s == pytest.approx(10.0, abs=1e-6) for s in per_img)
        # disjoint vocab -> 0
        zero, _ = M.cider_d(["xyzzy plugh"] * 3, refs)
        assert zero == pytest.approx(0.0, abs=1e-9)
        # closer caption scores higher than an unrelated one
        _, (close, far, _) = M.cider_d(
            ["a man rides a horse on the beach",
             "a man rides a horse on the beach",
             "a plate of pasta sits on the wooden table"], refs)
        assert close > far
        # gaussian length penalty: padding with off-corpus tokens lowers it
        _, (short, padded, _) = M.cider_d(
            ["a man rides a brown horse on the beach",
             "a man rides a brown horse on the beach aa bb cc dd ee ff gg "
             "hh ii jj kk ll mm nn oo pp qq rr ss tt uu vv",
             "a plate of pasta sits on the wooden table"], refs)
        assert short > padded

    def test_cider_idf_discounts_corpus_common_ngrams(self):
        # 'a man walks' appears in every reference -> zero IDF; matching
        # only that phrase scores ~0 while a distinctive match scores high
        refs = [["a man walks past a green fence"],
                ["a man walks under a yellow umbrella"],
                ["a man walks beside a blue car"]]
        _, (common_only, distinctive, _) = M.cider_d(
            ["a man walks", "a man walks under a yellow umbrella",
             "a man walks beside a blue car"], refs)
        assert distinctive > common_only + 1.0

    def test_bootstrap_stderr(self):
        vals = [0.0, 1.0] * 50
        se = M.bootstrap_stderr(vals)
        assert 0.01 < se < 0.1  # ~0.05 for n=100 bernoulli


class TestTasks:
    def make_data(self, tmp_path, n=10):
        path = tmp_path / "chartqa.jsonl"
        from PIL import Image

        img_path = tmp_path / "img.png"
        Image.fromarray(
            (np.random.RandomState(0).rand(56, 56, 3) * 255).astype(np.uint8)
        ).save(img_path)
        with open(path, "w") as f:
            for i in range(n):
                f.write(json.dumps({
                    "question": f"What is {i}?",
                    "answers": [str(i)],
                    "image": "img.png",
                }) + "\n")
        return str(tmp_path)

    def test_load_docs_and_limit(self, tmp_path):
        data_dir = self.make_data(tmp_path)
        reqs = load_task_docs(TASKS["chartqa"], data_dir, limit=4)
        assert len(reqs) == 4
        assert reqs[0].question.endswith("single word or phrase.")
        assert os.path.exists(reqs[0].image_path)

    def test_shard_even_padding(self, tmp_path):
        data_dir = self.make_data(tmp_path, n=10)
        reqs = load_task_docs(TASKS["chartqa"], data_dir)
        shards = [shard_requests(reqs, r, 4) for r in range(4)]
        # all ranks get equal counts (padded), covering all docs
        assert len({len(s) for s in shards}) == 1
        covered = {r.doc_id for s in shards for r in s}
        assert covered == set(range(10))


class TestEndToEnd:
    def test_run_eval_smoke(self, tmp_path, capsys):
        """Full harness over a tiny synthetic task with the tiny model."""
        data_dir = TestTasks().make_data(tmp_path, n=3)
        out_dir = str(tmp_path / "results")
        from visionselector_tpu.api.run_eval import main

        rc = main([
            "--data-dir", data_dir, "--tasks", "chartqa",
            "--method", "selector", "--budgets", "0.5", "--limit", "2",
            "--output-dir", out_dir,
        ])
        assert rc == 0
        res_file = os.path.join(out_dir, "selector_0.5_rank0.json")
        with open(res_file) as f:
            res = json.load(f)
        assert "chartqa/relaxed_accuracy" in res["results"]
        assert res["results"]["chartqa/n"] == 2.0
        samples = os.path.join(out_dir, "samples_selector_0.5_rank0.jsonl")
        assert sum(1 for _ in open(samples)) == 2


class TestTaskBreadth:
    """Secondary-suite registry breadth (VERDICT r4 item 7; mirrors
    lmms-eval/lmms_eval/tasks/<name>/ task yamls)."""

    def test_builtin_count(self):
        assert len(TASKS) >= 45

    @pytest.mark.parametrize("task,metric,question,answer", [
        ("stvqa", "anls", "What does the sign say?", "stop"),
        ("ok_vqa_val2014", "vqa_accuracy", "What fruit is this?",
         "banana"),
        ("hallusion_bench_image", "yes_no", "Is there a cat?", "yes"),
        ("seedbench_2", "multiple_choice", "Pick one. A. x B. y", "B"),
        ("mme_realworld", "multiple_choice", "Pick one. A. x B. y", "A"),
        ("qbench_dev", "multiple_choice", "Quality? A. good B. bad", "A"),
        ("ai2d", "multiple_choice", "Which part? A. x B. y", "B"),
        ("websrc", "squad_f1", "What is the price?", "12 dollars"),
        ("vmcbench", "multiple_choice", "Pick. A. x B. y", "A"),
        ("muirbench", "multiple_choice", "Compare. A. x B. y", "B"),
        ("coco2017_cap_val", "cider",
         "Provide a one-sentence caption for the provided image.",
         "a colorful square of random noise"),
    ])
    def test_new_image_tasks_run(self, tmp_path, task, metric, question,
                                 answer):
        from PIL import Image

        img_path = tmp_path / "img.png"
        Image.fromarray(
            (np.random.RandomState(0).rand(56, 56, 3) * 255).astype(np.uint8)
        ).save(img_path)
        with open(tmp_path / f"{task}.jsonl", "w") as f:
            f.write(json.dumps({
                "question": question, "answers": [answer],
                "image": "img.png",
            }) + "\n")
        from visionselector_tpu.api.run_eval import main

        out = str(tmp_path / "res")
        rc = main([
            "--data-dir", str(tmp_path), "--tasks", task,
            "--method", "selector", "--budgets", "0.5", "--limit", "1",
            "--output-dir", out,
        ])
        assert rc == 0
        with open(os.path.join(out, "selector_0.5_rank0.json")) as f:
            res = json.load(f)
        assert f"{task}/{metric}" in res["results"]


class TestExtractTime:
    def test_scrape(self):
        log = (
            "Input visual token number is: 100\n"
            "Generation prefill time is: 12.5\n"
            "Generation total time is: 50.0\n"
            "Input visual token number is: 200\n"
            "Generation prefill time is: 37.5\n"
            "Generation total time is: 150.0\n"
        )
        stats = extract(log)
        assert stats["avg_visual_tokens"] == 150.0
        assert stats["avg_prefill_ms"] == 25.0
        assert stats["avg_latency_ms"] == 100.0
        assert stats["n_visual_tokens"] == 2.0


class TestResponseCache:
    def test_roundtrip_and_env(self, tmp_path, monkeypatch):
        from visionselector_tpu.eval.caching import ResponseCache

        monkeypatch.setenv("LM_HARNESS_CACHE_PATH", str(tmp_path))
        c = ResponseCache()
        assert c.enabled()
        k = c.key("chartqa", 3, "q?", "selector", 0.2)
        assert c.get(k) is None
        c.put(k, "42")
        # fresh instance reads from disk
        c2 = ResponseCache()
        assert c2.get(k) == "42"
        # different budget -> different key
        assert c.key("chartqa", 3, "q?", "selector", 0.3) != k


class TestCheckData:
    def test_detects_problems(self, tmp_path):
        import numpy as np
        from PIL import Image

        from visionselector_tpu.train.check_data import check

        Image.fromarray(
            (np.random.RandomState(0).rand(8, 8, 3) * 255).astype(np.uint8)
        ).save(tmp_path / "ok.png")
        ann = tmp_path / "a.jsonl"
        with open(ann, "w") as f:
            f.write(json.dumps({"image": "ok.png", "conversations": [
                {"from": "human", "value": "<image>hi"},
                {"from": "gpt", "value": "yo"}]}) + "\n")
            f.write(json.dumps({"image": "missing.png", "conversations": [
                {"from": "human", "value": "<image>hi"}]}) + "\n")
            f.write(json.dumps({"conversations": []}) + "\n")
        n, problems = check(str(ann), str(tmp_path))
        assert n == 3
        msgs = [m for _, m in problems]
        assert any("missing image" in m for m in msgs)
        assert any("empty conversations" in m for m in msgs)
        assert len(problems) == 2


class TestOVEvalFamily:
    def test_run_eval_ov_family(self, tmp_path):
        """BASELINE config 3 surface: OV selector through the eval harness."""
        data_dir = TestTasks().make_data(tmp_path, n=2)
        out_dir = str(tmp_path / "ov_results")
        from visionselector_tpu.api.run_eval import main

        rc = main([
            "--data-dir", data_dir, "--tasks", "chartqa",
            "--method", "selector", "--budgets", "0.5", "--limit", "1",
            "--output-dir", out_dir, "--family", "llava_ov15",
        ])
        assert rc == 0
        with open(os.path.join(out_dir, "selector_0.5_rank0.json")) as f:
            res = json.load(f)
        assert "chartqa/relaxed_accuracy" in res["results"]


class TestShardedAggregation:
    """Padded duplicates are never scored; merged rank results == single-run
    (lmms-eval semantics, ``evaluator.py:442-476``)."""

    @staticmethod
    def _predict(r):
        return r.answers[0] if r.doc_id % 2 == 0 else "wrong"

    def test_padding_excluded_and_merge_matches_single_process(self, tmp_path):
        from visionselector_tpu.eval.evaluator import merge_results
        from visionselector_tpu.eval.tasks import aggregate_scores

        data_dir = TestTasks().make_data(tmp_path, n=10)
        task = TASKS["chartqa"]
        reqs = load_task_docs(task, data_dir)
        ref = aggregate_scores(task, [self._predict(r) for r in reqs], reqs)

        logs = []
        n_padded = 0
        for rank in range(4):
            shard = shard_requests(reqs, rank, 4)
            n_padded += sum(r.is_padding for r in shard)
            agg = aggregate_scores(
                task, [self._predict(r) for r in shard], shard
            )
            # rank-local count excludes padding
            assert agg["chartqa/n"] == float(
                sum(not r.is_padding for r in shard)
            )
            path = tmp_path / f"samples_rank{rank}.jsonl"
            with open(path, "w") as f:
                for r in shard:
                    f.write(json.dumps({
                        "task": "chartqa", "doc_id": r.doc_id,
                        "question": r.question, "answers": r.answers,
                        "prediction": self._predict(r),
                        "is_padding": r.is_padding,
                    }) + "\n")
            logs.append(str(path))
        assert n_padded == 2  # 10 docs over 4 ranks -> 2 pad rows

        merged = merge_results(logs)
        assert merged["chartqa/n"] == 10.0
        assert merged["chartqa/relaxed_accuracy"] == \
            ref["chartqa/relaxed_accuracy"]


class TestMixedRequests:
    def make_mixed_data(self, tmp_path):
        from PIL import Image

        rng = np.random.RandomState(3)
        for name in ("a.png", "b.png"):
            Image.fromarray(
                (rng.rand(56, 56, 3) * 255).astype(np.uint8)
            ).save(tmp_path / name)
        with open(tmp_path / "mme.jsonl", "w") as f:
            f.write(json.dumps({  # multi-image doc (MMMU-style)
                "question": "Compare the two images.",
                "answers": ["yes"], "images": ["a.png", "b.png"],
            }) + "\n")
            f.write(json.dumps({  # text-only doc
                "question": "Is 2 + 2 = 4?", "answers": ["yes"],
            }) + "\n")
        return str(tmp_path)

    def test_multi_image_and_text_only_through_harness(self, tmp_path):
        data_dir = self.make_mixed_data(tmp_path)
        reqs = load_task_docs(TASKS["mme"], data_dir)
        assert len(reqs[0].image_paths) == 2
        assert reqs[1].image_paths == []

        out_dir = str(tmp_path / "results")
        from visionselector_tpu.api.run_eval import main

        rc = main([
            "--data-dir", data_dir, "--tasks", "mme",
            "--method", "selector", "--budgets", "0.5",
            "--output-dir", out_dir,
        ])
        assert rc == 0
        with open(os.path.join(out_dir, "selector_0.5_rank0.json")) as f:
            res = json.load(f)
        assert res["results"]["mme/n"] == 2.0


class TestOVBaselineEval:
    def test_run_eval_ov_fastv(self, tmp_path):
        """VERDICT r1 item 4: OV training-free baselines through the harness."""
        data_dir = TestTasks().make_data(tmp_path, n=2)
        out_dir = str(tmp_path / "ov_fastv")
        from visionselector_tpu.api.run_eval import main

        rc = main([
            "--data-dir", data_dir, "--tasks", "chartqa",
            "--method", "fastv", "--budgets", "0.5", "--limit", "1",
            "--output-dir", out_dir, "--family", "llava_ov15",
        ])
        assert rc == 0
        with open(os.path.join(out_dir, "fastv_0.5_rank0.json")) as f:
            res = json.load(f)
        assert "chartqa/relaxed_accuracy" in res["results"]


class TestTracker:
    def test_save_aggregated_and_samples(self, tmp_path):
        from visionselector_tpu.eval.tracker import EvaluationTracker

        t = EvaluationTracker(output_dir=str(tmp_path), model_name="qwen25vl",
                              model_args="method=selector")
        p = t.save_results_aggregated({"chartqa/relaxed_accuracy": 0.5},
                                      config={"tasks": ["chartqa"]})
        s = t.save_results_samples("chartqa", [{"doc_id": 0, "prediction": "x"}])
        with open(p) as f:
            rec = json.load(f)
        assert rec["results"]["chartqa/relaxed_accuracy"] == 0.5
        assert rec["model_name"] == "qwen25vl"
        assert "date" in rec and "total_evaluation_time_seconds" in rec
        assert sum(1 for _ in open(s)) == 1

    def test_run_eval_writes_tracker_files(self, tmp_path):
        data_dir = TestTasks().make_data(tmp_path, n=2)
        out_dir = str(tmp_path / "r")
        from visionselector_tpu.api.run_eval import main

        rc = main([
            "--data-dir", data_dir, "--tasks", "chartqa",
            "--method", "selector", "--budgets", "0.5", "--limit", "1",
            "--output-dir", out_dir,
        ])
        assert rc == 0
        tdir = os.path.join(out_dir, "tracker")
        assert any(n.startswith("results_") for n in os.listdir(tdir))


class TestPrepData:
    def test_filter_and_sample_merge(self, tmp_path):
        from visionselector_tpu.train.prep_data import main

        src = tmp_path / "cambrian.jsonl"
        with open(src, "w") as f:
            for i in range(10):
                name = "ocr_vqa" if i % 2 == 0 else "chartqa"
                f.write(json.dumps({
                    "image": f"{name}/img_{i}.png", "conversations": []
                }) + "\n")
            f.write(json.dumps({"image": "other/x.png"}) + "\n")
        out = tmp_path / "split"
        rc = main(["filter", "--input", str(src), "--output-dir", str(out),
                   "--datasets", "ocr_vqa,chartqa"])
        assert rc == 0
        assert sum(1 for _ in open(out / "ocr_vqa_cambrian.jsonl")) == 5
        assert sum(1 for _ in open(out / "chartqa_cambrian.jsonl")) == 5

        merged = tmp_path / "merged.jsonl"
        rc = main(["sample-merge", "--inputs",
                   f"{out}/ocr_vqa_cambrian.jsonl:1.0,"
                   f"{out}/chartqa_cambrian.jsonl:0.4",
                   "--output", str(merged)])
        assert rc == 0
        assert sum(1 for _ in open(merged)) == 5 + 2


class TestTaskConfigDir:
    def test_yaml_task_registration_and_run(self, tmp_path):
        """lmms-eval YAML-task extensibility: a user-supplied task config
        registers and runs through the harness."""
        cfg_dir = tmp_path / "task_cfgs"
        cfg_dir.mkdir()
        with open(cfg_dir / "mytask.yaml", "w") as f:
            f.write(
                "name: mytask\n"
                "metric: multiple_choice\n"
                "prompt_suffix: \"\\nAnswer with the letter.\"\n"
                "max_new_tokens: 4\n"
                "filter: mc_letter\n"
            )
        from PIL import Image

        Image.fromarray(
            (np.random.RandomState(0).rand(56, 56, 3) * 255).astype(np.uint8)
        ).save(tmp_path / "i.png")
        with open(tmp_path / "mytask.jsonl", "w") as f:
            f.write(json.dumps({"question": "A or B?", "answers": ["A"],
                                "image": "i.png"}) + "\n")
        from visionselector_tpu.api.run_eval import main

        out = str(tmp_path / "res")
        rc = main([
            "--data-dir", str(tmp_path), "--tasks", "mytask",
            "--method", "selector", "--budgets", "0.5",
            "--output-dir", out, "--task-config-dir", str(cfg_dir),
        ])
        assert rc == 0
        with open(os.path.join(out, "selector_0.5_rank0.json")) as f:
            res = json.load(f)
        assert "mytask/multiple_choice" in res["results"]

    def test_unknown_field_raises(self, tmp_path):
        from visionselector_tpu.eval.tasks import load_task_configs

        with open(tmp_path / "bad.yaml", "w") as f:
            f.write("name: x\nmetric: anls\nnot_a_field: 1\n")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="not_a_field"):
            load_task_configs(str(tmp_path))


class TestLmmsEvalCLI:
    def test_reference_invocation_shape(self, tmp_path):
        """run_selector.sh-style invocation through the lmms-eval front end."""
        data_dir = TestTasks().make_data(tmp_path, n=2)
        out = str(tmp_path / "lmms_out")
        from visionselector_tpu.api.lmms_eval_cli import main

        rc = main([
            "--model", "qwen2_5_vl_with_token_compression",
            "--model_args", "method=selector,budgets=0.5",
            "--tasks", "chartqa", "--batch_size", "1",
            "--limit", "1", "--output_path", out, "--log_samples",
            "--data_dir", data_dir,
        ])
        assert rc == 0
        with open(os.path.join(out, "selector_0.5_rank0.json")) as f:
            res = json.load(f)
        assert "chartqa/relaxed_accuracy" in res["results"]

    def test_unknown_model_rejected(self):
        from visionselector_tpu.api.lmms_eval_cli import main

        import pytest as _pytest

        with _pytest.raises(SystemExit):
            main(["--model", "nope", "--tasks", "chartqa",
                  "--data_dir", "/tmp"])


class TestCacheIntegration:
    def test_second_run_served_from_cache(self, tmp_path, monkeypatch):
        """LM_HARNESS_CACHE_PATH: re-runs skip generation for cached docs."""
        monkeypatch.setenv("LM_HARNESS_CACHE_PATH", str(tmp_path / "cache"))
        data_dir = TestTasks().make_data(tmp_path, n=2)
        out = str(tmp_path / "res")
        from visionselector_tpu.api.run_eval import main

        args = ["--data-dir", data_dir, "--tasks", "chartqa",
                "--method", "selector", "--budgets", "0.5",
                "--output-dir", out]
        assert main(args) == 0
        cache_files = os.listdir(str(tmp_path / "cache"))
        assert len(cache_files) == 2

        # second run: engine never called (poison generate_until)
        import visionselector_tpu.eval.evaluator as ev

        called = []
        orig = ev.EngineAdapter.generate_until

        def spy(self, requests, until=("<|im_end|>",)):
            called.append(len(requests))
            return orig(self, requests, until)

        monkeypatch.setattr(ev.EngineAdapter, "generate_until", spy)
        assert main(args) == 0
        assert called == []  # all served from cache


class TestMultiRound:
    def test_two_round_generation(self, tmp_path):
        """generate_until_multi_round: rounds chained through the prompt."""
        import jax

        from visionselector_tpu.core.config import qwen25vl_tiny
        from visionselector_tpu.eval.evaluator import EngineAdapter
        from visionselector_tpu.eval.tasks import TASKS, Request
        from visionselector_tpu.models.qwen25vl.model import (
            QwenVLEngine,
            init_params,
        )

        data_dir = TestTasks().make_data(tmp_path, n=1)
        cfg = qwen25vl_tiny()
        eng = QwenVLEngine(cfg, init_params(jax.random.PRNGKey(0), cfg),
                           budget=0.5)

        class Tok:
            def encode(self, s):
                return [abs(hash(w)) % 1000 + 600 for w in s.split()][:8]

            def decode(self, ids, skip_special_tokens=True):
                return " ".join(str(i) for i in ids)

        adapter = EngineAdapter(eng, Tok())
        req = Request(doc_id=0, question=["Round one?", "Round two?"],
                      answers=["x"],
                      image_path=os.path.join(data_dir, "img.png"),
                      task=TASKS["chartqa"])
        out = adapter.generate_until_multi_round([req])
        assert len(out) == 1 and isinstance(out[0], str) and out[0]

        # max_pixels caps the per-image token count (reference model_args):
        # a tight budget shrinks the prepared grid vs the default
        small = EngineAdapter(eng, Tok(), max_pixels=28 * 28)
        r1 = Request(doc_id=0, question="q?", answers=["x"],
                     image_path=os.path.join(data_dir, "img.png"),
                     task=TASKS["chartqa"])
        kw_default, grid_default = adapter._prepare_request(r1)
        kw_small, grid_small = small._prepare_request(r1)
        assert int(grid_small.prod()) < int(grid_default.prod())
        assert kw_small["pixel_values"].shape[0] < \
            kw_default["pixel_values"].shape[0]


class TestLoglikelihood:
    """lmms model-ABC ``loglikelihood`` contract
    (``lmms-eval/lmms_eval/api/model.py:30-57``): (ll, is_greedy) per
    (context, continuation), and MC tasks scored by per-choice argmax."""

    class Tok:
        def encode(self, s):
            return [abs(hash(w)) % 1000 + 600 for w in s.split()][:8]

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(i) for i in ids)

    def _engine(self, use_selector=True):
        import jax

        from visionselector_tpu.core.config import qwen25vl_tiny
        from visionselector_tpu.models.qwen25vl.model import (
            QwenVLEngine,
            init_params,
        )

        cfg = qwen25vl_tiny()
        return QwenVLEngine(
            cfg, init_params(jax.random.PRNGKey(0), cfg),
            use_selector=use_selector, budget=0.5,
        )

    def test_text_ll_matches_manual_teacher_forcing(self):
        import jax
        import jax.numpy as jnp

        from visionselector_tpu.models.qwen25vl import lm as lm_mod

        eng = self._engine()
        ctx = np.array([5, 6, 7, 8, 9])
        cont = np.array([11, 12, 13])
        ll, greedy = eng.loglikelihood(ctx, cont)
        assert isinstance(ll, float) and isinstance(greedy, bool)

        full = np.concatenate([ctx, cont])
        emb = lm_mod.embed_tokens(eng.params["lm"], jnp.asarray(full))
        pos = jnp.tile(jnp.arange(len(full)), (3, 1, 1))
        seg = jnp.ones((1, len(full)), jnp.int32)
        hidden, _ = lm_mod.lm_prefill(
            eng.params["lm"], emb[None], pos, seg, eng.cfg.text)
        logits = lm_mod.lm_head(eng.params["lm"], hidden[0], eng.cfg.text)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        manual = sum(
            float(logp[len(ctx) - 1 + i, int(cont[i])])
            for i in range(len(cont))
        )
        assert abs(manual - ll) < 1e-3
        manual_greedy = all(
            int(jnp.argmax(logits[len(ctx) - 1 + i])) == int(cont[i])
            for i in range(len(cont))
        )
        assert greedy == manual_greedy

    def test_vision_ll_runs_and_prefers_greedy_continuation(self):
        from PIL import Image

        from visionselector_tpu.preprocess.image import preprocess_image
        from visionselector_tpu.preprocess.rope import expand_vision_tokens

        eng = self._engine()
        cfg = eng.cfg
        img = (np.random.RandomState(0).rand(56, 84, 3) * 255).astype(
            np.uint8)
        pixels, grid = preprocess_image(Image.fromarray(img))
        ids = expand_vision_tokens(
            [5, 6, 7], [8, 9], grid,
            image_token_id=cfg.image_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
            vision_end_token_id=cfg.vision_end_token_id,
        )
        # The greedy continuation must be flagged greedy and must have a
        # higher ll than a perturbed continuation.
        res = eng.generate(ids, pixels, grid, max_new_tokens=2)
        greedy_cont = np.asarray(res.tokens[:2])
        ll_g, is_g = eng.loglikelihood(
            ids, greedy_cont, pixel_values=pixels, grid_thw=grid)
        assert is_g
        other = greedy_cont.copy()
        other[-1] = (other[-1] + 1) % cfg.text.vocab_size
        ll_o, is_o = eng.loglikelihood(
            ids, other, pixel_values=pixels, grid_thw=grid)
        assert not is_o
        assert ll_g > ll_o

    def test_adapter_mc_task_via_loglikelihood(self, tmp_path):
        """scienceqa_img_ll end-to-end: choices scored by ll, argmax letter
        becomes the prediction, multiple_choice metric applies."""
        from PIL import Image

        from visionselector_tpu.eval.evaluator import EngineAdapter, evaluate
        from visionselector_tpu.eval.tasks import TASKS

        img_path = tmp_path / "img.png"
        Image.fromarray(
            (np.random.RandomState(0).rand(56, 56, 3) * 255).astype(np.uint8)
        ).save(img_path)
        # dataset_file: the ll variant reads scienceqa_img.jsonl
        with open(tmp_path / "scienceqa_img.jsonl", "w") as f:
            for i in range(2):
                f.write(json.dumps({
                    "question": f"Which option is right {i}?\nA. x\nB. y",
                    "answers": ["A"],
                    "image": "img.png",
                    "choices": ["A", "B"],
                }) + "\n")
        adapter = EngineAdapter(self._engine(), self.Tok())
        res = evaluate(adapter, ["scienceqa_img_ll"], str(tmp_path))
        assert "scienceqa_img_ll/multiple_choice" in res
        assert res["scienceqa_img_ll/n"] == 2.0

    def test_full_text_choices_predict_letters(self, tmp_path):
        """Docs whose choices are full texts (not letters) must still yield
        a LETTER prediction (the metric extracts a standalone letter; the
        choice text would decouple the score from the ll argmax)."""
        from PIL import Image

        from visionselector_tpu.eval.evaluator import EngineAdapter

        img_path = tmp_path / "img.png"
        Image.fromarray(
            (np.random.RandomState(0).rand(56, 56, 3) * 255).astype(np.uint8)
        ).save(img_path)
        from visionselector_tpu.eval.tasks import TASKS, Request

        req = Request(
            doc_id=0, question="Which?", answers=["A"],
            image_path=str(img_path), task=TASKS["scienceqa_img_ll"],
            choices=["a magnet", "a rock"],
        )
        adapter = EngineAdapter(self._engine(), self.Tok())
        preds = adapter.predict_multiple_choice([req])
        assert preds[0] in ("A", "B")

    def test_choices_shared_prefill_matches_per_pair(self):
        """run_loglikelihood_choices (one prefill + chunk per choice) must
        equal per-pair engine.loglikelihood exactly on the uncompressed
        path (same positions; CPU fp32)."""
        from PIL import Image

        from visionselector_tpu.models.qwen25vl.model import (
            run_loglikelihood_choices,
        )
        from visionselector_tpu.preprocess.image import preprocess_image
        from visionselector_tpu.preprocess.rope import expand_vision_tokens

        eng = self._engine(use_selector=False)
        cfg = eng.cfg
        img = (np.random.RandomState(3).rand(56, 84, 3) * 255).astype(
            np.uint8)
        pixels, grid = preprocess_image(Image.fromarray(img))
        ids = expand_vision_tokens(
            [5, 6, 7], [8, 9], grid,
            image_token_id=cfg.image_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
            vision_end_token_id=cfg.vision_end_token_id,
        )
        choices = [np.array([11, 12]), np.array([13]), np.array([14, 15, 16])]
        shared = run_loglikelihood_choices(
            eng, ids, choices, pixel_values=pixels, grid_thw=grid)
        for cont, (ll_s, gr_s) in zip(choices, shared):
            ll_p, gr_p = eng.loglikelihood(
                ids, cont, pixel_values=pixels, grid_thw=grid)
            assert abs(ll_s - ll_p) < 2e-3, (ll_s, ll_p)
            assert gr_s == gr_p

    def test_choices_selector_path_runs(self):
        from visionselector_tpu.models.qwen25vl.model import (
            run_loglikelihood_choices,
        )

        eng = self._engine(use_selector=True)
        shared = run_loglikelihood_choices(
            eng, np.array([5, 6, 7, 8]), [np.array([11]), np.array([12])])
        assert all(np.isfinite(ll) for ll, _ in shared)

    def test_ov_engine_text_ll(self):
        import jax

        from visionselector_tpu.core.config import llava_ov_tiny
        from visionselector_tpu.models.llava_ov15.model import (
            OVEngine,
            init_ov_params,
        )

        cfg = llava_ov_tiny()
        eng = OVEngine(cfg, init_ov_params(jax.random.PRNGKey(0), cfg),
                       budget=0.5)
        ll, greedy = eng.loglikelihood(
            np.array([5, 6, 7]), np.array([11, 12]))
        assert np.isfinite(ll) and isinstance(greedy, bool)


class TestFractionalLimit:
    def test_fraction_and_count_semantics(self, tmp_path):
        data_dir = TestTasks().make_data(tmp_path, n=10)
        task = TASKS["chartqa"]
        assert len(load_task_docs(task, data_dir, limit=4)) == 4
        assert len(load_task_docs(task, data_dir, limit=0.5)) == 5
        assert len(load_task_docs(task, data_dir, limit=0.01)) == 1  # min 1
        assert len(load_task_docs(task, data_dir)) == 10


class TestLiteShrinker:
    def test_k_center_subset_is_diverse_and_runnable(self, tmp_path):
        """tools/lite parity: k-center shrink keeps a diverse subset that
        still runs through the harness."""
        from PIL import Image

        img = tmp_path / "img.png"
        Image.fromarray(
            (np.random.RandomState(0).rand(56, 56, 3) * 255).astype(np.uint8)
        ).save(img)
        topics = ["cats and dogs", "stock market charts", "cooking recipes",
                  "football scores"]
        with open(tmp_path / "chartqa.jsonl", "w") as f:
            for i in range(40):
                t = topics[i % 2]  # only two topics in the pool
                f.write(json.dumps({
                    "question": f"{t} question number {i}?",
                    "answers": [str(i)], "image": "img.png",
                }) + "\n")

        from visionselector_tpu.eval.lite import main as lite_main

        out_dir = str(tmp_path / "lite")
        rc = lite_main(["--data-dir", str(tmp_path), "--task", "chartqa",
                        "--k", "6", "--output-dir", out_dir])
        assert rc == 0
        with open(os.path.join(out_dir, "chartqa.jsonl")) as f:
            docs = [json.loads(l) for l in f]
        assert len(docs) == 6
        # both topics represented (diversity, not a prefix slice)
        qs = " ".join(d["question"] for d in docs)
        assert "cats" in qs and "stock" in qs

        # deterministic: same inputs -> same subset
        rc = lite_main(["--data-dir", str(tmp_path), "--task", "chartqa",
                        "--k", "6", "--output-dir", str(tmp_path / "lite2")])
        with open(os.path.join(str(tmp_path / "lite2"), "chartqa.jsonl")) as f:
            docs2 = [json.loads(l) for l in f]
        assert docs == docs2


class TestFromLogReplay:
    """ReplayAdapter re-scores from sample logs without a model
    (lmms-eval from_log parity, ``models/from_log.py:16-112``)."""

    def _write_log(self, path, recs):
        with open(path, "w") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")

    def test_rescore_matches_original_run(self, tmp_path, capsys):
        from visionselector_tpu.api.run_eval import main

        data_dir = TestTasks().make_data(tmp_path, n=3)
        out_dir = str(tmp_path / "results")
        assert main([
            "--data-dir", data_dir, "--tasks", "chartqa",
            "--method", "selector", "--budgets", "0.5",
            "--output-dir", out_dir,
        ]) == 0
        with open(os.path.join(out_dir, "selector_0.5_rank0.json")) as f:
            original = json.load(f)["results"]
        capsys.readouterr()

        replay_dir = str(tmp_path / "replayed")
        assert main([
            "--from-log", out_dir, "--data-dir", data_dir,
            "--tasks", "chartqa", "--output-dir", replay_dir,
        ]) == 0
        with open(os.path.join(replay_dir, "from_log.json")) as f:
            replayed = json.load(f)["results"]
        assert (replayed["chartqa/relaxed_accuracy"]
                == original["chartqa/relaxed_accuracy"])
        assert replayed["chartqa/n"] == original["chartqa/n"]

    def test_newest_log_wins_and_padding_skipped(self, tmp_path):
        import time as _time

        from visionselector_tpu.eval.replay import ReplayAdapter
        from visionselector_tpu.eval.tasks import TASKS, Request

        old = tmp_path / "old.jsonl"
        new = tmp_path / "new.jsonl"
        self._write_log(old, [
            {"task": "chartqa", "doc_id": 0, "question": "q", "answers": ["1"],
             "prediction": "old", "is_padding": False},
            {"task": "chartqa", "doc_id": 1, "question": "q", "answers": ["2"],
             "prediction": "pad", "is_padding": True},
        ])
        _time.sleep(0.02)
        self._write_log(new, [
            {"task": "chartqa", "doc_id": 0, "question": "q", "answers": ["1"],
             "prediction": "new", "is_padding": False},
        ])
        os.utime(old, (os.path.getmtime(new) - 10,) * 2)
        ad = ReplayAdapter(f"{old},{new}")
        task = TASKS["chartqa"]
        req = Request(doc_id=0, question="q", answers=["1"],
                      image_path=None, task=task)
        assert ad.generate_until([req]) == ["new"]
        # padding rows never load; a missing doc raises under strict
        missing = Request(doc_id=1, question="q", answers=["2"],
                          image_path=None, task=task)
        with pytest.raises(KeyError):
            ad.generate_until([missing])
        assert ReplayAdapter(str(tmp_path), strict=False).generate_until(
            [missing]) == [""]

    def test_missing_paths_raise(self, tmp_path):
        from visionselector_tpu.eval.replay import ReplayAdapter

        with pytest.raises(FileNotFoundError):
            ReplayAdapter(str(tmp_path / "nope"))
        (tmp_path / "empty").mkdir()
        with pytest.raises(FileNotFoundError):
            ReplayAdapter(str(tmp_path / "empty"))

    def test_filename_stamp_beats_mtime(self, tmp_path):
        """Copies/checkouts reset mtimes; the tracker's filename stamp is
        the durable recency signal (reference parses date-stamped folders,
        from_log.py:74-81)."""
        from visionselector_tpu.eval.replay import ReplayAdapter
        from visionselector_tpu.eval.tasks import TASKS, Request

        newer = tmp_path / "chartqa_20260102T000000_aa.jsonl"
        older = tmp_path / "chartqa_20260101T000000_bb.jsonl"
        self._write_log(newer, [
            {"task": "chartqa", "doc_id": 0, "question": "q",
             "answers": ["1"], "prediction": "new", "is_padding": False}])
        self._write_log(older, [
            {"task": "chartqa", "doc_id": 0, "question": "q",
             "answers": ["1"], "prediction": "old", "is_padding": False}])
        # adversarial mtimes: the OLDER run's file was written last
        os.utime(newer, (os.path.getmtime(older) - 100,) * 2)
        ad = ReplayAdapter(str(tmp_path))
        req = Request(doc_id=0, question="q", answers=["1"],
                      image_path=None, task=TASKS["chartqa"])
        assert ad.generate_until([req]) == ["new"]
