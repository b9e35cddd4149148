"""HF-release -> jsonl exporters (VERDICT r4 item 3): synthetic parquet /
save_to_disk fixtures standing in for the hub releases the reference's task
yamls pull (e.g. ``lmms-eval/lmms_eval/tasks/chartqa/chartqa.yaml``
``dataset_path: lmms-lab/ChartQA``)."""

import io
import json
import os

import numpy as np
import pytest

from visionselector_tpu.eval.export_tasks import (
    EXPORTERS,
    export_task,
    main,
    mc_block,
)
from visionselector_tpu.eval.tasks import TASKS, load_task_docs


def png_bytes(seed=0, size=28):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        (np.random.RandomState(seed).rand(size, size, 3) * 255
         ).astype(np.uint8)).save(buf, format="PNG")
    return buf.getvalue()


def write_parquet(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = {k: [r[k] for r in rows] for k in rows[0]}
    pq.write_table(pa.table(cols), path)


class TestImageExporters:
    def test_chartqa_parquet_end_to_end(self, tmp_path):
        """parquet fixture -> export -> run_eval consumes the output."""
        src = tmp_path / "chartqa.parquet"
        write_parquet(str(src), [
            {"question": f"What is {i}?", "answer": str(i),
             "image": {"bytes": png_bytes(i), "path": None},
             "type": "human_test"}
            for i in range(3)
        ])
        out = str(tmp_path / "export")
        n = export_task("chartqa", str(src), out)
        assert n == 3
        reqs = load_task_docs(TASKS["chartqa"], out)
        assert len(reqs) == 3 and os.path.exists(reqs[0].image_path)

        from visionselector_tpu.api.run_eval import main as run_eval

        res_dir = str(tmp_path / "res")
        rc = run_eval([
            "--data-dir", out, "--tasks", "chartqa", "--method", "selector",
            "--budgets", "0.5", "--limit", "2", "--output-dir", res_dir,
        ])
        assert rc == 0
        with open(os.path.join(res_dir, "selector_0.5_rank0.json")) as f:
            assert "chartqa/relaxed_accuracy" in json.load(f)["results"]

    def test_docvqa_save_to_disk(self, tmp_path):
        import datasets
        from PIL import Image

        imgs = [Image.open(io.BytesIO(png_bytes(i))) for i in range(2)]
        ds = datasets.Dataset.from_dict({
            "question": ["q0", "q1"],
            "answers": [["a", "b"], ["c"]],
            "image": imgs,
        }).cast_column("image", datasets.Image())
        src = tmp_path / "docvqa_hf"
        ds.save_to_disk(str(src))
        out = str(tmp_path / "export")
        assert export_task("docvqa_val", str(src), out) == 2
        reqs = load_task_docs(TASKS["docvqa_val"], out)
        assert reqs[0].answers == ["a", "b"]
        assert os.path.exists(reqs[1].image_path)

    def test_scienceqa_mc_render_and_image_filter(self, tmp_path):
        src = tmp_path / "sqa.parquet"
        write_parquet(str(src), [
            {"question": "Which?", "choices": ["x", "y", "z"], "answer": 2,
             "hint": "a hint", "image": {"bytes": png_bytes(1), "path": None}},
            {"question": "skipme", "choices": ["x", "y"], "answer": 0,
             "hint": "", "image": None},  # text-only doc: excluded (img task)
        ])
        out = str(tmp_path / "export")
        assert export_task("scienceqa_img", str(src), out) == 1
        reqs = load_task_docs(TASKS["scienceqa_img"], out)
        assert reqs[0].answers == ["C"]
        assert "Context: a hint" in reqs[0].question
        assert "A. x\nB. y\nC. z" in reqs[0].question

    def test_ai2d_letter_normalization(self, tmp_path):
        src = tmp_path / "ai2d.parquet"
        write_parquet(str(src), [
            {"question": "Part?", "options": ["leaf", "stem"],
             "answer": "1", "image": {"bytes": png_bytes(2), "path": None}},
        ])
        out = str(tmp_path / "export")
        assert export_task("ai2d_no_mask", str(src), out) == 1
        reqs = load_task_docs(TASKS["ai2d_no_mask"], out)
        assert reqs[0].answers == ["B"]

    def test_pope_and_textvqa(self, tmp_path):
        for task, rows in [
            ("pope", [{"question": "Is there a cat?", "answer": "yes",
                       "image": {"bytes": png_bytes(3), "path": None}}]),
            ("textvqa_val", [{"question": "What?", "answers": ["w"] * 10,
                              "image": {"bytes": png_bytes(4),
                                        "path": None}}]),
        ]:
            src = tmp_path / f"{task}.parquet"
            write_parquet(str(src), rows)
            out = str(tmp_path / f"out_{task}")
            assert export_task(task, str(src), out) == 1
            reqs = load_task_docs(TASKS[task], out)
            assert reqs and os.path.exists(reqs[0].image_path)

    def test_mmbench_option_columns(self, tmp_path):
        src = tmp_path / "mmbench.parquet"
        write_parquet(str(src), [
            {"question": "Pick", "hint": None, "A": "one", "B": "two",
             "C": None, "D": None, "E": None, "answer": "b",
             "image": {"bytes": png_bytes(5), "path": None}},
        ])
        out = str(tmp_path / "export")
        assert export_task("mmbench", str(src), out) == 1
        reqs = load_task_docs(TASKS["mmbench"], out)
        assert reqs[0].answers == ["B"]
        assert "A. one\nB. two" in reqs[0].question
        assert "C." not in reqs[0].question

    def test_limit_and_cli(self, tmp_path, capsys):
        src = tmp_path / "chartqa.parquet"
        write_parquet(str(src), [
            {"question": f"q{i}", "answer": str(i),
             "image": {"bytes": png_bytes(i), "path": None}, "type": "t"}
            for i in range(5)
        ])
        out = str(tmp_path / "export")
        rc = main(["--task", "chartqa", "--dataset-path", str(src),
                   "--output-dir", out, "--limit", "2"])
        assert rc == 0
        assert json.loads(capsys.readouterr().out)["exported"] == 2

    def test_unknown_task_rejected(self, tmp_path):
        with pytest.raises(SystemExit):
            export_task("nope", str(tmp_path), str(tmp_path))


class TestVideoExporter:
    def test_videomme_jsonl(self, tmp_path):
        src = tmp_path / "videomme.parquet"
        write_parquet(str(src), [
            {"question": "What happens?",
             "options": ["A. x", "B. y", "C. z", "D. w"],
             "answer": "C", "videoID": "vid001"},
        ])
        out = str(tmp_path / "export")
        assert export_task("videomme", str(src), out) == 1
        reqs = load_task_docs(TASKS["videomme"], out)
        assert reqs[0].video_path.endswith("vid001.mp4")
        assert reqs[0].answers == ["C"]
        assert "B. y" in reqs[0].question


class TestCoverage:
    def test_exporters_cover_paper_suite(self):
        # every paper image-suite task (run_selector.sh:36) has an exporter,
        # including the mmmu multi-image case
        for t in ("chartqa", "docvqa_val", "textvqa_val", "ocrbench",
                  "scienceqa_img", "ai2d_no_mask", "mmmu_val", "mme",
                  "pope", "videomme"):
            assert t in EXPORTERS

    def test_every_builtin_task_has_a_data_path(self):
        """Every registered TaskConfig is exportable: either its own
        exporter or (loglikelihood variants) a shared dataset_file whose
        base task has one."""
        for name, cfg in TASKS.items():
            base = cfg.dataset_file or name
            assert base in EXPORTERS, f"no exporter for task {name!r}"

    def test_mc_block_shape(self):
        assert mc_block("Q?", ["a", "b"]) == "Q?\nA. a\nB. b"
        assert mc_block("Q?", ["a"], "hint") == "Context: hint\nQ?\nA. a"


class TestSecondaryExporters:
    """Round-5 breadth: the remaining registered tasks' exporters, each
    against a synthetic release in the reference task's field schema."""

    def test_seedbench_image_list_and_choices(self, tmp_path):
        import datasets
        from PIL import Image

        imgs = [[Image.open(io.BytesIO(png_bytes(i))) for i in range(2)]]
        ds = datasets.Dataset.from_dict({
            "question": ["Which scene?"], "choice_a": ["rain"],
            "choice_b": ["sun"], "choice_c": ["snow"], "choice_d": ["fog"],
            "answer": ["B"], "image": imgs,
        }).cast_column("image", datasets.Sequence(datasets.Image()))
        src = tmp_path / "seed_hf"
        ds.save_to_disk(str(src))
        out = str(tmp_path / "export")
        assert export_task("seedbench", str(src), out) == 1
        reqs = load_task_docs(TASKS["seedbench"], out)
        assert len(reqs[0].image_paths) == 2
        assert reqs[0].answers == ["B"]
        assert "A. rain\nB. sun\nC. snow\nD. fog" in reqs[0].question

    def test_mmstar_and_realworldqa_embedded_options(self, tmp_path):
        for task, rows, want in [
            ("mmstar", [{"question": "Q?\nOptions: A. x, B. y",
                         "answer": "(A)",
                         "image": {"bytes": png_bytes(1), "path": None}}],
             ["A"]),
            ("realworldqa", [{"question": "How many?\nA. 1\nB. 2",
                              "answer": "b",
                              "image": {"bytes": png_bytes(2),
                                        "path": None}}],
             ["B"]),
        ]:
            src = tmp_path / f"{task}.parquet"
            write_parquet(str(src), rows)
            out = str(tmp_path / f"out_{task}")
            assert export_task(task, str(src), out) == 1
            reqs = load_task_docs(TASKS[task], out)
            assert reqs[0].answers == want

    def test_hallusion_gt_answer_and_image_filter(self, tmp_path):
        src = tmp_path / "hallusion.parquet"
        write_parquet(str(src), [
            {"question": "Is the chart rising?", "gt_answer": "1",
             "image": {"bytes": png_bytes(3), "path": None}},
            {"question": "no-figure row", "gt_answer": "0", "image": None},
        ])
        out = str(tmp_path / "export")
        assert export_task("hallusion_bench_image", str(src), out) == 1
        reqs = load_task_docs(TASKS["hallusion_bench_image"], out)
        assert reqs[0].answers == ["yes"]

    def test_mme_realworld_base64_bytes(self, tmp_path):
        import base64

        src = tmp_path / "mmerw.parquet"
        write_parquet(str(src), [
            {"question": "Pick one.",
             "multi-choice options": ["(A) cat", "(B) dog"],
             "answer": "(B)",
             "bytes": base64.b64encode(png_bytes(4)).decode()},
        ])
        out = str(tmp_path / "export")
        assert export_task("mme_realworld", str(src), out) == 1
        reqs = load_task_docs(TASKS["mme_realworld"], out)
        assert reqs[0].answers == ["B"]
        assert "(A) cat" in reqs[0].question
        assert os.path.exists(reqs[0].image_path)

    def test_qbench_na_options(self, tmp_path):
        src = tmp_path / "qbench.parquet"
        write_parquet(str(src), [
            {"question": "Quality?", "option0": "good", "option1": "bad",
             "option2": "N/A", "option3": "N/A", "correct_choice": "bad",
             "image": {"bytes": png_bytes(5), "path": None}},
        ])
        out = str(tmp_path / "export")
        assert export_task("qbench_dev", str(src), out) == 1
        reqs = load_task_docs(TASKS["qbench_dev"], out)
        assert reqs[0].answers == ["B"]
        assert "C." not in reqs[0].question

    def test_ocr_vqa_generic(self, tmp_path):
        src = tmp_path / "ocrvqa.parquet"
        write_parquet(str(src), [
            {"question": "Title?", "answers": ["Dune"],
             "image": {"bytes": png_bytes(6), "path": None}},
        ])
        out = str(tmp_path / "export")
        assert export_task("ocr_vqa", str(src), out) == 1
        reqs = load_task_docs(TASKS["ocr_vqa"], out)
        assert reqs[0].answers == ["Dune"]


class TestCaptionAndR5Exporters:
    def test_caption_family_fields(self, tmp_path):
        """coco/nocaps/textcaps/flickr each read their release's caption
        column; jsonl question is the fixed caption prompt."""
        cases = [
            ("coco2017_cap_val", "answer"),
            ("nocaps_val", "annotations_captions"),
            ("textcaps_val", "caption_str"),
            ("flickr30k_test", "caption"),
        ]
        for task, field in cases:
            src = tmp_path / f"{task}.parquet"
            write_parquet(str(src), [
                {field: ["a cat on a mat", "a feline resting"],
                 "image": {"bytes": png_bytes(1), "path": None}},
            ])
            out = str(tmp_path / f"out_{task}")
            assert export_task(task, str(src), out) == 1
            reqs = load_task_docs(TASKS[task], out)
            assert reqs[0].answers == ["a cat on a mat", "a feline resting"]
            assert "one-sentence caption" in reqs[0].question

    def test_websrc_base64_and_squad_target(self, tmp_path):
        import base64

        src = tmp_path / "websrc.parquet"
        write_parquet(str(src), [
            {"question": "What is the price?", "answer": "$10",
             "image": base64.b64encode(png_bytes(2)).decode()},
        ])
        out = str(tmp_path / "export")
        assert export_task("websrc", str(src), out) == 1
        reqs = load_task_docs(TASKS["websrc"], out)
        assert reqs[0].answers == ["$10"]
        assert os.path.exists(reqs[0].image_path)

    def test_muirbench_multi_image(self, tmp_path):
        import datasets
        from PIL import Image

        ds = datasets.Dataset.from_dict({
            "question": ["Which image shows a dog?"],
            "options": [["first", "second"]],
            "answer": ["second"],
            "image_list": [[Image.open(io.BytesIO(png_bytes(i)))
                            for i in range(2)]],
        }).cast_column("image_list", datasets.Sequence(datasets.Image()))
        src = tmp_path / "muir_hf"
        ds.save_to_disk(str(src))
        out = str(tmp_path / "export")
        assert export_task("muirbench", str(src), out) == 1
        reqs = load_task_docs(TASKS["muirbench"], out)
        assert len(reqs[0].image_paths) == 2
        assert reqs[0].answers == ["B"]

    def test_iconqa_types(self, tmp_path):
        src = tmp_path / "iconqa.parquet"
        write_parquet(str(src), [
            {"question": "How many?", "ques_type": "choose_txt",
             "choices": "two,three,four", "answer": "1",
             "query_image": {"bytes": png_bytes(3), "path": None}},
            {"question": "Fill: __", "ques_type": "fill_in_blank",
             "choices": None, "answer": "seven",
             "query_image": {"bytes": png_bytes(4), "path": None}},
            {"question": "Which image?", "ques_type": "choose_img",
             "choices": None, "answer": "0",
             "query_image": {"bytes": png_bytes(5), "path": None}},
        ])
        out = str(tmp_path / "export")
        assert export_task("iconqa", str(src), out) == 2  # choose_img skipped
        reqs = load_task_docs(TASKS["iconqa"], out)
        assert reqs[0].answers == ["B"]
        assert reqs[1].answers == ["seven"]

    def test_hrbench_and_vmcbench_letter_columns(self, tmp_path):
        import base64

        src = tmp_path / "hrbench.parquet"
        write_parquet(str(src), [
            {"question": "Where?", "A": "left", "B": "right",
             "C": float("nan"), "D": float("nan"), "answer": "A",
             "image": base64.b64encode(png_bytes(6)).decode()},
        ])
        out = str(tmp_path / "export")
        assert export_task("hrbench", str(src), out) == 1
        reqs = load_task_docs(TASKS["hrbench"], out)
        assert reqs[0].answers == ["A"]
        assert "C." not in reqs[0].question

        src2 = tmp_path / "vmc.parquet"
        write_parquet(str(src2), [
            {"question": "Pick", "A": "x", "B": "y", "C": "z", "D": "w",
             "answer": "C",
             "image": {"bytes": png_bytes(7), "path": None}},
        ])
        out2 = str(tmp_path / "export2")
        assert export_task("vmcbench", str(src2), out2) == 1
        reqs2 = load_task_docs(TASKS["vmcbench"], out2)
        assert reqs2[0].answers == ["C"]

    def test_multidocvqa_string_answers_and_pages(self, tmp_path):
        row = {"question": "Total?", "answers": "['42', 'forty two']"}
        for i in range(1, 21):
            row[f"image_{i}"] = ({"bytes": png_bytes(i), "path": None}
                                 if i <= 2 else None)
        src = tmp_path / "mpdoc.parquet"
        write_parquet(str(src), [row])
        out = str(tmp_path / "export")
        assert export_task("multidocvqa", str(src), out) == 1
        reqs = load_task_docs(TASKS["multidocvqa"], out)
        assert reqs[0].answers == ["42", "forty two"]
        assert len(reqs[0].image_paths) == 2

    def test_illusionvqa_text_answer_to_letter(self, tmp_path):
        src = tmp_path / "illusion.parquet"
        write_parquet(str(src), [
            {"question": "What shape?", "options": ["circle", "square"],
             "answer": "square",
             "image": {"bytes": png_bytes(8), "path": None}},
        ])
        out = str(tmp_path / "export")
        assert export_task("illusionvqa", str(src), out) == 1
        reqs = load_task_docs(TASKS["illusionvqa"], out)
        assert reqs[0].answers == ["B"]

    def test_egoplan_goal_template(self, tmp_path):
        src = tmp_path / "egoplan.parquet"
        write_parquet(str(src), [
            {"task_goal": "my goal is to make coffee",
             "choice_a": "pour water", "choice_b": "grind beans",
             "choice_c": "open fridge", "choice_d": "wash cup",
             "golden_choice_idx": "B", "sample_id": 1234},
        ])
        out = str(tmp_path / "export")
        assert export_task("egoplan", str(src), out) == 1
        reqs = load_task_docs(TASKS["egoplan"], out)
        assert reqs[0].answers == ["B"]
        assert "make coffee" in reqs[0].question
        assert reqs[0].video_path.endswith("1234.mp4")

    def test_videommmu_mc_and_open(self, tmp_path):
        src = tmp_path / "videommmu.parquet"
        write_parquet(str(src), [
            {"question": "Which theorem?", "question_type": "multiple-choice",
             "options": "['Bayes', 'Fermat']", "answer": "A",
             "id": "math_1_q"},
            {"question": "State the value.", "question_type": "open",
             "options": None, "answer": "3.14", "id": "math_2_q"},
        ])
        out = str(tmp_path / "export")
        assert export_task("videommmu", str(src), out) == 2
        reqs = load_task_docs(TASKS["videommmu"], out)
        assert reqs[0].answers == ["A"] and "A. Bayes" in reqs[0].question
        assert reqs[1].answers == ["3.14"]
        assert reqs[0].video_path.endswith("math_1_q.mp4")


class TestSecondaryVideoExporters:
    def test_index_answer_tasks(self, tmp_path):
        """egoschema / nextqa / perceptiontest: int answer index -> letter."""
        cases = [
            ("egoschema",
             [{"question": "What?", "option": ["A. run", "B. sit"],
               "answer": 1, "video_idx": "ego1"}], "ego1.mp4", ["B"]),
            ("nextqa_mc_test",
             [{"question": "Why?", "a0": "x", "a1": "y", "a2": "z",
               "a3": "w", "a4": "v", "answer": 0, "video": 4321}],
             "4321.mp4", ["A"]),
            ("perceptiontest_val_mc",
             [{"question": "Which?", "options": ["p", "q", "r"],
               "answer_id": 2, "video_name": "video_77"}],
             "video_77.mp4", ["C"]),
        ]
        for task, rows, video, want in cases:
            src = tmp_path / f"{task}.parquet"
            write_parquet(str(src), rows)
            out = str(tmp_path / f"out_{task}")
            assert export_task(task, str(src), out) == 1
            reqs = load_task_docs(TASKS[task], out)
            assert reqs[0].video_path.endswith(video)
            assert reqs[0].answers == want

    def test_letter_answer_tasks(self, tmp_path):
        cases = [
            ("tempcompass_mc",
             [{"question": "Which is correct?\nA. fast\nB. slow",
               "answer": "A. fast", "video_id": "tc9"}], "tc9.mp4", ["A"]),
            ("mlvu",
             [{"question": "Pick.\n(A) one (B) two", "answer": "(B) two",
               "video_name": "clip.mp4", "task_type": "plotQA"}],
             "clip.mp4", ["B"]),
            ("longvideobench",
             [{"question": "What first?", "option0": "walk",
               "option1": "jump", "option2": "N/A", "option3": "N/A",
               "option4": "N/A", "correct_choice": 1,
               "video_path": "lvb/v1.mp4"}], "lvb/v1.mp4", ["B"]),
            ("mvbench",
             [{"question": "Order?", "candidates": ["first", "second"],
               "answer": "second", "video": "sub/mv1.mp4"}],
             "sub/mv1.mp4", ["B"]),
        ]
        for task, rows, video, want in cases:
            src = tmp_path / f"{task.replace('/', '_')}.parquet"
            write_parquet(str(src), rows)
            out = str(tmp_path / f"out_{task}")
            assert export_task(task, str(src), out) == 1
            reqs = load_task_docs(TASKS[task], out)
            assert reqs[0].video_path.endswith(video)
            assert reqs[0].answers == want


class TestMMMUExporter:
    def test_multi_image_mc_and_open(self, tmp_path):
        src = tmp_path / "mmmu.parquet"
        write_parquet(str(src), [
            {"question": "Compare <image 1> and <image 2>.",
             "options": "['alpha', 'beta']", "answer": "B",
             "image_1": {"bytes": png_bytes(7), "path": None},
             "image_2": {"bytes": png_bytes(8), "path": None},
             "image_3": None, "image_4": None, "image_5": None,
             "image_6": None, "image_7": None},
            {"question": "Open-ended?", "options": "", "answer": "42",
             "image_1": {"bytes": png_bytes(9), "path": None},
             "image_2": None, "image_3": None, "image_4": None,
             "image_5": None, "image_6": None, "image_7": None},
        ])
        out = str(tmp_path / "export")
        assert export_task("mmmu_val", str(src), out) == 2
        reqs = load_task_docs(TASKS["mmmu_val"], out)
        assert len(reqs[0].image_paths) == 2
        assert all(os.path.exists(p) for p in reqs[0].image_paths)
        assert reqs[0].answers == ["B"]
        assert "A. alpha\nB. beta" in reqs[0].question
        assert reqs[1].answers == ["42"]
        assert len(reqs[1].image_paths) == 1
