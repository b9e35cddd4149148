"""Response filter pipeline tests (lmms-eval filters parity)."""

import numpy as np

from visionselector_tpu.eval.filters import (
    PIPELINES,
    RegexFilter,
    RemovePrefix,
    apply_pipeline,
)
from visionselector_tpu.eval.tasks import TASKS, Request, score_request


class TestFilters:
    def test_regex_fallback(self):
        f = RegexFilter(r"\d+")
        assert f("abc 42 def") == "42"
        assert f("no digits") == "no digits"
        assert RegexFilter(r"\d+", fallback="[none]")("x") == "[none]"

    def test_mc_letter_pipeline(self):
        cases = {
            "The answer is (B).": "B",
            "B": "B",
            "b.": "b",
            "Answer: C": "C",
            "I think the answer is D because...": "D",
        }
        for raw, want in cases.items():
            assert apply_pipeline("mc_letter", raw) == want, raw

    def test_yes_no_pipeline(self):
        assert apply_pipeline("yes_no", "Yes, it is present.") == "yes"
        assert apply_pipeline("yes_no", "No.") == "no"

    def test_number_pipeline(self):
        assert apply_pipeline("number", "It is about 1,234.5% higher") == "1,234.5%"
        assert apply_pipeline("number", "a cat") == "a cat"  # fallback

    def test_unknown_pipeline_is_identity(self):
        assert apply_pipeline("nope", "raw") == "raw"

    def test_scoring_applies_task_filter(self):
        task = TASKS["mmmu_val"]
        req = Request(doc_id=0, question="q", answers=["B"], image_path=None,
                      task=task)
        assert score_request(req, "The correct answer is (B), clearly.") == 1.0
        assert score_request(req, "It must be (A).") == 0.0
        assert task.filter == "mc_letter"

    def test_remove_prefix(self):
        f = RemovePrefix("the answer is")
        assert f("The answer is: 42") == "42"
        assert f("Nothing here") == "Nothing here"
