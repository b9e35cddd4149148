"""OpenAI-compatible HTTP eval adapter (lmms-eval ``openai_compatible``
parity): the eval harness scores a chat-completions server — here this
framework's own ``api.serve`` — over real HTTP."""

import argparse
import io
import json
import os
import threading

import numpy as np
import pytest


def _write_task(tmp_path, n=2):
    from PIL import Image

    for i in range(n):
        Image.fromarray(
            (np.random.RandomState(i).rand(56, 56, 3) * 255
             ).astype(np.uint8)).save(tmp_path / f"img{i}.png")
    with open(tmp_path / "chartqa.jsonl", "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "question": f"What is value {i}?", "answers": [str(i)],
                "image": f"img{i}.png",
            }) + "\n")


class TestOpenAICompatAdapter:
    def test_eval_over_live_serve_endpoint(self, tmp_path):
        """run_eval --http-endpoint against an in-process api.serve: the
        whole pipeline (tasks, filters, metrics, tracker) runs over HTTP."""
        from visionselector_tpu.api.run_eval import main as run_eval
        from visionselector_tpu.api.serve import build_server

        args = argparse.Namespace(
            model_path=None, method="selector", budget=0.5,
            host="127.0.0.1", port=0,
        )
        httpd = build_server(args)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        _write_task(tmp_path)
        out = str(tmp_path / "res")
        try:
            rc = run_eval([
                "--data-dir", str(tmp_path), "--tasks", "chartqa",
                "--http-endpoint", f"http://127.0.0.1:{port}",
                "--http-concurrency", "2", "--output-dir", out,
            ])
        finally:
            httpd.shutdown()
            srv = getattr(httpd, "server_obj", None)
            if srv is not None:
                srv.close()
        assert rc == 0
        with open(os.path.join(out, "http_endpoint.json")) as f:
            res = json.load(f)
        assert res["results"]["chartqa/n"] == 2.0
        assert "chartqa/relaxed_accuracy" in res["results"]

    def test_payload_shape_and_url_normalization(self, tmp_path):
        from PIL import Image

        from visionselector_tpu.eval.http_adapter import OpenAICompatAdapter
        from visionselector_tpu.eval.tasks import TASKS, Request

        a = OpenAICompatAdapter("http://h:1")
        assert a.url == "http://h:1/v1/chat/completions"
        a2 = OpenAICompatAdapter("http://h:1/v1/")
        assert a2.url == "http://h:1/v1/chat/completions"

        img = tmp_path / "x.png"
        Image.fromarray(np.zeros((28, 28, 3), np.uint8)).save(img)
        req = Request(doc_id=0, question="Q?", answers=["a"],
                      image_path=str(img), task=TASKS["chartqa"])
        payload = a._payload(req, until=("<|im_end|>",))
        parts = payload["messages"][0]["content"]
        assert parts[0] == {"type": "text", "text": "Q?"}
        assert parts[1]["image_url"]["url"].startswith(
            "data:image/png;base64,")
        assert payload["max_tokens"] == TASKS["chartqa"].max_new_tokens
        assert payload["temperature"] == 0.0

    def test_loglikelihood_tasks_rejected(self):
        from visionselector_tpu.eval.http_adapter import OpenAICompatAdapter

        with pytest.raises(SystemExit):
            OpenAICompatAdapter("http://h:1").predict_multiple_choice([])

    def test_lmms_cli_dispatch(self, tmp_path, monkeypatch):
        """--model openai_compatible routes base_url through run_eval's
        --http-endpoint (reference --model_args surface)."""
        import visionselector_tpu.api.lmms_eval_cli as cli

        seen = {}

        def fake_run_eval(argv):
            seen["argv"] = argv
            return 0

        monkeypatch.setattr("visionselector_tpu.api.run_eval.main",
                            fake_run_eval)
        rc = cli.main([
            "--model", "openai_compatible",
            "--model_args", "base_url=http://h:9,model=m1",
            "--tasks", "chartqa", "--data_dir", str(tmp_path),
            "--output_path", str(tmp_path / "out"),
        ])
        assert rc == 0
        argv = seen["argv"]
        assert argv[argv.index("--http-endpoint") + 1] == "http://h:9"
        assert argv[argv.index("--http-model") + 1] == "m1"
