"""Serving endpoint test: start the HTTP server, hit it with real requests."""

import argparse
import base64
import io
import json
import threading
import urllib.request

import numpy as np


def _stop(httpd):
    """Shut down the HTTP server AND its batcher worker thread: leaked
    daemon workers pin their slot pools for the rest of the test
    process."""
    httpd.shutdown()
    srv = getattr(httpd, "server_obj", None)
    if srv is not None:
        srv.close()


class TestServe:
    def test_health_and_generate(self):
        from visionselector_tpu.api.serve import build_server

        args = argparse.Namespace(
            model_path=None, method="selector", budget=0.5,
            host="127.0.0.1", port=0,
        )
        httpd = build_server(args)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=30
            ) as r:
                health = json.loads(r.read())
            assert health["ok"] and health["budget"] == 0.5

            # browser chat page (gradio-app parity surface)
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=30
            ) as r:
                page = r.read().decode()
            assert "text/html" in r.headers["Content-Type"]
            assert "/generate" in page

            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(
                (np.random.RandomState(0).rand(56, 56, 3) * 255).astype(np.uint8)
            ).save(buf, format="PNG")
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps({
                    "prompt": "hi",
                    "image_b64": base64.b64encode(buf.getvalue()).decode(),
                    "max_new_tokens": 2,
                }).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                out = json.loads(r.read())
            assert out["kept_vision_tokens"] <= out["num_vision_tokens"]
            assert len(out["tokens"]) >= 1

            # text-only request: no silent image substitution
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps({"prompt": "hi", "max_new_tokens": 2}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                out = json.loads(r.read())
            assert out["num_vision_tokens"] == 0
            assert len(out["tokens"]) >= 1

            # probe: bad route
            try:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/nope", timeout=10
                )
                assert False, "expected 404"
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            _stop(httpd)


class TestServeSampling:
    def test_sampling_params_honored_and_reproducible(self):
        """temperature/top_p/seed ride through /generate and the OpenAI
        endpoint: same seed reproduces, sampling diverges from greedy."""
        from visionselector_tpu.api.serve import build_server

        args = argparse.Namespace(
            model_path=None, method="selector", budget=0.5,
            host="127.0.0.1", port=0,
        )
        httpd = build_server(args)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()

        def gen(body, route="/generate"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{route}",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                return json.loads(r.read())

        try:
            base = {"prompt": "hi", "max_new_tokens": 10}
            greedy = gen(base)
            s1 = gen({**base, "temperature": 0.3, "top_p": 0.9, "seed": 7})
            s2 = gen({**base, "temperature": 0.3, "top_p": 0.9, "seed": 7})
            s3 = gen({**base, "temperature": 0.3, "top_p": 0.9, "seed": 8})
            assert s1["tokens"] == s2["tokens"]  # seed-reproducible
            assert s1["tokens"] != greedy["tokens"]
            assert s3["tokens"] != s1["tokens"]  # different seed differs

            # chat sessions accept sampling too (per-turn seed): two fresh
            # sessions with the same prompt+seed produce the same tokens
            sa = gen({**base, "temperature": 0.3, "top_p": 0.9, "seed": 7,
                      "session": "sa"})
            sb = gen({**base, "temperature": 0.3, "top_p": 0.9, "seed": 7,
                      "session": "sb"})
            assert sa["tokens"] == sb["tokens"]
            assert sa["tokens"] != greedy["tokens"]

            # OpenAI-compatible endpoint takes the same knobs
            body = {"messages": [{"role": "user", "content": "hi"}],
                    "max_tokens": 10, "temperature": 0.3, "top_p": 0.9,
                    "seed": 7}
            oai = gen(body, route="/v1/chat/completions")
            # no tokenizer in tests: content falls back to token-id string
            content = oai["choices"][0]["message"]["content"]
            assert content == " ".join(str(t) for t in s1["tokens"])
        finally:
            _stop(httpd)


class TestServeSpeculative:
    def test_speculative_flag_serves_identical_greedy(self):
        from visionselector_tpu.api.serve import build_server

        def mk(spec):
            args = argparse.Namespace(
                model_path=None, method="selector", budget=0.5,
                host="127.0.0.1", port=0, speculative=spec,
            )
            httpd = build_server(args)
            port = httpd.server_address[1]
            threading.Thread(target=httpd.serve_forever, daemon=True).start()
            return httpd, port

        def ask(port):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps({"prompt": "hi", "max_new_tokens": 8}
                                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                return json.loads(r.read())

        h1, p1 = mk(0)
        h2, p2 = mk(5)
        try:
            plain = ask(p1)
            spec = ask(p2)
            assert spec["tokens"] == plain["tokens"]
        finally:
            _stop(h1)
            _stop(h2)


class TestServeContinuous:
    def test_continuous_batching_serves_identical_tokens(self):
        from visionselector_tpu.api.serve import build_server

        def mk(slots, spec=0):
            args = argparse.Namespace(
                model_path=None, method="selector", budget=0.5,
                host="127.0.0.1", port=0, continuous=slots,
                continuous_t_max=512, continuous_chunk=4, speculative=spec,
            )
            httpd = build_server(args)
            port = httpd.server_address[1]
            threading.Thread(target=httpd.serve_forever,
                             daemon=True).start()
            return httpd, port

        def ask(port, prompt, mnt):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps({"prompt": prompt,
                                 "max_new_tokens": mnt}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                return json.loads(r.read())

        h1, p1 = mk(0)
        h2, p2 = mk(2)
        h3, p3 = mk(2, spec=3)  # continuous + speculative slots
        try:
            work = [("hi", 8), ("what is this?", 5), ("describe", 11)]
            plain = [ask(p1, q, m) for q, m in work]
            import concurrent.futures as cf

            with cf.ThreadPoolExecutor(max_workers=3) as ex:
                futs = [ex.submit(ask, p2, q, m) for q, m in work]
                cont = [f.result(timeout=300) for f in futs]
            for a, b in zip(plain, cont):
                assert a["tokens"] == b["tokens"], (a, b)
            with cf.ThreadPoolExecutor(max_workers=3) as ex:
                futs = [ex.submit(ask, p3, q, m) for q, m in work]
                spec = [f.result(timeout=300) for f in futs]
            for a, b in zip(plain, spec):
                assert a["tokens"] == b["tokens"], (a, b)
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{p2}/health", timeout=60) as r:
                health = json.loads(r.read())
            assert health["continuous"]["admitted"] == 3
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{p3}/health", timeout=60) as r:
                health3 = json.loads(r.read())
            assert health3["continuous"]["spec_steps"] >= 1
        finally:
            _stop(h1)
            _stop(h2)
            _stop(h3)


class TestServePrefixCache:
    def test_prefix_cache_hit_serves_identical_tokens(self):
        from visionselector_tpu.api.serve import build_server

        args = argparse.Namespace(
            model_path=None, method="selector", budget=0.5,
            host="127.0.0.1", port=0, prefix_cache=4, prefix_cache_min=1,
        )
        httpd = build_server(args)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()

        def ask(prompt):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps({"prompt": prompt, "max_new_tokens": 8}
                                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                return json.loads(r.read())

        try:
            a = ask("hi")
            b = ask("hi")  # exact repeat -> prefix-cache hit
            assert a["tokens"] == b["tokens"]
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health", timeout=60) as r:
                health = json.loads(r.read())
            assert health["prefix_cache"]["hits"] >= 1
            assert health["prefix_cache"]["entries"] >= 1
        finally:
            _stop(httpd)


class TestServeChatSession:
    def test_multi_turn_session_reuses_kv(self):
        from visionselector_tpu.api.serve import build_server

        args = argparse.Namespace(
            model_path=None, method="selector", budget=0.5,
            host="127.0.0.1", port=0,
        )
        httpd = build_server(args)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()

        def ask(payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                return json.loads(r.read())

        try:
            r1 = ask({"prompt": "hello", "session": "s1",
                      "max_new_tokens": 6})
            assert r1["session"] == "s1" and len(r1["tokens"]) > 0
            r2 = ask({"prompt": "and then?", "session": "s1",
                      "max_new_tokens": 6})
            assert r2["session"] == "s1" and len(r2["tokens"]) > 0
            # follow-up consumed only the turn chunk, not a full prompt
            assert r2["prefill_ms"] >= 0.0
        finally:
            _stop(httpd)


class TestServeStreaming:
    def test_stream_chunks_then_summary(self):
        from visionselector_tpu.api.serve import build_server

        args = argparse.Namespace(
            model_path=None, method="selector", budget=0.5,
            host="127.0.0.1", port=0,
        )
        httpd = build_server(args)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps({"prompt": "hi", "max_new_tokens": 4,
                                 "stream": True}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                lines = [json.loads(l) for l in r.read().splitlines() if l]
            assert lines[-1].get("done") is True
            streamed = [t for l in lines[:-1] for t in l["tokens"]]
            assert streamed == lines[-1]["tokens"]
            assert 1 <= len(streamed) <= 4
        finally:
            _stop(httpd)


class TestOpenAICompat:
    def test_chat_completions_and_sse_stream(self):
        from visionselector_tpu.api.serve import build_server

        args = argparse.Namespace(
            model_path=None, method="selector", budget=0.5,
            host="127.0.0.1", port=0,
        )
        httpd = build_server(args)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            body = {
                "model": "visionselector",
                "messages": [{"role": "user", "content": [
                    {"type": "text", "text": "What is this?"},
                ]}],
                "max_tokens": 3,
            }
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/chat/completions",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                out = json.loads(r.read())
            assert out["object"] == "chat.completion"
            assert out["choices"][0]["message"]["role"] == "assistant"
            assert out["choices"][0]["message"]["content"]
            assert out["usage"]["completion_tokens"] >= 1

            body["stream"] = True
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/chat/completions",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                raw = r.read().decode()
            events = [l[6:] for l in raw.splitlines()
                      if l.startswith("data: ")]
            assert events[-1] == "[DONE]"
            chunks = [json.loads(e) for e in events[:-1]]
            assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
            assert any(c["choices"][0]["delta"].get("content")
                       for c in chunks)
        finally:
            _stop(httpd)


class TestWarmup:
    def test_warmup_compiles_buckets(self, capsys):
        from visionselector_tpu.api.warmup import main

        rc = main(["--buckets", "128,256", "--max-new-tokens", "2",
                   "--budget", "0.5"])
        assert rc == 0
        lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
                 if l.startswith("{")]
        assert len(lines) == 3  # two buckets + text-only
        assert lines[0]["patches"] <= 128
        assert lines[-1]["bucket"] == "text_only"


class TestMicroBatch:
    def test_concurrent_requests_batched(self):
        """--micro-batch coalesces concurrent /generate calls into one
        batched decode; responses must match the sequential server's."""
        from visionselector_tpu.api.serve import build_server

        def mk(micro):
            args = argparse.Namespace(
                model_path=None, method="selector", budget=0.5,
                host="127.0.0.1", port=0, micro_batch=micro,
                batch_window_ms=30.0,
            )
            httpd = build_server(args)
            threading.Thread(target=httpd.serve_forever, daemon=True).start()
            return httpd, httpd.server_address[1]

        from PIL import Image

        def img_b64(seed):
            buf = io.BytesIO()
            Image.fromarray(
                (np.random.RandomState(seed).rand(56, 56, 3) * 255)
                .astype(np.uint8)
            ).save(buf, format="PNG")
            return base64.b64encode(buf.getvalue()).decode()

        payloads = [
            {"prompt": "one", "image_b64": img_b64(1), "max_new_tokens": 3},
            {"prompt": "two", "image_b64": img_b64(2), "max_new_tokens": 3},
            {"prompt": "three", "max_new_tokens": 3},  # text-only
        ]

        def post(port, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                return json.loads(r.read())

        httpd_seq, port_seq = mk(1)
        try:
            want = [post(port_seq, p) for p in payloads]
        finally:
            _stop(httpd_seq)

        httpd_bat, port_bat = mk(4)
        try:
            got = [None] * len(payloads)
            errs = []

            def worker(i):
                try:
                    got[i] = post(port_bat, payloads[i])
                except Exception as e:  # noqa: BLE001
                    errs.append(e)

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(len(payloads))]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=600)
            assert not errs, errs
            for g, w in zip(got, want):
                assert g["tokens"] == w["tokens"]
                assert g["num_vision_tokens"] == w["num_vision_tokens"]
        finally:
            _stop(httpd_bat)


class TestServeOVFamily:
    def test_generate_ov(self):
        from visionselector_tpu.api.serve import build_server

        args = argparse.Namespace(
            model_path=None, method="selector", budget=0.5,
            host="127.0.0.1", port=0, family="llava_ov15",
        )
        httpd = build_server(args)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(
                (np.random.RandomState(0).rand(56, 84, 3) * 255)
                .astype(np.uint8)
            ).save(buf, format="PNG")
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps({
                    "prompt": "hi",
                    "image_b64": base64.b64encode(buf.getvalue()).decode(),
                    "max_new_tokens": 2,
                }).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                out = json.loads(r.read())
            assert out["kept_vision_tokens"] <= out["num_vision_tokens"]
            assert len(out["tokens"]) >= 1
        finally:
            _stop(httpd)


class TestWarmupMicroBatch:
    def test_warmup_decode_batches(self, capsys):
        from visionselector_tpu.api.warmup import main

        rc = main(["--buckets", "256", "--max-new-tokens", "3",
                   "--micro-batch", "4"])
        assert rc == 0
        out = capsys.readouterr().out
        assert '"decode_batch": 2' in out
        assert '"decode_batch": 4' in out


class TestMetricsEndpoint:
    def test_metrics_counters_advance(self):
        import argparse

        from visionselector_tpu.api.serve import build_server

        args = argparse.Namespace(model_path=None, method="selector",
                                  budget=0.5, host="127.0.0.1", port=0)
        httpd = build_server(args)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            def scrape():
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/metrics",
                        timeout=120) as r:
                    assert r.headers["Content-Type"].startswith(
                        "text/plain")
                    return dict(
                        line.split(" ", 1)
                        for line in r.read().decode().splitlines()
                        if line and not line.startswith("#"))

            before = scrape()
            assert before["vst_requests_total"] == "0"
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps({"prompt": "hello",
                                 "max_new_tokens": 5}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                out = json.loads(r.read())
            after = scrape()
            assert after["vst_requests_total"] == "1"
            assert int(after["vst_tokens_out_total"]) == len(out["tokens"])
            assert float(after["vst_request_seconds_sum"]) > 0
        finally:
            httpd.shutdown()
            httpd.server_obj.close()
