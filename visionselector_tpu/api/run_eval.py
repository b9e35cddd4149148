"""Benchmark-suite eval entry point (parity with the reference's
``run_selector.sh`` / ``run_token_compression.sh`` drivers).

Usage:
    python -m visionselector_tpu.api.run_eval \
        --model-path /ckpt --data-dir /data \
        --tasks chartqa,textvqa_val --method selector --budgets 0.1,0.2,0.3 \
        --limit 8 --output-dir results/

Runs each (task x budget) cell, writes ``results/<method>_<budget>.json``, and
prints EVAL_TIME probes when ``EVAL_TIME=True`` (scrapeable by
``eval.extract_time``). ``--rank/--world-size`` shard requests across
processes (accelerate-style data-parallel eval; SURVEY.md §2.9).
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-path", required=False, default=None)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--tasks", required=True, help="comma-separated task names")
    p.add_argument("--method", default="selector")
    p.add_argument("--family", default="qwen25vl",
                   choices=("qwen25vl", "llava_ov15"))
    p.add_argument("--budgets", default="0.2", help="comma-separated ratios")
    p.add_argument("--limit", type=float, default=None,
                   help=">= 1: doc count; fraction in (0,1): share of docs "
                        "(lmms-eval --limit semantics)")
    p.add_argument("--output-dir", default="eval_results")
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--world-size", type=int, default=1)
    p.add_argument("--max-new-tokens", type=int, default=None)
    p.add_argument("--min-pixels", type=int, default=None,
                   help="per-image pixel floor (smart_resize lower bound)")
    p.add_argument("--max-pixels", type=int, default=None,
                   help="per-image pixel budget (reference model_args "
                        "max_pixels)")
    p.add_argument("--merge", action="store_true",
                   help="merge per-rank sample logs in --output-dir (run "
                        "after all ranks finish) — each doc scored once")
    p.add_argument("--task-config-dir", default=None,
                   help="directory of YAML/JSON TaskConfig files to register "
                        "(lmms-eval per-task yaml extensibility)")
    p.add_argument("--visualize-dir", default=None,
                   help="write per-sample heatmap/mask PNGs (run_visual.sh "
                        "parity)")
    p.add_argument("--decode-batch", type=int, default=None,
                   help="micro-batch size for the shared decode dispatch "
                        "(engine.generate_batch); default 1")
    p.add_argument("--quantize", default=None,
                   help="weight-only LM quantization: int8, int4, or "
                        "int4:g<N> (grouped)")
    p.add_argument("--from-log", default=None,
                   help="re-score from previous sample logs instead of "
                        "running a model: comma-separated jsonl files or "
                        "directories (newest log wins per doc; lmms-eval "
                        "from_log parity)")
    p.add_argument("--speculative", type=int, default=None,
                   help="prompt-lookup speculative decoding: propose N "
                        "tokens per decode dispatch (greedy-identical "
                        "outputs); applies to unbatched decode")
    p.add_argument("--http-endpoint", default=None,
                   help="evaluate an OpenAI-compatible chat-completions "
                        "server instead of local weights (lmms-eval "
                        "openai_compatible parity): server root URL, e.g. "
                        "http://host:8000 — works against api.serve")
    p.add_argument("--http-model", default="default",
                   help="payload model field for --http-endpoint")
    p.add_argument("--http-concurrency", type=int, default=8)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.speculative:
        os.environ["VST_SPECULATIVE"] = str(args.speculative)
    if args.decode_batch:
        os.environ["VST_DECODE_BATCH"] = str(args.decode_batch)
        if args.decode_batch > 1:
            print(
                "[run_eval] WARNING: --decode-batch > 1 batches the greedy "
                "decode; on TPU bf16, batched matmul tiling can flip argmax "
                "on near-tied logits, so greedy outputs (and thus scores) "
                "may differ slightly from --decode-batch 1. Use 1 for "
                "bit-reproducible reference scores.",
                flush=True,
            )

    if args.task_config_dir:
        from visionselector_tpu.eval.tasks import load_task_configs

        registered = load_task_configs(args.task_config_dir)
        print(f"[run_eval] registered tasks: {registered}")

    if args.merge:
        import glob

        from visionselector_tpu.eval.evaluator import merge_results

        for budget in [float(b) for b in args.budgets.split(",")]:
            logs = sorted(glob.glob(os.path.join(
                args.output_dir, f"samples_{args.method}_{budget}_rank*.jsonl"
            )))
            if not logs:
                continue
            merged = merge_results(logs)
            out_path = os.path.join(
                args.output_dir, f"merged_{args.method}_{budget}.json"
            )
            with open(out_path, "w") as f:
                json.dump({"method": args.method, "budget": budget,
                           "results": merged, "ranks": len(logs)}, f, indent=2)
            print(json.dumps({"budget": budget, **merged}))
        return 0

    if args.from_log:
        from visionselector_tpu.eval.evaluator import evaluate
        from visionselector_tpu.eval.replay import ReplayAdapter

        adapter = ReplayAdapter(args.from_log)
        os.makedirs(args.output_dir, exist_ok=True)
        results = evaluate(
            adapter, args.tasks.split(","), args.data_dir, limit=args.limit,
            rank=args.rank, world_size=args.world_size,
        )
        out_path = os.path.join(args.output_dir, "from_log.json")
        with open(out_path, "w") as f:
            json.dump({"method": "from_log", "logs": args.from_log,
                       "results": results}, f, indent=2)
        print(json.dumps(results))
        return 0

    if args.http_endpoint:
        from visionselector_tpu.eval.evaluator import evaluate
        from visionselector_tpu.eval.http_adapter import OpenAICompatAdapter

        adapter = OpenAICompatAdapter(
            args.http_endpoint, model=args.http_model,
            concurrency=args.http_concurrency)
        os.makedirs(args.output_dir, exist_ok=True)
        results = evaluate(
            adapter, args.tasks.split(","), args.data_dir, limit=args.limit,
            rank=args.rank, world_size=args.world_size,
        )
        out_path = os.path.join(args.output_dir, "http_endpoint.json")
        with open(out_path, "w") as f:
            json.dump({"method": "http_endpoint",
                       "endpoint": args.http_endpoint,
                       "results": results}, f, indent=2)
        print(json.dumps(results))
        return 0

    import jax

    from visionselector_tpu.api.predict import load_tokenizer
    from visionselector_tpu.core.config import qwen25vl_tiny
    from visionselector_tpu.eval.evaluator import EngineAdapter, evaluate
    from visionselector_tpu.models.qwen25vl.model import QwenVLEngine, init_params

    tokenizer = None
    if args.family == "llava_ov15":
        from visionselector_tpu.models.llava_ov15.model import (
            OVEngine,
            init_ov_params,
        )

        if args.model_path:
            from visionselector_tpu.models.llava_ov15.weights import (
                load_ov_checkpoint,
                ov_config_from_hf,
            )

            cfg = ov_config_from_hf(args.model_path)
            params = load_ov_checkpoint(args.model_path, cfg)
            tokenizer = load_tokenizer(args.model_path)
        else:
            from visionselector_tpu.core.config import llava_ov_tiny

            cfg = llava_ov_tiny()
            params = init_ov_params(jax.random.PRNGKey(0), cfg)
    elif args.model_path:
        from visionselector_tpu.models.qwen25vl.weights import (
            config_from_hf,
            load_hf_checkpoint,
        )

        cfg = config_from_hf(args.model_path)
        params = load_hf_checkpoint(args.model_path, cfg)
        tokenizer = load_tokenizer(args.model_path)
    else:
        cfg = qwen25vl_tiny()
        params = init_params(jax.random.PRNGKey(0), cfg)
    if args.quantize:
        from visionselector_tpu.models.qwen25vl.lm import (
            apply_weight_quantization,
        )

        params = apply_weight_quantization(params, args.quantize)
    if tokenizer is None:
        class _IdTokenizer:  # smoke mode: ids-as-text
            def encode(self, s):
                return [abs(hash(w)) % 1000 + 600 for w in s.split()][:8]

            def decode(self, ids, skip_special_tokens=True):
                return " ".join(str(i) for i in ids)

        tokenizer = _IdTokenizer()

    os.makedirs(args.output_dir, exist_ok=True)
    tasks = args.tasks.split(",")
    strategy = None
    if args.method not in ("orig", "selector"):
        from visionselector_tpu.selector.baselines import get_baseline

        strategy = get_baseline(args.method)

    for budget in [float(b) for b in args.budgets.split(",")]:
        if args.family == "llava_ov15":
            engine = OVEngine(
                cfg, params, use_selector=(args.method == "selector"),
                budget=budget, strategy=strategy,
            )
        else:
            engine = QwenVLEngine(
                cfg, params,
                use_selector=(args.method == "selector"),
                budget=budget,
                strategy=strategy,
            )
        adapter = EngineAdapter(
            engine, tokenizer, visualize_dir=args.visualize_dir,
            model_tag=f"{args.family}:{args.model_path or 'smoke'}",
            min_pixels=args.min_pixels, max_pixels=args.max_pixels,
        )
        results = evaluate(
            adapter, tasks, args.data_dir, limit=args.limit,
            rank=args.rank, world_size=args.world_size,
            log_samples_path=os.path.join(
                args.output_dir,
                f"samples_{args.method}_{budget}_rank{args.rank}.jsonl",
            ),
        )
        out_path = os.path.join(
            args.output_dir, f"{args.method}_{budget}_rank{args.rank}.json"
        )
        with open(out_path, "w") as f:
            json.dump({"method": args.method, "budget": budget,
                       "results": results}, f, indent=2)
        # EvaluationTracker persistence (timestamped results + metadata)
        from visionselector_tpu.eval.tracker import EvaluationTracker

        tracker = EvaluationTracker(
            output_dir=os.path.join(args.output_dir, "tracker"),
            model_name=args.family,
            model_args=f"method={args.method},budget={budget},"
                       f"model_path={args.model_path}",
        )
        tracker.save_results_aggregated(
            results, config={"tasks": tasks, "limit": args.limit,
                             "rank": args.rank,
                             "world_size": args.world_size},
        )
        tracker.finish()
        print(json.dumps({"budget": budget, **results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
