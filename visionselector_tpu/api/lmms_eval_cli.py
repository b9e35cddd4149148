"""lmms-eval-style CLI front end (reference invocation parity:
``lmms-eval/lmms_eval/__main__.py:84-271`` — ``python -m lmms_eval --model
<name> --model_args key=val,... --tasks a,b --limit N``).

Translates the reference's argument surface onto ``api.run_eval`` so shell
scripts written against the reference (``qwen-evaluation/run_selector.sh``)
port by changing only the module name:

    python -m visionselector_tpu.api.lmms_eval_cli \\
        --model qwen2_5_vl_with_token_compression \\
        --model_args pretrained=/ckpt,method=selector,budgets=0.2 \\
        --tasks chartqa,textvqa_val --batch_size 1 \\
        --limit 8 --output_path results/ --log_samples
"""

from __future__ import annotations

import argparse
import os

# reference adapter names -> our model families
MODEL_FAMILIES = {
    "qwen2_5_vl_with_token_compression": "qwen25vl",
    "qwen2_5_vl_with_token_compression_visual": "qwen25vl",
    "qwen2_5_vl": "qwen25vl",
    "llava_onevision1_5_with_token_compression": "llava_ov15",
    "llava_onevision1_5": "llava_ov15",
    # replay model: scores from previous sample logs, no checkpoint
    # (lmms-eval/lmms_eval/models/from_log.py)
    "from_log": None,
    # API model: any OpenAI-compatible chat-completions server
    # (lmms-eval/lmms_eval/models/openai_compatible.py)
    "openai_compatible": None,
}


def parse_model_args(s: str) -> dict:
    """Comma-separated key=value string (``simple_evaluate`` model_args).

    Comma-separated VALUES (``budgets=0.1,0.2,0.3``) are supported: an item
    without ``=`` continues the previous key's value."""
    out = {}
    last = None
    for item in (s or "").split(","):
        if not item.strip():
            continue
        if "=" not in item and last is not None:
            out[last] += "," + item.strip()
            continue
        k, _, v = item.partition("=")
        out[k.strip()] = v.strip()
        last = k.strip()
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--model_args", default="")
    p.add_argument("--tasks", required=True)
    p.add_argument("--batch_size", default="1",
                   help="prefill stays batch-1 (reference parity); "
                        "values > 1 enable decode micro-batching")
    p.add_argument("--limit", type=float, default=None)
    p.add_argument("--output_path", default="eval_results")
    p.add_argument("--log_samples", action="store_true")
    p.add_argument("--log_samples_suffix", default="")
    p.add_argument("--data_dir", default=None,
                   help="local jsonl dataset dir (no hub access here)")
    args = p.parse_args(argv)

    if args.model not in MODEL_FAMILIES:
        raise SystemExit(
            f"unknown --model {args.model!r}; have {sorted(MODEL_FAMILIES)}"
        )
    ma = parse_model_args(args.model_args)
    if args.model == "from_log":
        logs = ma.get("logs")
        data_dir = args.data_dir or ma.get("data_dir")
        if not logs or not data_dir:
            raise SystemExit("from_log needs model_args logs=<paths> and "
                             "--data_dir (reference: from_log.py:19)")
        from visionselector_tpu.api.run_eval import main as run_eval_main

        return run_eval_main([
            "--from-log", logs, "--data-dir", data_dir,
            "--tasks", args.tasks, "--output-dir", args.output_path,
        ] + (["--limit", str(args.limit)] if args.limit is not None else []))
    if args.model == "openai_compatible":
        base_url = ma.get("base_url")
        data_dir = args.data_dir or ma.get("data_dir")
        if not base_url or not data_dir:
            raise SystemExit(
                "openai_compatible needs model_args base_url=<url> and "
                "--data_dir (reference: openai_compatible.py)")
        from visionselector_tpu.api.run_eval import main as run_eval_main

        return run_eval_main([
            "--http-endpoint", base_url, "--data-dir", data_dir,
            "--tasks", args.tasks, "--output-dir", args.output_path,
            "--http-model", ma.get("model", "default"),
        ] + (["--limit", str(args.limit)] if args.limit is not None
             else []))
    family = MODEL_FAMILIES[args.model]
    method = ma.get("method", "orig")
    budgets = ma.get("budgets", ma.get("budget", "0.2"))
    model_path = ma.get("pretrained", ma.get("model_path"))
    data_dir = args.data_dir or ma.get("data_dir")
    if data_dir is None:
        raise SystemExit("--data_dir (or model_args data_dir=) is required: "
                         "datasets are local jsonl files in this framework")

    try:
        if int(args.batch_size) > 1:
            os.environ["VST_DECODE_BATCH"] = str(int(args.batch_size))
    except (TypeError, ValueError):
        pass
    from visionselector_tpu.api.run_eval import main as run_eval_main

    argv2 = [
        "--data-dir", data_dir,
        "--tasks", args.tasks,
        "--method", method,
        "--family", family,
        "--budgets", budgets,
        "--output-dir", args.output_path,
    ]
    if model_path:
        argv2 += ["--model-path", model_path]
    for k in ("min_pixels", "max_pixels"):
        if k in ma:
            argv2 += [f"--{k.replace('_', '-')}", str(ma[k])]
    if args.limit is not None:
        # lmms-eval semantics: limit < 1 = fraction of docs, >= 1 = count
        argv2 += ["--limit", str(args.limit)]
    return run_eval_main(argv2)


if __name__ == "__main__":
    raise SystemExit(main())
