"""One-command real-checkpoint acceptance: the first thing to run in a
weights-capable environment.

The build environment has no real weights, so the accuracy axis
(BASELINE.json: match HF-reference behavior, bit-faithful selected indices —
``qwen-evaluation/token_compression/selector_model.py:187-188``) is pinned by
oracle tests only. This chains the readiness checks against an actual
checkpoint:

1. **transcript** — record + immediately re-verify a greedy transcript
   (``api/verify_checkpoint``): generation on this checkpoint is
   deterministic end-to-end (tokens, vision-token counts).
2. **golden_indices** — the engine's selected indices equal
   ``sort(argsort(-scores)[:k])`` of its own reported scores (the
   reference's topk contract).
3. **regression8** — optional (``--data-dir`` + ``--tasks``): an 8-sample
   ``run_eval`` per task, recording scores for cross-revision comparison
   (``eval/regression.py`` consumes the same output).

Usage:
    python -m visionselector_tpu.api.acceptance --model-path /ckpt \
        [--family qwen25vl] [--budget 0.2] [--image chart.png] \
        [--data-dir EVAL_DATA --tasks chartqa,docvqa_val]

Exit 0 = all steps passed. Without ``--model-path`` it runs the tiny random
config (CPU smoke of the script itself).
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-path", default=None)
    p.add_argument("--family", default="qwen25vl",
                   choices=("qwen25vl", "llava_ov15"))
    p.add_argument("--budget", type=float, default=0.2)
    p.add_argument("--image", default=None)
    p.add_argument("--prompt", default="Describe this image.")
    p.add_argument("--max-new-tokens", type=int, default=32)
    p.add_argument("--data-dir", default=None,
                   help="eval jsonl dir (eval.export_tasks output) for the "
                        "8-sample regression step")
    p.add_argument("--tasks", default=None,
                   help="comma list for the regression step")
    p.add_argument("--limit", type=int, default=8)
    return p


def step_transcript(args) -> dict:
    from visionselector_tpu.api import verify_checkpoint

    base = ["--family", args.family, "--budget", str(args.budget),
            "--prompt", args.prompt,
            "--max-new-tokens", str(args.max_new_tokens)]
    if args.model_path:
        base += ["--model-path", args.model_path]
    if args.image:
        base += ["--image", args.image]
    with tempfile.TemporaryDirectory(prefix="vst_accept_") as tmp:
        rec = os.path.join(tmp, "transcript.json")
        rc = verify_checkpoint.main(base + ["--record", rec])
        if rc != 0:
            return {"ok": False, "error": f"record failed rc={rc}"}
        rc = verify_checkpoint.main(base + ["--verify", rec])
        with open(rec) as f:
            tokens = json.load(f)["tokens"]
    return {"ok": rc == 0, "tokens": len(tokens)}


def step_golden_indices(args) -> dict:
    import numpy as np

    import jax

    from visionselector_tpu.preprocess.image import preprocess_image
    from visionselector_tpu.preprocess.rope import expand_vision_tokens

    if args.family == "llava_ov15":
        from visionselector_tpu.models.llava_ov15.model import OVEngine

        if args.model_path:
            from visionselector_tpu.models.llava_ov15.weights import (
                load_ov_checkpoint,
                ov_config_from_hf,
            )

            cfg = ov_config_from_hf(args.model_path)
            params = load_ov_checkpoint(args.model_path, cfg)
        else:
            from visionselector_tpu.core.config import llava_ov_tiny
            from visionselector_tpu.models.llava_ov15.model import (
                init_ov_params,
            )

            cfg = llava_ov_tiny()
            params = init_ov_params(jax.random.PRNGKey(0), cfg)
        engine = OVEngine(cfg, params, use_selector=True,
                          budget=args.budget)
    else:
        from visionselector_tpu.models.qwen25vl.model import QwenVLEngine

        if args.model_path:
            from visionselector_tpu.models.qwen25vl.weights import (
                config_from_hf,
                load_hf_checkpoint,
            )

            cfg = config_from_hf(args.model_path)
            params = load_hf_checkpoint(args.model_path, cfg)
        else:
            from visionselector_tpu.core.config import qwen25vl_tiny
            from visionselector_tpu.models.qwen25vl.model import init_params

            cfg = qwen25vl_tiny()
            params = init_params(jax.random.PRNGKey(0), cfg)
        engine = QwenVLEngine(cfg, params, use_selector=True,
                              budget=args.budget)

    if args.image:
        from PIL import Image

        img = Image.open(args.image)
    else:
        img = (np.random.RandomState(0).rand(112, 112, 3) * 255
               ).astype(np.uint8)
    pixels, grid = preprocess_image(
        img, min_pixels=1, max_pixels=10**9,
        temporal_patch_size=cfg.vision.temporal_patch_size)
    ids = expand_vision_tokens(
        [100, 200], [300, 400], grid,
        spatial_merge_size=cfg.vision.spatial_merge_size,
        image_token_id=cfg.image_token_id,
        vision_start_token_id=cfg.vision_start_token_id,
        vision_end_token_id=cfg.vision_end_token_id)
    res = engine.generate(ids, pixels, grid, max_new_tokens=2)
    scores = np.asarray(res.scores)
    n = res.num_vision_tokens
    k = len(res.selected_indices)
    want = np.sort(np.argsort(-scores[:n], kind="stable")[:k])
    got = np.sort(np.asarray(res.selected_indices))
    ok = bool(np.array_equal(want, got))
    out = {"ok": ok, "kept": int(k), "vision_tokens": int(n)}
    if not ok:
        out["mismatches"] = int((want != got).sum())
    return out


def step_regression(args) -> dict:
    # In-process (not a subprocess): the acceptance run and its eval share
    # one backend/engine context, and the caller's platform override (test
    # conftest, production env) applies.
    from visionselector_tpu.api.run_eval import main as run_eval_main

    results = {}
    ok = True
    for task in args.tasks.split(","):
        with tempfile.TemporaryDirectory(
                prefix=f"vst_accept_{task}_") as out_dir:
            argv = ["--data-dir", args.data_dir, "--tasks", task,
                    "--method", "selector", "--budgets", str(args.budget),
                    "--limit", str(args.limit), "--output-dir", out_dir]
            if args.model_path:
                argv += ["--model-path", args.model_path]
            if args.family != "qwen25vl":
                argv += ["--family", args.family]
            try:
                rc = run_eval_main(argv)
            except Exception as e:  # noqa: BLE001
                ok = False
                results[task] = {"error": repr(e)}
                continue
            if rc != 0:
                ok = False
                results[task] = {"error": f"run_eval rc={rc}"}
                continue
            with open(os.path.join(
                    out_dir, f"selector_{args.budget}_rank0.json")) as f:
                results[task] = json.load(f)["results"]
    return {"ok": ok, "scores": results}


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    steps = [("transcript", step_transcript),
             ("golden_indices", step_golden_indices)]
    if args.data_dir and args.tasks:
        steps.append(("regression8", step_regression))
    failed = False
    for name, fn in steps:
        try:
            res = fn(args)
        except Exception as e:  # noqa: BLE001 — report, keep going
            res = {"ok": False, "error": repr(e)}
        failed = failed or not res.get("ok")
        print(json.dumps({"step": name, **res}), flush=True)
    print(json.dumps({"acceptance": "PASS" if not failed else "FAIL",
                      "model_path": args.model_path}), flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
