"""Real-checkpoint smoke fixture: record/verify greedy transcripts.

The accuracy north star (BASELINE.json) is matching HF-reference behavior on
real checkpoints, but no weights exist in the build environment — so this tool
makes the *first* environment that has weights immediately validate the stack
(reference flow: ``qwen-evaluation/predict.py:83-169`` single-sample check):

    # once, on a trusted setup (records greedy tokens + selected indices)
    python -m visionselector_tpu.api.verify_checkpoint --model-path /ckpt \\
        --image chart.png --record transcript.json

    # afterwards / elsewhere (re-runs and diffs; non-zero exit on mismatch)
    python -m visionselector_tpu.api.verify_checkpoint --model-path /ckpt \\
        --image chart.png --verify transcript.json

Greedy decoding + deterministic preprocessing make the token sequence a
bit-stable fingerprint of (weights x pipeline); selected indices additionally
pin the selector math (BASELINE demands bit-faithful selected indices).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-path", default=None,
                   help="HF checkpoint dir; omitted = tiny smoke config")
    p.add_argument("--image", default=None,
                   help="image path; omitted = deterministic synthetic image")
    p.add_argument("--prompt", default="Describe this image.")
    p.add_argument("--method", default="selector")
    p.add_argument("--family", default="qwen25vl",
                   choices=("qwen25vl", "llava_ov15"))
    p.add_argument("--budget", type=float, default=0.2)
    p.add_argument("--max-new-tokens", type=int, default=32)
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--record", metavar="PATH",
                   help="write the transcript json")
    g.add_argument("--verify", metavar="PATH",
                   help="diff against a recorded transcript")
    return p


def _run(args) -> dict:
    """One greedy generation via the predict CLI plumbing; returns the
    transcript payload."""
    import io
    from contextlib import redirect_stdout

    from visionselector_tpu.api import predict

    argv = ["--method", args.method, "--family", args.family,
            "--budget", str(args.budget),
            "--max-new-tokens", str(args.max_new_tokens),
            "--prompt", args.prompt, "--temperature", "0.0"]
    if args.model_path:
        argv += ["--model-path", args.model_path]
    if args.image:
        argv += ["--image", args.image]
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = predict.main(argv)
    assert rc == 0
    out = json.loads(buf.getvalue().strip().splitlines()[-1])

    img_sha = None
    if args.image:
        with open(args.image, "rb") as f:
            img_sha = hashlib.sha256(f.read()).hexdigest()
    return {
        "model_path": args.model_path,
        "family": args.family,
        "method": args.method,
        "budget": args.budget,
        "prompt": args.prompt,
        "image_sha256": img_sha,
        "tokens": out["tokens"],
        "text": out.get("text"),
        "num_vision_tokens": out["num_vision_tokens"],
        "kept_vision_tokens": out["kept_vision_tokens"],
    }


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    got = _run(args)

    if args.record:
        with open(args.record, "w") as f:
            json.dump(got, f, indent=2)
        print(f"[verify_checkpoint] recorded {len(got['tokens'])} tokens "
              f"-> {args.record}")
        return 0

    with open(args.verify) as f:
        want = json.load(f)
    problems = []
    for key in ("prompt", "method", "budget", "image_sha256"):
        if want.get(key) != got.get(key):
            problems.append(
                f"setup mismatch {key}: recorded={want.get(key)!r} "
                f"now={got.get(key)!r}"
            )
    for key in ("tokens", "num_vision_tokens", "kept_vision_tokens"):
        if want.get(key) != got.get(key):
            problems.append(
                f"OUTPUT mismatch {key}: recorded={want.get(key)!r} "
                f"now={got.get(key)!r}"
            )
    if problems:
        for msg in problems:
            print(f"[verify_checkpoint] {msg}", file=sys.stderr)
        return 1
    print(f"[verify_checkpoint] OK: {len(got['tokens'])} greedy tokens match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
