"""Cross-revision score regression runner.

Parity with ``lmms-eval/tools/regression.py``: run a fixed task list with a
small ``--limit`` against multiple git refs (or the working tree) and diff the
scores — the cheap smoke-level accuracy regression the reference relies on
(SURVEY.md §4).

Usage:
    python -m visionselector_tpu.eval.regression \
        --data-dir eval_data --tasks chartqa --limit 8 \
        --refs HEAD~1,HEAD [--model-path /ckpt]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile


def run_eval_at_ref(ref: str | None, args) -> dict:
    """Run run_eval in a subprocess (optionally in a git worktree at ref)."""
    env = dict(os.environ)
    cwd = os.getcwd()
    tmp = None
    try:
        if ref is not None and ref != "WORKTREE":
            tmp = tempfile.mkdtemp(prefix=f"vst_reg_{ref.replace('/', '_')}_")
            subprocess.run(
                ["git", "worktree", "add", "--detach", tmp, ref],
                check=True, capture_output=True,
            )
            cwd = tmp
        out_dir = tempfile.mkdtemp(prefix="vst_reg_out_")
        cmd = [
            sys.executable, "-m", "visionselector_tpu.api.run_eval",
            "--data-dir", os.path.abspath(args.data_dir),
            "--tasks", args.tasks,
            "--method", args.method,
            "--budgets", str(args.budget),
            "--limit", str(args.limit),
            "--output-dir", out_dir,
        ]
        if args.model_path:
            cmd += ["--model-path", args.model_path]
        subprocess.run(cmd, check=True, cwd=cwd, env=env)
        with open(os.path.join(out_dir, f"{args.method}_{args.budget}_rank0.json")) as f:
            return json.load(f)["results"]
    finally:
        if tmp:
            subprocess.run(["git", "worktree", "remove", "--force", tmp],
                           capture_output=True)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--tasks", required=True)
    p.add_argument("--refs", default="WORKTREE",
                   help="comma-separated git refs; WORKTREE = current tree")
    p.add_argument("--method", default="selector")
    p.add_argument("--budget", type=float, default=0.2)
    p.add_argument("--limit", type=int, default=8)
    p.add_argument("--model-path", default=None)
    args = p.parse_args(argv)

    rows = {}
    for ref in args.refs.split(","):
        rows[ref] = run_eval_at_ref(ref if ref != "WORKTREE" else None, args)

    keys = sorted({k for r in rows.values() for k in r if "/" in k})
    print(f"{'metric':40s} " + " ".join(f"{r:>12s}" for r in rows))
    for k in keys:
        vals = [rows[r].get(k, float('nan')) for r in rows]
        drift = (max(vals) - min(vals)) if all(
            isinstance(v, (int, float)) for v in vals
        ) else 0
        flag = "  <-- drift" if drift > 1e-9 and k.split("/")[1] not in (
            "wall_s", "stderr") else ""
        print(f"{k:40s} " + " ".join(f"{v:12.4f}" for v in vals) + flag)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
