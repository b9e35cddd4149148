"""Selector evaluation driver (reference entry-point parity:
``qwen-evaluation/run_selector.sh`` — the paper image suite at retention
budgets 0.1/0.2/0.3 with EVAL_TIME probes).

Usage:
    python -m visionselector_tpu.api.run_selector \
        --model-path /ckpt --data-dir eval_data [--tasks ...] [--budgets ...]
"""

from __future__ import annotations

import sys

PAPER_TASKS = ("docvqa_val,chartqa,textvqa_val,ocrbench,scienceqa_img,"
               "ai2d_no_mask,mmmu_val,mme,pope")


def main(argv=None) -> int:
    from visionselector_tpu.api.run_eval import build_parser
    from visionselector_tpu.api.run_eval import main as run_eval_main

    argv = list(sys.argv[1:] if argv is None else argv)
    if not any(a.startswith("--tasks") for a in argv):
        argv += ["--tasks", PAPER_TASKS]
    if not any(a.startswith("--budgets") for a in argv):
        argv += ["--budgets", "0.1,0.2,0.3"]
    argv += ["--method", "selector"]
    build_parser()  # validate import
    return run_eval_main(argv)


if __name__ == "__main__":
    raise SystemExit(main())
