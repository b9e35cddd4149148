"""Orbax checkpointing: training state save/auto-resume.

Replaces the reference's HF-Trainer + DeepSpeed checkpoint machinery
(``train_qwen_selector.py:112-124, 265-269`` — auto-resume when
``checkpoint-*`` exists, consolidated save) with orbax:

- ``save_train_state`` / ``restore_train_state``: scorer params + optimizer
  state + step under ``<dir>/checkpoint-<step>``.
- ``latest_checkpoint``: reference-compatible auto-resume discovery.
- the trained scorer can additionally be exported to the reference's HF layout
  via ``models.qwen25vl.weights.export_scorer_to_safetensors`` so reference
  eval stacks can consume it.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import orbax.checkpoint as ocp


def _ckpt_dir(output_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(output_dir), f"checkpoint-{step}")


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Highest-step ``checkpoint-*`` subdir, or None."""
    if not os.path.isdir(output_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(output_dir, name)
    return os.path.abspath(best) if best else None


def save_train_state(state, output_dir: str, step: Optional[int] = None,
                     keep: int = 1) -> str:
    """Save (scorer_params, opt_state, step); prune old checkpoints."""
    step = int(state.step) if step is None else step
    path = _ckpt_dir(output_dir, step)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    # save_total_limit-style pruning (reference: save_total_limit 1)
    if keep is not None:
        import shutil

        steps = sorted(
            int(re.fullmatch(r"checkpoint-(\d+)", n).group(1))
            for n in os.listdir(output_dir)
            if re.fullmatch(r"checkpoint-(\d+)", n)
        )
        for s in steps[:-keep]:
            shutil.rmtree(_ckpt_dir(output_dir, s), ignore_errors=True)
    return path


def restore_train_state(path: str, template):
    """Restore into the structure/shardings of ``template``."""
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


def maybe_resume(output_dir: str, template):
    """Auto-resume: returns (state, resumed: bool)."""
    path = latest_checkpoint(output_dir)
    if path is None:
        return template, False
    return restore_train_state(path, template), True
