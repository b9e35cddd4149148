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


# One async checkpointer for the process: orbax snapshots device arrays,
# then serializes on background threads while training continues — the HF
# Trainer analog is synchronous, so this is strictly better wall-clock at
# the same save contract. At most one save is in flight (the next save —
# or finalize_saves() — waits for the previous one first).
_ASYNC_CKPTR: Optional["ocp.AsyncCheckpointer"] = None


def _async_ckptr() -> "ocp.AsyncCheckpointer":
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def finalize_saves() -> None:
    """Block until any in-flight async save has committed to disk.

    Call before reading the checkpoint back, exporting, or exiting."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_train_state(state, output_dir: str, step: Optional[int] = None,
                     keep: int = 1, async_save: bool = False) -> str:
    """Save (scorer_params, opt_state, step); prune old checkpoints.

    ``async_save``: return as soon as the state is snapshotted; the write
    happens on orbax's background threads (``finalize_saves()`` to join).
    Pruning runs at entry — after the PREVIOUS save has committed and
    before the new write is scheduled — and keeps the newest ``keep``
    committed checkpoints. The new (in-flight) directory is extra, so
    there is never a moment with zero restorable checkpoints: if the
    process dies mid-commit, the previous ``keep`` directories are intact
    (the un-finalized tmp dir is ignored by ``latest_checkpoint``). Cost:
    between commits the directory holds up to ``keep`` + 1 checkpoints;
    the next save (or a final sync save) prunes back to ``keep``."""
    step = int(state.step) if step is None else step
    path = _ckpt_dir(output_dir, step)

    def prune(keep_n: int):
        if keep_n is None:
            return
        # keep<1 would delete every committed checkpoint (steps[:len-0] is
        # the whole list, unlike the old [:-0] no-op slice); a retention
        # limit below one restorable checkpoint is never what the caller
        # wants, so clamp it.
        keep_n = max(1, keep_n)
        import shutil

        steps = sorted(
            int(re.fullmatch(r"checkpoint-(\d+)", n).group(1))
            for n in os.listdir(output_dir)
            if re.fullmatch(r"checkpoint-(\d+)", n)
        )
        for s in steps[:len(steps) - keep_n]:
            if s != step:
                shutil.rmtree(_ckpt_dir(output_dir, s), ignore_errors=True)

    if async_save:
        ckptr = _async_ckptr()
        ckptr.wait_until_finished()  # at most one save in flight
        os.makedirs(output_dir, exist_ok=True)
        # keep=None means unlimited, exactly like the sync path
        prune(keep)
        ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
        return path
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    # save_total_limit-style pruning (reference: save_total_limit 1)
    prune(keep)
    return path


def restore_train_state(path: str, template):
    """Restore into the structure/shardings of ``template``."""
    finalize_saves()  # never read a checkpoint mid-commit
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


def maybe_resume(output_dir: str, template):
    """Auto-resume: returns (state, resumed: bool)."""
    path = latest_checkpoint(output_dir)
    if path is None:
        return template, False
    return restore_train_state(path, template), True
