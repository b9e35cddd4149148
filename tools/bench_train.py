"""Selector-training step benchmark: host/device overlap attribution.

The reference trains with torch DataLoader workers overlapping host data
work with the GPU step (``sft_3b.sh --dataloader_num_workers 4``). This
tool measures our equivalent on one chip:

  - host batch-build ms   (PIL-scale synthetic image -> patchify -> pack)
  - device train-step ms  (differential, compile excluded)
  - end-to-end loop throughput, per-step-blocking loop vs the
    ``--prefetch`` background-thread loop (``train/prefetch.py``)

Usage: python tools/bench_train.py [n_steps] [--smoke] [--no-remat]
Smoke mode uses the tiny config so the tool runs on CPU in seconds.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VST_ATTN_IMPL", "auto")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    argv = [a for a in sys.argv[1:]]
    smoke = "--smoke" in argv
    remat = "--no-remat" not in argv
    pos = [a for a in argv if not a.startswith("--")]
    n_steps = int(pos[0]) if pos else 8

    from visionselector_tpu.core.config import qwen25vl_3b, qwen25vl_tiny
    from visionselector_tpu.models.qwen25vl.model import init_params
    from visionselector_tpu.train.data import build_train_sample, stack_samples
    from visionselector_tpu.train.prefetch import BatchPrefetcher
    from visionselector_tpu.train.train_step import (
        ScheduleConfig,
        init_train_state,
        train_step,
    )

    if smoke:
        cfg = qwen25vl_tiny()
        s_bucket, t_bucket, img_hw, ans = 128, 128, (56, 56), 8
    else:
        cfg = qwen25vl_3b()
        # bench.py's ChartQA-scale image: 5180 patches -> 5632 bucket,
        # 1260 merged vision tokens + ~40-token prompt + 64-token answer
        s_bucket, t_bucket, img_hw, ans = 5632, 1536, (1036, 1456), 64
    cfg = cfg.with_selector(0.2)
    k_max = max(1, int(s_bucket // cfg.vision.spatial_merge_unit * 0.2))
    sched = ScheduleConfig(total_steps=1000, remat=remat)

    params = jax.jit(lambda k: init_params(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    state = init_train_state(params, sched)
    frozen = {k: v for k, v in params.items() if k != "scorer"}

    rng = np.random.RandomState(0)
    img = (rng.rand(*img_hw, 3) * 255).astype(np.uint8)
    prompt_before = list(rng.randint(5, 1000, size=24))
    prompt_after = list(rng.randint(5, 1000, size=16))

    def host_build():
        """numpy-only batch build — smoke keeps the tiny image unresized;
        real mode uses the reference pixel budget (-> 5180 patches for the
        1036x1456 image, bench.py's ChartQA-scale prompt)."""
        answer = list(rng.randint(5, 1000, size=ans))
        px = (dict(min_pixels=1, max_pixels=10**9) if smoke
              else dict(min_pixels=56 * 56, max_pixels=28 * 28 * 1280))
        return stack_samples([build_train_sample(
            cfg, img, prompt_before, prompt_after, answer,
            budget=0.2, s_bucket=s_bucket, t_bucket=t_bucket, **px)])

    def make_batch():
        return jax.tree.map(jnp.asarray, host_build())

    # --- host build cost (numpy-only; the H2D transfer is async and is
    # what the prefetch loop overlaps with compute) ---

    host_build()  # warm caches
    t0 = time.perf_counter()
    for _ in range(4):
        host_build()
    host_ms = (time.perf_counter() - t0) / 4 * 1e3

    # --- device step cost: differential chained timing (block_until_ready
    # does not reliably block through the device tunnel — same protocol as
    # bench.py / tools/bench_lm.py: force a scalar fetch, subtract the
    # 1-step arm from the k-step arm) ---
    batch = make_batch()

    def run_steps(n):
        s, m = state, None
        for _ in range(n):
            s, m = train_step(s, frozen, batch, cfg, k_max, sched)
        return float(m["loss"])

    run_steps(1)  # compile
    t0 = time.perf_counter(); run_steps(1); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run_steps(5); tk = time.perf_counter() - t0
    step_ms = (tk - t1) / 4 * 1e3

    def run_loop(prefetch: int):
        nonlocal state
        it = BatchPrefetcher(make_batch, prefetch) if prefetch else None
        t0 = time.perf_counter()
        for _ in range(n_steps):
            b = next(it) if it else make_batch()
            state, m = train_step(state, frozen, b, cfg, k_max, sched)
            if not prefetch:
                # the pre-prefetch loop synced every iteration (reading
                # state.step in the while condition); reproduce it
                float(m["loss"])
        float(m["loss"])
        dt = time.perf_counter() - t0
        if it:
            it.close()
        return dt / n_steps * 1e3

    sync_ms = run_loop(0)
    pf_ms = run_loop(2)

    print(json.dumps({
        "model": "tiny" if smoke else "qwen2.5-vl-3b",
        "platform": jax.devices()[0].platform,
        "s_bucket": s_bucket, "t_bucket": t_bucket, "remat": remat,
        "host_build_ms": round(host_ms, 2),
        "device_step_ms": round(step_ms, 2),
        "loop_ms_blocking": round(sync_ms, 2),
        "loop_ms_prefetch2": round(pf_ms, 2),
        "overlap_speedup": round(sync_ms / pf_ms, 3),
    }))


if __name__ == "__main__":
    main()
