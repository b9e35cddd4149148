"""Tensor-parallel prefill benchmark: bf16 model sharded over N chips.

The headline single-chip 7B measurement uses int8 weight-only quantization
(bf16 7B does not fit one 16 GB v5e). This tool is the bf16 counterpart: it
shards the model over ``--n-model`` devices with the production
``param_sharding_rules`` (core/mesh.py) and measures the same
selector-vs-uncompressed prefill ratio as bench.py — ready to run the moment
a multi-chip environment exists (SURVEY §2.9 TP row; the reference's 1.73x
headline is an 8-GPU-replica bf16 figure, README.md:47).

Usage:
    python tools/bench_tp.py --preset 7b --n-model 2        # 2 real chips
    python tools/bench_tp.py --preset tiny --virtual 8      # CPU smoke

Prints ONE JSON line:
    {"metric": "tp_prefill_speedup_at_20pct_retention", "value": N, ...}
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("VST_ATTN_IMPL", "auto")


def init_sharded(cfg, mesh):
    """Initialize params directly into their TP shards (each device only
    materializes its slice — required for bf16 7B on 16 GB chips)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from visionselector_tpu.core.mesh import param_sharding_rules
    from visionselector_tpu.models.qwen25vl.model import init_params

    n_model = mesh.shape["model"]
    abstract = jax.eval_shape(lambda k: init_params(k, cfg),
                              jax.random.PRNGKey(0))

    def place(path, leaf):
        spec = param_sharding_rules(
            tuple(getattr(x, "key", getattr(x, "idx", x)) for x in path),
            leaf,
        )
        for i, s in enumerate(spec):
            if s == "model" and leaf.shape[i] % n_model != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    shardings = jax.tree_util.tree_map_with_path(place, abstract)
    init = jax.jit(lambda k: init_params(k, cfg), out_shardings=shardings)
    return init(jax.random.PRNGKey(0))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-model", type=int, default=2,
                    help="model-axis (TP) width")
    ap.add_argument("--preset", default="7b", choices=("tiny", "3b", "7b"))
    ap.add_argument("--budget", type=float, default=0.2)
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (smoke test on a "
                         "single-host/no-TPU environment)")
    args = ap.parse_args(argv)

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    import bench
    from visionselector_tpu.core.config import (
        qwen25vl_3b,
        qwen25vl_7b,
        qwen25vl_tiny,
    )
    from visionselector_tpu.core.mesh import make_mesh

    if args.preset == "tiny":
        cfg, s_bucket, img_hw = qwen25vl_tiny(), 1024, (252, 364)
    elif args.preset == "3b":
        cfg, s_bucket, img_hw = qwen25vl_3b(), 5632, (1036, 1456)
    else:
        cfg, s_bucket, img_hw = qwen25vl_7b(), 5632, (1036, 1456)

    devices = jax.devices()
    assert len(devices) >= args.n_model, (
        f"need {args.n_model} devices, have {len(devices)}"
    )
    mesh = make_mesh(n_data=1, n_model=args.n_model,
                     devices=devices[: args.n_model])
    params = init_sharded(cfg, mesh)
    jax.block_until_ready(params)

    t_sel, t_full, n, check = bench.measure(cfg, params, args.budget,
                                            s_bucket, img_hw)
    speedup = t_full / t_sel
    print(json.dumps({
        "metric": "tp_prefill_speedup_at_20pct_retention",
        "value": round(speedup, 4),
        "unit": "x",
        "vs_baseline": round(speedup / bench.BASELINE_SPEEDUP, 4),
        "suspect": bool(check.get("suspect", False)),
        "detail": {
            **check,
            "model": f"qwen2.5-vl-{args.preset} bf16, TP={args.n_model}",
            "prefill_ms_selector": round(t_sel * 1e3, 2),
            "prefill_ms_uncompressed": round(t_full * 1e3, 2),
            "vision_tokens": int(n),
            "budget": args.budget,
            "platform": devices[0].platform,
            "virtual": bool(args.virtual),
        },
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
