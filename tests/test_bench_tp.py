"""Smoke test for the TP perf harness (tools/bench_tp.py): runs on the
8-virtual-device CPU mesh so the tool is validated today and ready for a real
multi-chip environment (VERDICT r2 item 7; SURVEY §2.9 TP row)."""

import json
import os
import sys

import numpy as np


class TestBenchTPSmoke:
    def test_tiny_tp2_runs_and_reports(self, capsys):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        import bench_tp

        # conftest already provides 8 virtual CPU devices; --virtual 0 uses
        # them directly (the flag only matters for standalone invocation).
        rc = bench_tp.main(["--preset", "tiny", "--n-model", "2"])
        assert rc == 0
        line = capsys.readouterr().out.strip().splitlines()[-1]
        rec = json.loads(line)
        assert rec["metric"] == "tp_prefill_speedup_at_20pct_retention"
        assert np.isfinite(rec["value"]) and rec["value"] > 0
        assert rec["detail"]["model"].endswith("TP=2")

    def test_sharded_init_places_model_axis(self):
        import jax

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        import bench_tp
        from visionselector_tpu.core.config import qwen25vl_tiny
        from visionselector_tpu.core.mesh import make_mesh

        cfg = qwen25vl_tiny()
        mesh = make_mesh(n_data=1, n_model=2, devices=jax.devices()[:2])
        params = bench_tp.init_sharded(cfg, mesh)
        # at least one large matrix must actually be model-sharded
        specs = jax.tree.leaves(jax.tree.map(
            lambda l: "model" in str(getattr(l, "sharding", "")), params))
        assert any(specs)
