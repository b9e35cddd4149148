"""Tests for bench.py's contention hardening.

The driver captures BENCH_r{N}.json by running bench.py on a TIME-SHARED
v5e through a tunnel; a heavy co-tenant intermittently fails well-fitting
programs with RESOURCE_EXHAUSTED and stretches dispatch latency ~1000x
(observed: a warm 256x256 matmul at 265 s vs the normal ~50 ms). These
tests pin the retry/probe helpers that keep the capture honest instead of
crashing: retry only the co-tenant failure mode, propagate real bugs,
and always stamp the contention level measured under.
"""

import os
import sys
import time

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


class TestRetryContended:
    def test_retries_resource_exhausted_then_succeeds(self):
        calls = {"n": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise jax.errors.JaxRuntimeError(
                    "RESOURCE_EXHAUSTED: TPU backend error")
            return "done"

        assert bench._retry_contended(flaky, attempts=3,
                                      backoff_s=0.001) == "done"
        assert calls["n"] == 3

    def test_reraises_after_final_attempt(self):
        def always():
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: TPU backend error")

        with pytest.raises(jax.errors.JaxRuntimeError,
                           match="RESOURCE_EXHAUSTED"):
            bench._retry_contended(always, attempts=2, backoff_s=0.001)

    def test_non_contention_error_propagates_immediately(self):
        calls = {"n": 0}

        def bug():
            calls["n"] += 1
            raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: real bug")

        with pytest.raises(jax.errors.JaxRuntimeError,
                           match="INVALID_ARGUMENT"):
            bench._retry_contended(bug, attempts=3, backoff_s=0.001)
        assert calls["n"] == 1  # no retry for non-RESOURCE_EXHAUSTED


class TestContentionProbe:
    def test_probe_returns_small_positive_seconds(self):
        s = bench._contention_probe_s()
        assert 0 < s < 5.0  # warm tiny matmul on the CPU test backend

    def test_wait_for_quiet_returns_fast_when_quiet(self):
        t0 = time.monotonic()
        s = bench._wait_for_quiet(max_wait_s=2.0, busy_threshold_s=5.0)
        assert s < 5.0
        assert time.monotonic() - t0 < 2.5  # no pointless sleeping
