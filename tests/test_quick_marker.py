"""Guard for the ``-m quick`` subset: every curated node id in
``conftest.QUICK_TESTS`` must still exist, so a test rename cannot silently
shrink the quick subset's subsystem coverage."""

import os
import subprocess
import sys

from conftest import QUICK_TESTS

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestQuickMarker:
    def test_every_quick_fragment_matches_a_collected_test(self):
        out = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "--collect-only",
             "-q", "-m", "quick", "-p", "no:cacheprovider"],
            capture_output=True, text=True, cwd=REPO, timeout=300,
        )
        collected = {
            line.split("/", 1)[-1]
            for line in out.stdout.splitlines()
            if "::" in line
        }
        missing = sorted(set(QUICK_TESTS) - collected)
        assert not missing, (
            f"QUICK_TESTS entries no longer collected (renamed?): {missing}"
        )
        assert len(collected) >= 55, (
            f"quick subset unexpectedly small: {len(collected)}"
        )
