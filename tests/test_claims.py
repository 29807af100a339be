"""Perf claims in README/CLAUDE must match their cited artifacts (r03 #7)."""

import subprocess
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_perf_claims_match_artifacts():
    r = subprocess.run([sys.executable, os.path.join(ROOT, "tools",
                                                     "check_claims.py")],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "verified" in r.stdout
