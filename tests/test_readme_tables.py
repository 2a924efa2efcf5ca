"""README perf rows must be reproducible from the committed JSON
artifacts (r03+r04 verdicts both caught hand-copied numbers drifting
from the driver captures)."""

import subprocess
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_perf_tables_match_artifacts():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "gen_perf_tables.py"),
         "--check"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
