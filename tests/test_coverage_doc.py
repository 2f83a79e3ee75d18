"""Evidence hygiene: COVERAGE.md's test count must match reality.

Rounds 1 and 2 both caught the documented count drifting from the collected
count. The count is now generated (scripts/update_coverage_count.py); this
test makes drift a CI failure instead of a review finding.
"""

import re
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_coverage_md_test_count_matches_collection():
    text = (REPO / "COVERAGE.md").read_text()
    claims = re.findall(r"(\d+) tests, `pytest --collect-only`", text)
    assert claims, "COVERAGE.md lost its generated test-count pattern"

    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
         "-p", "no:cacheprovider"],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    m = re.search(r"(\d+) tests collected", out.stdout)
    assert m, f"collection failed:\n{out.stdout[-2000:]}\n{out.stderr[-1000:]}"
    actual = int(m.group(1))
    for claim in claims:
        assert int(claim) == actual, (
            f"COVERAGE.md claims {claim} tests but pytest collects {actual}; "
            "run scripts/update_coverage_count.py"
        )
