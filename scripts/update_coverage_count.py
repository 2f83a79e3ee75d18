"""Regenerate the test count in COVERAGE.md from actual pytest collection.

Round-1 and round-2 reviews both caught this count drifting from reality.
It is now generated: run this script after adding tests, and
tests/test_coverage_doc.py (slow tier) asserts the documented number equals
what ``pytest --collect-only`` reports, so drift fails CI instead of
misleading readers.

Usage: python scripts/update_coverage_count.py [--check]
"""

from __future__ import annotations

import argparse
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PATTERN = re.compile(r"\d+ tests, `pytest --collect-only`")


def collected_count() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    m = re.search(r"(\d+) tests collected", out.stdout)
    if not m:
        raise RuntimeError(
            f"could not parse collection output:\n{out.stdout[-2000:]}"
        )
    return int(m.group(1))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if COVERAGE.md is stale instead of rewriting")
    args = ap.parse_args()

    n = collected_count()
    path = REPO / "COVERAGE.md"
    text = path.read_text()
    want = f"{n} tests, `pytest --collect-only`"
    new_text = PATTERN.sub(want, text)
    if PATTERN.search(text) is None:
        raise RuntimeError("COVERAGE.md no longer contains the count pattern")
    if new_text == text:
        print(f"COVERAGE.md up to date ({n} tests)")
        return 0
    if args.check:
        print(f"COVERAGE.md stale: collected {n}, doc says "
              f"{PATTERN.search(text).group(0)}")
        return 1
    path.write_text(new_text)
    print(f"COVERAGE.md updated to {n} tests")
    return 0


if __name__ == "__main__":
    sys.exit(main())
