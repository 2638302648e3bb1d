#!/usr/bin/env python
"""THE canonical test invocation: fast tier + slow tier, one exit code.

    python tools/run_all_tests.py

Runs the fast tier in one pytest process (`pytest tests/ -m "not slow"`),
then the slow tier with per-module process isolation (see
tools/run_slow_tests.py for why isolation is needed on this image's
XLA:CPU), and exits non-zero if ANY test failed. This is the single
command a reviewer runs to see the whole suite green; the tiering is an
execution detail, not a coverage split.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    t0 = time.time()
    print("[all] fast tier: pytest tests/ -m 'not slow'", flush=True)
    fast = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-m", "not slow",
         "-q", "--no-header"], cwd=ROOT)
    print(f"[all] fast tier {'green' if fast.returncode == 0 else 'FAILED'} "
          f"({time.time() - t0:.0f}s)", flush=True)

    t1 = time.time()
    print("[all] slow tier: tools/run_slow_tests.py", flush=True)
    slow = subprocess.run(
        [sys.executable, "tools/run_slow_tests.py"], cwd=ROOT)
    print(f"[all] slow tier {'green' if slow.returncode == 0 else 'FAILED'} "
          f"({time.time() - t1:.0f}s)", flush=True)

    ok = fast.returncode == 0 and slow.returncode == 0
    print(f"[all] {'ALL GREEN' if ok else 'FAILURES PRESENT'} "
          f"({time.time() - t0:.0f}s total)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
