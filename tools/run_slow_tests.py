#!/usr/bin/env python
"""Run the slow test tier with per-module process isolation.

XLA:CPU on this image segfaults inside backend_compile after ~80+
compile-heavy tests accumulate in ONE process (reproduced at different
tests across runs; each module passes alone). Until that upstream issue is
gone, the slow tier runs one pytest process per module:

    python tools/run_slow_tests.py          # all slow modules
    python tools/run_slow_tests.py blip coca  # substring filter

Fast tier stays a single process: `pytest -m "not slow"` (~5-7 min).
"""

from __future__ import annotations

import subprocess
import sys
import time

# single source of truth: the conftest slow-module set
import os

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from conftest import SLOW_TEST_MODULES  # noqa: E402

SLOW_MODULES = sorted(SLOW_TEST_MODULES)


def main() -> int:
    filters = sys.argv[1:]
    modules = [m for m in SLOW_MODULES
               if not filters or any(f in m for f in filters)]
    failed = []
    t0 = time.time()
    for mod in modules:
        t = time.time()
        r = subprocess.run([sys.executable, "-m", "pytest", f"tests/{mod}",
                            "-q", "--no-header"])
        status = "ok" if r.returncode == 0 else f"FAILED rc={r.returncode}"
        print(f"[slow] {mod}: {status} ({time.time() - t:.0f}s)", flush=True)
        if r.returncode != 0:
            failed.append(mod)
    print(f"[slow] {len(modules) - len(failed)}/{len(modules)} modules green "
          f"in {time.time() - t0:.0f}s"
          + (f"; FAILED: {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
