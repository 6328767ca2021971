"""Split-process test runner — the documented full-suite entrypoint.

Round-4 VERDICT item: two independent single-process runs of the full
suite segfaulted inside XLA `backend_compile` at ~60% (cumulative
compile pressure on the CPU backend; every test file compiles dozens
of large interpret-mode programs into one process). Run per-file in
separate processes the suite is fully green, so this runner makes that
the supported invocation: one process per test file, aggregated into a
single tally, exit code 0 iff no file failed.

Usage:  python scripts/run_tests.py [-k EXPR] [--jobs N] [files...]
        (defaults to every tests/test_*.py, jobs=1 — the suite's
        interpret-mode tests are themselves multi-core via XLA)
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TALLY = re.compile(
    r"(?:(\d+) passed)?(?:, )?(?:(\d+) skipped)?(?:, )?(?:(\d+) failed)?"
)


def parse_tally(out: str):
    """Last pytest summary line -> (passed, skipped, failed)."""
    passed = skipped = failed = 0
    for line in out.splitlines():
        m = re.search(r"((?:\d+ (?:passed|skipped|failed|error)s?(?:, )?)+)"
                      r".*in [\d.]+s", line)
        if not m:
            continue
        body = m.group(1)
        for n, word in re.findall(r"(\d+) (passed|skipped|failed|error)", body):
            if word == "passed":
                passed = int(n)
            elif word == "skipped":
                skipped = int(n)
            else:
                failed += int(n)
    return passed, skipped, failed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", default=None)
    ap.add_argument("-k", default=None)
    ap.add_argument("--timeout", type=int, default=2400,
                    help="per-file timeout (s); test_pallas_mesh alone "
                         "runs ~19 min on this box")
    args = ap.parse_args()

    files = args.files or sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    tot_p = tot_s = tot_f = 0
    failures = []
    t0 = time.time()
    for f in files:
        rel = os.path.relpath(f, REPO)
        cmd = [sys.executable, "-m", "pytest", rel, "-q", "--no-header"]
        if args.k:
            cmd += ["-k", args.k]
        t1 = time.time()
        try:
            r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                               timeout=args.timeout)
            out = r.stdout + r.stderr
            rc = r.returncode
        except subprocess.TimeoutExpired as e:
            out = (e.stdout or "") + (e.stderr or "")
            rc = -1
        p, s, fl = parse_tally(out)
        # rc 5 = no tests collected (e.g. -k filtered everything out)
        ok = rc in (0, 5) and fl == 0
        if not ok:
            fl = max(fl, 1)
            failures.append((rel, out[-4000:]))
        tot_p += p
        tot_s += s
        tot_f += fl
        print(f"{'PASS' if ok else 'FAIL'} {rel}: {p} passed, {s} skipped, "
              f"{fl} failed ({time.time()-t1:.0f}s)", flush=True)
    print(f"\nTOTAL: {tot_p} passed, {tot_s} skipped, {tot_f} failed "
          f"in {time.time()-t0:.0f}s across {len(files)} files")
    for rel, tail in failures:
        print(f"\n===== {rel} output tail =====\n{tail}")
    sys.exit(1 if tot_f else 0)


if __name__ == "__main__":
    main()
