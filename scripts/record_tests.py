"""Record the full test-suite result as a versioned artifact.

Runs both tiers of the suite (tests/conftest.py tiering):

    fast tier — ``pytest -m "not slow"`` (target < 5 min on 1 CPU)
    slow tier — ``pytest -m slow``       (mesh compiles, torch goldens,
                                          CLI e2e; ~25-45 min on 1 CPU)

and writes pass/fail/skip counts, wall time, and software versions to
``TESTS_r{N}.json`` + ``TESTS_LATEST.json`` at the repo root — the
suite's round-over-round health becomes a diffable artifact (the same
discipline ``scripts/record_ondevice.py`` applies to the hardware kernel
parity suite).  The reference project has no project-level tests at all
(SURVEY.md §4); this suite is the repo's substitute for its
implicit-integration-testing gap.

Usage (from the repo root)::

    python scripts/record_tests.py --round 5 [--fast-only]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def versions() -> dict:
    code = (
        "import json, jax, jaxlib, flax, optax, numpy\n"
        "print(json.dumps({'jax': jax.__version__,"
        " 'jaxlib': jaxlib.__version__, 'flax': flax.__version__,"
        " 'optax': optax.__version__, 'numpy': numpy.__version__,"
        " 'python': __import__('sys').version.split()[0]}))\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=REPO, timeout=300)
    for line in out.stdout.splitlines():
        if line.strip().startswith("{"):
            return json.loads(line)
    return {"error": (out.stderr or out.stdout)[-300:]}


def run_tier(marker_expr: str, timeout: int) -> dict:
    """One pytest run; returns counts + wall time + failed test names."""
    t0 = time.time()
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q",
           "-m", marker_expr, "--tb=line", "-rf"]
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                          timeout=timeout)
    wall = time.time() - t0
    counts = {}
    # summary line: "179 passed, 8 skipped, 104 deselected in 281.53s"
    for n, what in re.findall(r"(\d+) (passed|failed|skipped|error[s]?|"
                              r"deselected|xfailed|xpassed)", proc.stdout):
        counts[what.rstrip("s")] = int(n)
    failed = re.findall(r"^FAILED (\S+)", proc.stdout, re.M)
    rec = {
        "marker": marker_expr,
        "rc": proc.returncode,
        "wall_s": round(wall, 1),
        **{k: counts.get(k, 0) for k in
           ("passed", "failed", "skipped", "error", "deselected")},
    }
    if failed:
        rec["failed_tests"] = failed[:40]
    if proc.returncode not in (0, 5) and not counts:
        rec["tail"] = proc.stdout[-1200:] + proc.stderr[-400:]
    return rec


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--round", type=int, default=None,
                   help="round number for the TESTS_r{N}.json filename "
                        "(also written to TESTS_LATEST.json)")
    p.add_argument("--fast-only", action="store_true",
                   help="skip the slow tier (quick health check)")
    p.add_argument("--timeout", type=int, default=9000,
                   help="per-tier subprocess timeout (s); the slow tier "
                        "passed 5400s in round 5 once the pipeline/EP "
                        "mesh tests landed")
    args = p.parse_args(argv)

    record = {
        "suite": 'tests/ in two tiers (conftest.py): fast = -m "not slow", '
                 'slow = -m slow (mesh compiles, torch goldens, CLI e2e)',
        "when": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        "host_cpus": os.cpu_count(),
        "versions": versions(),
        "fast": run_tier("not slow", args.timeout),
    }
    if not args.fast_only:
        record["slow"] = run_tier("slow", args.timeout)
    tiers = [record["fast"]] + ([record["slow"]]
                                if "slow" in record else [])
    record["green"] = all(
        t["rc"] == 0 and t["failed"] == 0 and t["error"] == 0
        for t in tiers)

    names = ["TESTS_LATEST.json"]
    if args.round is not None:
        names.append(f"TESTS_r{args.round:02d}.json")
    for name in names:
        with open(os.path.join(REPO, name), "w") as f:
            json.dump(record, f, indent=2)
            f.write("\n")
    print(json.dumps({
        "green": record["green"],
        **{f"{k}_{t}": record[k][t] for k in ("fast", "slow")
           if k in record for t in ("passed", "failed", "wall_s")}}))
    return 0 if record["green"] else 1


if __name__ == "__main__":
    sys.exit(main())
