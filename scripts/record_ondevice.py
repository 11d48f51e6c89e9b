"""Record the real-hardware kernel parity suite as a versioned artifact.

Runs ``VIVIM_TESTS_ON_DEVICE=1 pytest tests/test_on_device.py`` (the
Mosaic-compiled kernels vs their sequential references on the actual
accelerator — the reference project's kernel-test discipline,
/root/reference/mamba/tests/ops/test_selective_scan.py, run where it
matters) and writes the per-test outcome plus the software/hardware
versions to ``ONDEVICE_r{N}.json`` and ``ONDEVICE_LATEST.json`` at the
repo root, so a regression on the real chip is diffable round over round
instead of living only in a commit message.

Usage (from the repo root, on a TPU host)::

    python scripts/record_ondevice.py --round 4
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def device_info() -> dict:
    """Query backend/device/version info in a subprocess (so this script
    never holds the TPU while pytest wants it)."""
    code = (
        "import json, jax\n"
        "d = jax.devices()[0]\n"
        "print(json.dumps({'backend': jax.default_backend(),"
        " 'device_kind': d.device_kind, 'platform': d.platform,"
        " 'n_devices': jax.device_count(),"
        " 'jax_version': jax.__version__,"
        " 'jaxlib_version': __import__('jaxlib').__version__}))\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=REPO, timeout=300)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    return {"error": (out.stderr or out.stdout)[-400:]}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--round", type=int, default=None,
                   help="round number for the ONDEVICE_r{N}.json filename "
                        "(also written to ONDEVICE_LATEST.json)")
    p.add_argument("--timeout", type=int, default=3000)
    args = p.parse_args(argv)

    env = dict(os.environ, VIVIM_TESTS_ON_DEVICE="1")
    cmd = [sys.executable, "-m", "pytest", "tests/test_on_device.py",
           "-v", "--tb=line"]
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                          env=env, timeout=args.timeout)

    tests = {}
    for line in proc.stdout.splitlines():
        m = re.match(r"(tests/test_on_device\.py::\S+)\s+"
                     r"(PASSED|FAILED|SKIPPED|ERROR)", line)
        if m:
            tests[m.group(1).split("::", 1)[1]] = m.group(2)
    counts = {s: sum(1 for v in tests.values() if v == s)
              for s in ("PASSED", "FAILED", "SKIPPED", "ERROR")}
    if not tests:  # fall back to the summary line ("8 passed in 600s")
        m = re.search(r"(\d+) passed", proc.stdout)
        if m:
            counts["PASSED"] = int(m.group(1))
        m = re.search(r"(\d+) failed", proc.stdout)
        if m:
            counts["FAILED"] = int(m.group(1))

    info = device_info()
    record = {
        "suite": "tests/test_on_device.py (VIVIM_TESTS_ON_DEVICE=1; "
                 "Mosaic-compiled kernels vs sequential refs on the real "
                 "chip at deliberately unaligned shapes)",
        "when": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        "rc": proc.returncode,
        "passed": counts["PASSED"],
        "failed": counts["FAILED"] + counts["ERROR"],
        "skipped": counts["SKIPPED"],
        "tests": tests,
        "tolerances": "reference discipline (test_selective_scan.py:45-48):"
                      " fwd fp32 rtol 6e-4/atol 2e-3, bf16 3e-2/5e-2;"
                      " grads rtol 1e-3..5e-3",
        **info,
    }
    if proc.returncode != 0 and not tests:
        record["tail"] = proc.stdout[-1500:] + proc.stderr[-500:]

    names = ["ONDEVICE_LATEST.json"]
    if args.round is not None:
        names.append(f"ONDEVICE_r{args.round:02d}.json")
    for name in names:
        with open(os.path.join(REPO, name), "w") as f:
            json.dump(record, f, indent=2)
            f.write("\n")
    print(json.dumps({k: record[k] for k in
                      ("rc", "passed", "failed", "skipped", "device_kind")
                      if k in record}))
    return 1 if record["failed"] or not record["passed"] else 0


if __name__ == "__main__":
    sys.exit(main())
