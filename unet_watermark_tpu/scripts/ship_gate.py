"""Round ship gate: one command that fails on every historical ship bug.

Rounds 3 and 4 each shipped one process failure — a sidecar calibrated
for a different checkpoint (red `test_shipping.py`), then a stale
QUALITY.md AUTOGEN block citing tables that were never regenerated. This
script turns "did we ship clean?" into an exit code:

  python -m unet_watermark_tpu.scripts.ship_gate [--bench] [--full-tests]

Checks (any failure → nonzero exit, all failures listed):
  1. test suite green (fast tier by default; --full-tests adds --runslow)
  2. every shipped seg checkpoint's .quant.json sidecar records the
     sha256 of exactly that checkpoint (pre-round-5 sidecars without the
     hash fail — recalibrate with scripts/calibrate_quant.py)
  3. docs/QUALITY.md AUTOGEN block matches a fresh render of the saved
     quality report (workspace/quality/quality_report.json) — the docs
     cannot drift from the artifact they cite
  4. (--bench) bench.py runs and prints a parseable JSON line
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from typing import List

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def check_tests(full: bool) -> List[str]:
    cmd = [sys.executable, "-m", "pytest", "tests/", "-x", "-q"]
    if full:
        cmd.append("--runslow")
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    if r.returncode != 0:
        tail = "\n".join((r.stdout or "").splitlines()[-15:])
        return [f"test suite RED (rc={r.returncode}):\n{tail}"]
    return []


def check_sidecars(wdir: str = "") -> List[str]:
    from ..ops.quant import load_sidecar_meta
    from .calibrate_quant import file_sha256, quant_sidecar_path

    errs = []
    wdir = wdir or os.path.join(REPO, "unet_watermark_tpu", "weights")
    for name in sorted(os.listdir(wdir)):
        if not (name.startswith("seg_") and name.endswith(".npz")):
            continue
        ckpt = os.path.join(wdir, name)
        sidecar = quant_sidecar_path(ckpt)
        if not os.path.exists(sidecar):
            errs.append(f"{name}: no calibration sidecar "
                        f"({os.path.basename(sidecar)})")
            continue
        meta = load_sidecar_meta(sidecar)
        recorded = meta.get("weights_sha256")
        if not recorded:
            errs.append(f"{name}: sidecar has no weights_sha256 binding — "
                        f"recalibrate (scripts/calibrate_quant.py)")
        elif recorded != file_sha256(ckpt):
            errs.append(f"{name}: sidecar was calibrated for a DIFFERENT "
                        f"checkpoint (hash mismatch) — recalibrate")
    return errs


def check_quality_docs() -> List[str]:
    from .quality_report import AUTOGEN_BEGIN, AUTOGEN_END, render_markdown

    report_path = os.path.join(REPO, "workspace", "quality",
                               "quality_report.json")
    docs_path = os.path.join(REPO, "docs", "QUALITY.md")
    if not os.path.exists(report_path):
        return [f"no saved quality report at {report_path} — run "
                f"quality_report --docs"]
    if not os.path.exists(docs_path):
        return [f"missing {docs_path}"]
    with open(report_path) as f:
        report = json.load(f)
    fresh = render_markdown(report).strip()
    text = open(docs_path).read()
    if AUTOGEN_BEGIN not in text or AUTOGEN_END not in text:
        return ["docs/QUALITY.md has no AUTOGEN block"]
    current = text.split(AUTOGEN_BEGIN)[1].split(AUTOGEN_END)[0].strip()
    if current != fresh:
        return ["docs/QUALITY.md AUTOGEN block is STALE (differs from a "
                "fresh render of workspace/quality/quality_report.json) — "
                "run quality_report --docs"]
    return []


def check_bench() -> List[str]:
    r = subprocess.run([sys.executable, "bench.py"], cwd=REPO,
                       capture_output=True, text=True, timeout=3600)
    for line in reversed((r.stdout or "").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                obj = json.loads(line)
                if {"metric", "value", "unit"} <= set(obj):
                    return []
            except json.JSONDecodeError:
                pass
    return [f"bench.py produced no parseable JSON line (rc={r.returncode})"]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--bench", action="store_true",
                    help="also run bench.py (slow: real-chip compiles)")
    ap.add_argument("--full-tests", action="store_true",
                    help="run the full (--runslow) test tier")
    ap.add_argument("--skip-tests", action="store_true",
                    help="skip the pytest check (when a separate CI job "
                    "already ran it)")
    args = ap.parse_args(argv)

    failures: List[str] = []
    if not args.skip_tests:
        print("[ship_gate] running tests ...", flush=True)
        failures += check_tests(args.full_tests)
    print("[ship_gate] checking sidecar/checkpoint calibration bindings",
          flush=True)
    failures += check_sidecars()
    print("[ship_gate] checking QUALITY.md freshness", flush=True)
    failures += check_quality_docs()
    if args.bench:
        print("[ship_gate] running bench.py", flush=True)
        failures += check_bench()

    if failures:
        print("\nSHIP GATE: FAIL")
        for fmsg in failures:
            print(" -", fmsg)
        return 1
    print("\nSHIP GATE: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
