#!/usr/bin/env python3
"""Aggregate ScalaTest JUnit XML reports (target/test-reports/TEST-*.xml,
written by sbt's built-in JUnitXmlReportPlugin — do NOT add ScalaTest's
-u reporter on top, build.sbt explains why) into a tests.json
attestation: per-suite test counts + wall seconds, suite/test totals.

Usage: tools/tests_json.py [reportsDir] [outFile]
"""
import json
import sys
import xml.etree.ElementTree as ET
from pathlib import Path


def main(reports_dir="target/test-reports", out="tests.json"):
    suites = {}
    for f in sorted(Path(reports_dir).glob("TEST-*.xml")):
        root = ET.parse(f).getroot()
        name = root.get("name", f.stem)
        suites[name] = {
            "tests": int(root.get("tests", 0)),
            "failures": int(root.get("failures", 0)) + int(root.get("errors", 0)),
            "skipped": int(root.get("skipped", 0)),
            "sec": round(float(root.get("time", 0.0)), 2),
        }
    if not suites:
        print(f"no TEST-*.xml under {reports_dir}; run `sbt -batch test` first",
              file=sys.stderr)
        return 1
    art = {
        "n_suites": len(suites),
        "n_tests": sum(s["tests"] for s in suites.values()),
        "n_failures": sum(s["failures"] for s in suites.values()),
        "n_skipped": sum(s["skipped"] for s in suites.values()),
        "wall_s": round(sum(s["sec"] for s in suites.values()), 1),
        "suites": suites,
    }
    with open(out, "w") as fh:
        json.dump(art, fh, indent=1, sort_keys=True)
    print(f"wrote {out}: {art['n_suites']} suites, {art['n_tests']} tests, "
          f"{art['n_failures']} failures, {art['wall_s']} s")
    return 0 if art["n_failures"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
