"""Aggregated benchmark-suite report.

One command that runs every benchmark test module (the AUTOUGH2 /
analytical / published-data comparisons under tests/test_benchmark_*)
and emits a single pass/fail table artifact — the analogue of the
reference's CREDO runner `benchmark_tests.py:30-80`, which walks the
benchmark dirs and aggregates CREDO XML into an RST report.

Usage:
    python tools/benchmark_report.py [-o BENCHMARKS.md] [pattern]

Runs pytest with a junit-xml sink, then renders markdown: one row per
test with outcome and wall time, grouped by suite, plus a summary
line. Exit code 0 iff everything passed.
"""

import argparse
import glob
import os
import subprocess
import sys
import tempfile
import xml.etree.ElementTree as ET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_suite(pattern):
    files = sorted(glob.glob(os.path.join(REPO, "tests", pattern)))
    if not files:
        raise SystemExit(f"no test files match {pattern}")
    xml_path = os.path.join(
        tempfile.mkdtemp(prefix="benchreport"), "junit.xml"
    )
    proc = subprocess.run(
        [
            sys.executable, "-m", "pytest", "-q",
            f"--junitxml={xml_path}", *files,
        ],
        cwd=REPO,
    )
    return xml_path, proc.returncode


def render(xml_path):
    root = ET.parse(xml_path).getroot()
    suites = root.findall("testsuite") or [root]
    rows = []
    for suite in suites:
        for case in suite.findall("testcase"):
            cls = case.get("classname", "")
            module = cls.split(".")[-1].replace("test_benchmark_", "")
            name = case.get("name")
            t = float(case.get("time", 0.0))
            if case.find("failure") is not None:
                outcome = "FAIL"
            elif case.find("error") is not None:
                outcome = "ERROR"
            elif case.find("skipped") is not None:
                outcome = "skip"
            else:
                outcome = "pass"
            rows.append((module, name, outcome, t))
    rows.sort()
    lines = [
        "# Benchmark suite report",
        "",
        "Full-simulation comparisons against the reference's own "
        "benchmark data (AUTOUGH2 listings, analytical and digitised "
        "published results, test/benchmark/*), run from the "
        "reference's JSON inputs. The CREDO-report analogue of "
        "`/root/reference/test/benchmark/benchmark_tests.py:30-80`.",
        "",
        "| suite | test | outcome | seconds |",
        "|---|---|---|---|",
    ]
    for module, name, outcome, t in rows:
        mark = {"pass": "pass", "skip": "skip"}.get(
            outcome, f"**{outcome}**"
        )
        lines.append(f"| {module} | {name} | {mark} | {t:.1f} |")
    npass = sum(1 for r in rows if r[2] == "pass")
    nfail = sum(1 for r in rows if r[2] in ("FAIL", "ERROR"))
    nskip = sum(1 for r in rows if r[2] == "skip")
    total = sum(r[3] for r in rows)
    lines += [
        "",
        f"**{npass} passed, {nfail} failed, {nskip} skipped** "
        f"({total:.0f} s total)",
    ]
    return "\n".join(lines) + "\n", nfail


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pattern", nargs="?", default="test_benchmark_*.py")
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args()
    xml_path, rc = run_suite(args.pattern)
    text, nfail = render(xml_path)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)
        print(f"wrote {args.output}")
    else:
        print(text)
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
