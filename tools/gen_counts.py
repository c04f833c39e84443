#!/usr/bin/env python3
"""Regenerate the gate counts in README.md.

The suite/test/query totals drifted in rounds 8 and 9 because they were
hand-maintained; this derives them from the artifacts instead:
  - suites/tests: target/test-reports/TEST-*.xml (run `sbt test` first)
  - queries: the `"name" -> ((s, dir)` registrations in
    src/main/scala/graft/queries/*.scala (the SparkEntry.queries surface)

Usage: python3 tools/gen_counts.py   (from the repo root; rewrites README.md)
"""
import glob
import re
import sys
import xml.etree.ElementTree as ET

suites = sorted(glob.glob("target/test-reports/TEST-*.xml"))
if not suites:
    sys.exit("no test reports found — run `sbt test` first")
n_suites = len(suites)
n_tests = sum(int(ET.parse(p).getroot().get("tests", 0)) for p in suites)
failures = sum(
    int(ET.parse(p).getroot().get("failures", 0)) +
    int(ET.parse(p).getroot().get("errors", 0)) for p in suites)

n_queries = 0
for p in glob.glob("src/main/scala/graft/queries/*.scala"):
    with open(p) as f:
        n_queries += len(re.findall(r'"\w+" -> \(\(s, dir\)', f.read()))

with open("README.md") as f:
    readme = f.read()
readme, c1 = re.subn(
    r"- `sbt test` — \d+ suites \(\d+ tests\)\.",
    f"- `sbt test` — {n_suites} suites ({n_tests} tests).", readme)
readme, c2 = re.subn(
    r"\(\d+ queries at sf0\.01\)",
    f"({n_queries} queries at sf0.01)", readme)
if c1 != 1 or c2 != 1:
    sys.exit(f"README gate lines not found (matched {c1}/{c2}) — fix the anchors")
with open("README.md", "w") as f:
    f.write(readme)
print(f"suites={n_suites} tests={n_tests} failures={failures} queries={n_queries}")
