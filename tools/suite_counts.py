#!/usr/bin/env python3
"""Generate the suite/test counts BASELINE.md quotes (dev tooling —
the engine itself is pure Scala/Spark).

The JUnit XML under target/test-reports is per-suite and OVERWRITTEN
by whatever ran last, so `testOnly` iterations leave a mix of full and
partial suite reports — summing them mid-session under-counts (the
round-9 "45 suites / 448 tests" vs "42 reports / 449 tests" drift).
Run this IMMEDIATELY AFTER one full `sbt test` and paste its line;
it refuses (exit 1) if any report file is older than the newest one
by more than the full run's plausible duration, which is the stale-mix
signature.
"""
import glob, os, sys, xml.etree.ElementTree as ET

reports = sorted(glob.glob("target/test-reports/*.xml"))
if not reports:
    print("no reports under target/test-reports — run `sbt test` first")
    sys.exit(1)
mtimes = {f: os.path.getmtime(f) for f in reports}
newest = max(mtimes.values())
# one full suite run writes every report within its own wall time;
# anything >2h older than the newest predates this run
stale = [f for f, m in mtimes.items() if newest - m > 7200]
suites = tests = failures = errors = 0
for f in reports:
    r = ET.parse(f).getroot()
    suites += 1
    tests += int(r.get("tests", 0))
    failures += int(r.get("failures", 0))
    errors += int(r.get("errors", 0))
print(f"suites={suites} tests={tests} failures={failures} errors={errors}")
if stale:
    print(f"STALE MIX: {len(stale)} report(s) predate the newest by >2h "
          f"— re-run the FULL `sbt test` before quoting these counts:")
    for f in stale:
        print(f"  {f}")
    sys.exit(1)
