"""docs/PERF.md must be exactly the generator's rendering of the committed
measurement artifacts (round-3 lesson: two docs carried contradictory
flagship numbers because one was hand-edited and never regenerated).

Regenerate with:
    python tools/gen_perf_md.py BENCH_ARTIFACT.json MULTICHIP_BENCH.json \
        --date <artifact date> > docs/PERF.md
"""
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_perf_md_matches_committed_artifacts():
    current = open(os.path.join(REPO, "docs", "PERF.md")).read()
    m = re.match(r"# Measured performance \((\d{4}-\d{2}-\d{2})", current)
    assert m, "PERF.md must start with the generated header"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_perf_md.py"),
         os.path.join(REPO, "BENCH_ARTIFACT.json"),
         os.path.join(REPO, "MULTICHIP_BENCH.json"),
         "--date", m.group(1)],
        capture_output=True, text=True, check=True)
    assert out.stdout == current, (
        "docs/PERF.md is out of sync with the committed artifacts - "
        "regenerate it with tools/gen_perf_md.py, never hand-edit")


def test_perf_artifact_is_driver_parseable():
    import json
    r = json.loads(open(os.path.join(REPO, "BENCH_ARTIFACT.json")).read())
    assert r["metric"] == "ambi_bin_order3_magls_64streams_rtf"
    assert r["value"] and r["value"] > 100, "flagship must beat the target"
    assert r["vs_baseline"] > 1.0
    e = r["extra"]
    assert e["max_abs_err_vs_c_reference"] <= 1e-4
    assert e["config_errors"] == {}
