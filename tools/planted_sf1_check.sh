#!/usr/bin/env bash
# Planted-class sf1 leg, made un-skippable (VERDICT r13 item 5).
#
# PlantedClassSpec covers /tmp/sf1 only "when present"; /tmp is wiped
# between rounds, so without this wrapper the sf1 assertion silently
# skips and a fixture-regen vacancy (a planted modular class emptied
# by a make_sf1.py change) could hide behind a wiped /tmp. This
# wrapper ALWAYS rebuilds the fixture first, then runs the spec and
# prints the per-class sf1 counts, and fails loudly if the sf1 lines
# are missing from the spec output (i.e. the spec skipped the leg).
#
# Usage: tools/planted_sf1_check.sh   (from the repo root; needs the
# sbt lock — don't run while another sbt invocation is live)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== rebuilding /tmp/sf1 (tools/make_sf1.py) =="
python3 tools/make_sf1.py

echo "== PlantedClassSpec over bundled SFs + /tmp/sf1 =="
out=$(sbt -batch "testOnly graft.PlantedClassSpec" 2>&1 | tee /dev/stderr)

echo "== sf1 planted-class counts =="
sf1_lines=$(grep -F "/tmp/sf1" <<<"$out" || true)
if [[ -z "$sf1_lines" ]]; then
  echo "FAIL: spec output contains no /tmp/sf1 rows — the sf1 leg" \
       "did not run (fixture missing at spec start?)" >&2
  exit 1
fi
echo "$sf1_lines"
grep -q "All tests passed" <<<"$out" || {
  echo "FAIL: PlantedClassSpec did not pass" >&2; exit 1; }
echo "OK: planted classes non-empty at /tmp/sf1 ($(grep -c . <<<"$sf1_lines") rows)"
