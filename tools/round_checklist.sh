#!/usr/bin/env bash
# The per-round ritual, mechanized (round 14). Runs every standing
# check that rounds 12-14 added one at a time, in dependency order,
# and fails fast with the failing step named. Intended to be run once
# per round AFTER correctness work is done and BEFORE the anchor
# commit. Timing-sensitive steps (StageBench --check) should run on
# an otherwise idle machine.
#
# Usage: tools/round_checklist.sh   (from the repo root)
set -euo pipefail
cd "$(dirname "$0")/.."

AO=(--add-opens java.base/java.lang=ALL-UNNAMED
    --add-opens java.base/java.lang.invoke=ALL-UNNAMED
    --add-opens java.base/java.lang.reflect=ALL-UNNAMED
    --add-opens java.base/java.io=ALL-UNNAMED
    --add-opens java.base/java.net=ALL-UNNAMED
    --add-opens java.base/java.nio=ALL-UNNAMED
    --add-opens java.base/java.util=ALL-UNNAMED
    --add-opens java.base/java.util.concurrent=ALL-UNNAMED
    --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED
    --add-opens java.base/sun.nio.ch=ALL-UNNAMED
    --add-opens java.base/sun.nio.cs=ALL-UNNAMED
    --add-opens java.base/sun.util.calendar=ALL-UNNAMED
    --add-opens java.base/sun.security.action=ALL-UNNAMED)
CP="target/scala-2.13/classes:/opt/spark/jars/*"

step() { echo; echo "==== $* ===="; }

step "1/5 build + full ScalaTest suite"
sbt -batch compile test

step "2/5 oracle gate at sf0.01 (Verify + DuckDB replay)"
rm -rf /tmp/checklist_verify
java "${AO[@]}" -Xmx8g -Dspark.ui.enabled=false -cp "$CP" \
  graft.Verify /root/testdata/sf0.01 /tmp/checklist_verify \
  > /tmp/checklist_verify.log 2>&1
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/checklist_verify \
  | tail -1 | tee /tmp/checklist_oracle.txt
grep -q ", 0 failed" /tmp/checklist_oracle.txt

step "3/5 planted-class sweep incl. rebuilt /tmp/sf1"
tools/planted_sf1_check.sh

step "4/5 per-stage budget tripwire (StageBench --check, sf0.1)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  java "${AO[@]}" -Xmx8g -Dspark.ui.enabled=false -cp "$CP" \
  graft.StageBench --check 2>/dev/null | grep -E "stage_(bench|check)" \
  | tee /tmp/checklist_stage.txt
# the SKIP path ({"stage_check":"SKIP",...}) exits 0 and matches the
# grep above — demand the explicit OK so the tripwire can't silently
# no-op (round-14 advice)
grep -q '"stage_check":"OK"' /tmp/checklist_stage.txt

step "5/5 sf1 oracle spot-replay (ledger/increment/shards/manifest)"
rm -rf /tmp/checklist_sf1
SPARK_GRAFT_VERIFY_FILTER="q177,q183,q153b,q224" \
  java "${AO[@]}" -Xmx24g -Dspark.ui.enabled=false -cp "$CP" \
  graft.Verify /tmp/sf1 /tmp/checklist_sf1 > /tmp/checklist_sf1.log 2>&1
python3 tools/check_oracle_sf1.py /tmp/sf1 /tmp/checklist_sf1 600 \
  2>/dev/null | grep -E "^OK " | tee /tmp/checklist_sf1_ok.txt
[[ $(grep -c "^OK " /tmp/checklist_sf1_ok.txt) -eq 4 ]]

echo
echo "ROUND CHECKLIST: all steps green"
