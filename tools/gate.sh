#!/usr/bin/env bash
# End-of-round gate (VERDICT r11 item 2): run EVERY gate against HEAD and
# print one machine-quotable summary line. Round notes must quote the
# FINAL line of this script as run on the FINAL commit — no more stale
# "tests: N/N" claims recorded before a later commit broke the suite.
#
# Usage: tools/gate.sh [sfdir]   (default /root/testdata/sf0.01)
set -uo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
HEAD_SHA=$(git rev-parse --short HEAD)
DIRTY=$(git status --porcelain | wc -l)
echo "== gate @ ${HEAD_SHA} (dirty files: ${DIRTY}) $(date -u +%FT%TZ) sf=${SF}"
fail=0

echo "-- sbt test"
sbt -batch test > /tmp/gate_test.log 2>&1
TESTS=$(grep -E "^\[info\] Tests: " /tmp/gate_test.log | tail -1 | sed 's/^\[info\] //')
grep -q "All tests passed" /tmp/gate_test.log || { fail=1; TESTS="FAILED (${TESTS:-no summary}) — see /tmp/gate_test.log"; }
echo "   ${TESTS}"

echo "-- PlanAudit"
sbt -batch 'runMain graft.PlanAudit' > /tmp/gate_audit.log 2>&1
AUDIT=$(grep -E "plans audited" /tmp/gate_audit.log | tail -1)
echo "${AUDIT}" | grep -q "0 unexpected" || { fail=1; AUDIT="FAILED (${AUDIT:-no summary}) — see /tmp/gate_audit.log"; }
echo "   ${AUDIT}"

echo "-- Verify + DuckDB oracle (${SF})"
sbt -batch "runMain graft.Verify ${SF} /tmp/gate_verify" > /tmp/gate_verify.log 2>&1
ORACLE=$(python3 tools/check_oracle.py "${SF}" /tmp/gate_verify 2>&1 | tail -1)
echo "${ORACLE}" | grep -qE ", 0 failed$" || { fail=1; ORACLE="FAILED (${ORACLE}) — see /tmp/gate_verify.log"; }
echo "   ${ORACLE}"

STATUS=$([ "$fail" -eq 0 ] && echo GREEN || echo RED)
echo "GATE ${STATUS} @ ${HEAD_SHA}: tests[${TESTS}] plans[${AUDIT}] oracle[${ORACLE}]"
exit "$fail"
