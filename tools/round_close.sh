#!/usr/bin/env bash
# Round-close flow (VERDICT r13 items 1+2): fresh test reports feed the
# mechanized COVERAGE.md totals, then the full verify + bench refresh;
# Bench itself emits the drift-normalized `regressions` line into
# BENCH_full_latest.json by diffing the prior committed artifact.
# Every named mover must be justified in the SCALE.md wrap.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch test
python3 tools/coverage_totals.py
python3 tools/coverage_totals.py --check
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/round_close_verify"
python3 tools/verify_local.py /tmp/round_close_verify /root/testdata/sf0.01
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench"
grep -h '"metric":"regressions"' BENCH_full_latest.json || true
echo "round-close artifacts refreshed: COVERAGE.md + BENCH_full_latest.json"
