#!/usr/bin/env bash
# Round-close flow (VERDICT r13 items 1+2, r14 item 2): fresh test
# reports feed the mechanized COVERAGE.md totals, then the full verify
# + bench refresh; Bench emits the drift-normalized `regressions` line
# into BENCH_full_latest.json by diffing the newest COMMITTED
# round-boundary artifact (BENCH_full_r{N}.json) — never the previous
# same-session run, whose movers are all JVM-aging noise. Every named
# mover must be justified in the SCALE.md wrap. After the wrap, pin
# the close artifact as the NEXT round's baseline:
#   tools/round_close.sh [pin-round-number]
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch test
python3 tools/coverage_totals.py
python3 tools/coverage_totals.py --check
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/round_close_verify"
python3 tools/verify_local.py /tmp/round_close_verify /root/testdata/sf0.01
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench"
grep -h '"metric":"regressions"' BENCH_full_latest.json || true
if [ -n "${1:-}" ]; then
  cp BENCH_full_latest.json "BENCH_full_r${1}.json"
  echo "pinned BENCH_full_r${1}.json as the round-boundary baseline"
fi
echo "round-close artifacts refreshed: COVERAGE.md + BENCH_full_latest.json"
