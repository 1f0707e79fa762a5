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
# "close is the last commit", enforced at the entrance (VERDICT r15
# item 3): the pin describes a COMMITTED state, so refuse to close
# over uncommitted source — and the exit message makes the other half
# of the invariant explicit
if [ -n "$(git status --porcelain -- src build.sbt tools project 2>/dev/null)" ]; then
  echo "round_close: uncommitted source changes — commit first; the pin must describe a committed state" >&2
  exit 2
fi
sbt -batch test
python3 tools/coverage_totals.py
python3 tools/coverage_totals.py --check
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/round_close_verify"
python3 tools/verify_local.py /tmp/round_close_verify /root/testdata/sf0.01
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench"
grep -h '"metric":"regressions"' BENCH_full_latest.json || true
# declared-vs-benched reconciliation (VERDICT r15 item 3: the r15 pin
# silently missed feature_winsorize): every query Verify just dumped
# must appear in the bench artifact or its excluded list
python3 - <<'EOF'
import json, glob, os, sys
# Verify writes one DIRECTORY per query (outDir/<name>, no suffix)
# plus the oracle_sql.json file
declared = {os.path.basename(p)
            for p in glob.glob('/tmp/round_close_verify/*')
            if os.path.isdir(p)}
benched, excluded = set(), set()
for line in open('BENCH_full_latest.json'):
    line = line.strip()
    if not line.startswith('{'):
        continue
    d = json.loads(line)
    if d.get('metric') == 'total' and 'queries' in d:
        benched |= set(d['queries'])
        excluded |= set(d.get('excluded', []))
missing = declared - benched - excluded
extra = benched - declared
if missing or extra:
    print(f"round_close: bench/declared mismatch: "
          f"missing={sorted(missing)} extra={sorted(extra)}", file=sys.stderr)
    sys.exit(3)
print(f"reconciled: {len(declared)} declared == "
      f"{len(benched)} benched + {len(excluded)} excluded")
EOF
if [ -n "${1:-}" ]; then
  head_sha=$(git rev-parse --short HEAD)
  cp BENCH_full_latest.json "BENCH_full_r${1}.json"
  # stamp the pin with the HEAD it describes: a later source commit is
  # then mechanically detectable (pinned head != round's last commit)
  printf '{"metric":"pinned_at","round":%s,"head":"%s"}\n' \
    "$1" "$head_sha" >> "BENCH_full_r${1}.json"
  echo "pinned BENCH_full_r${1}.json at HEAD $head_sha — commit the artifacts NOW; any later source commit invalidates this pin"
fi
echo "round-close artifacts refreshed: COVERAGE.md + BENCH_full_latest.json"
