#!/usr/bin/env bash
# Round-close self-check (VERDICT r6 item 1): the driver's correctness
# artifact silently recorded {} in round 6, zeroing the round's hard
# signal. This script is the builder-side gate to run BEFORE declaring
# a round closed:
#   1. full Verify dump at sf0.01,
#   2. sanity: oracle_sql.json exists, parses, and is non-trivial,
#   3. dev/check.py (the driver-replica DuckDB compare) must be 100%,
#   4. if a driver CORRECTNESS_r*.json exists for this round, assert it
#      is non-empty JSON (catches the r6 failure mode the moment the
#      driver writes it).
# Usage: dev/round_close.sh [sfDir] [round-number]
set -euo pipefail
SF="${1:-/root/testdata/sf0.01}"
ROUND="${2:-}"
OUT=$(mktemp -d /tmp/graft_round_close.XXXX)
echo "[round-close] verify dump -> $OUT"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" dev/run_class.sh graft.Verify "$SF" "$OUT" 2>"$OUT/verify.stderr"
grep "\[verify\]" "$OUT/verify.stderr" && { echo "[round-close] FAIL: query build failures above"; exit 1; } || true
python3 - "$OUT" <<'EOF'
import json, sys
d = json.load(open(f"{sys.argv[1]}/oracle_sql.json"))
assert isinstance(d, dict) and len(d) > 400, f"oracle_sql.json suspicious: {len(d)} entries"
print(f"[round-close] oracle_sql.json OK ({len(d)} entries)")
EOF
# driver-schema local artifact (VERDICT r8 item 1): the driver's own
# CORRECTNESS_r*.json has been {} for rounds 6-8, so the round's hard
# correctness signal is bridged by committing this file at close.
EMIT=""
if [ -n "$ROUND" ]; then EMIT="--emit CORRECTNESS_LOCAL_r${ROUND}.json"; fi
python3 dev/check.py $EMIT "$SF" "$OUT"
# Row-count invariant (VERDICT r10 item 5): the artifact must carry
# EXACTLY one row per declared query — |rows| == |SparkEntry.queries|
# (= |queries.json| from the Verify dump). This plus the generation
# command is the copy-paste recipe for the driver-side writer:
#   dev/run_class.sh graft.Verify <sf0.01> <out>
#   python3 dev/check.py --emit CORRECTNESS_r<N>.json <sf0.01> <out>
if [ -n "$ROUND" ]; then
  python3 - "CORRECTNESS_LOCAL_r${ROUND}.json" "$OUT/queries.json" <<'EOF'
import json, sys
rows = json.load(open(sys.argv[1]))
declared = json.load(open(sys.argv[2]))
assert len(rows) == len(declared), \
    f"artifact rows {len(rows)} != declared queries {len(declared)}"
print(f"[round-close] artifact row-count invariant OK ({len(rows)} rows)")
EOF
fi
if [ -n "$ROUND" ] && [ -f "CORRECTNESS_r${ROUND}.json" ]; then
  python3 - "CORRECTNESS_r${ROUND}.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
assert d, f"{sys.argv[1]} is EMPTY - the round-6 failure mode; escalate to the driver"
print(f"[round-close] {sys.argv[1]} non-empty ({len(d)} rows)")
EOF
fi
echo "[round-close] ALL GREEN"
