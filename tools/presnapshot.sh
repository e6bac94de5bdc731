#!/usr/bin/env bash
# Pre-snapshot gate: refuse any end-of-round commit unless the build compiles
# AND the flagship entry query produces rows. Two of the first four rounds
# committed uncompiling code at round end, zeroing the official gates — this
# script makes the "never snapshot without a green compile + smoke" rule
# mechanical. Usage: tools/presnapshot.sh  (exit 0 = safe to commit)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[presnapshot] sbt compile + Test/compile..."
sbt -batch compile Test/compile

echo "[presnapshot] smoke: flagship query (agg_pricing_summary) on sf0.001..."
rm -rf /tmp/presnapshot_smoke
sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/presnapshot_smoke agg_pricing_summary"
test -n "$(ls /tmp/presnapshot_smoke/agg_pricing_summary/*.parquet 2>/dev/null)" \
  || { echo "[presnapshot] FAIL: smoke query produced no parquet output"; exit 1; }
python3 - <<'EOF'
import glob
import pyarrow.parquet as pq
n = sum(pq.read_table(f).num_rows for f in glob.glob('/tmp/presnapshot_smoke/agg_pricing_summary/*.parquet'))
assert n > 0, f"entry query returned {n} rows"
print(f"[presnapshot] OK: entry returned {n} rows")
EOF
echo "[presnapshot] PASS — safe to commit"
