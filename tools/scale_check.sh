#!/bin/bash
# r19 scale battery (VERDICT r18 items 1 + 10): build the 5x corpus from
# sf0.1, TIME the full declared suite on it at 32 AND 8 cores (sf0.1 alone
# is core-count-insensitive, so this tier is where data-path parallelism
# is actually graded), compute sf_scaling.json — which the next full sf0.1
# bench embeds into bench_out.json — and re-run the SkewAudit at the
# scaled corpus.
#
# Usage: tools/scale_check.sh   (BASE/SCALED/COPIES/OUT overridable via env)
set -euo pipefail
cd "$(dirname "$0")/.."
BASE=${BASE:-/root/testdata/sf0.1}
SCALED=${SCALED:-/tmp/sf0.1x5}
COPIES=${COPIES:-5}
OUT=${OUT:-sf_scaling.json}

sbt -batch "runMain graft.ScaleData $BASE $SCALED $COPIES"

run_bench() { # dir cpus outfile
  echo "[scale_check] bench $1 at $2 cores"
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS="$2" \
    sbt -batch "runMain graft.Bench" > "/tmp/scale_bench_c$2_$(basename "$1").log" 2>&1
  cp bench_out.json "$3"
}

run_bench "$BASE" 32 /tmp/bench_base32.json
run_bench "$SCALED" 32 /tmp/bench_scaled32.json
run_bench "$SCALED" 8 /tmp/bench_scaled8.json

python3 tools/scale_check.py /tmp/bench_base32.json /tmp/bench_scaled32.json \
  "$COPIES" "$OUT" /tmp/bench_scaled8.json

echo "[scale_check] skew audit at the scaled corpus"
sbt -batch "runMain graft.SkewAudit $SCALED skew_audit_r19.json"
echo "[scale_check] done: $OUT, skew_audit_r19.json"
