#!/usr/bin/env bash
# End-to-end demo — the reference's `make demo` shape (SURVEY.md §3.5):
# simulate a small corpus → build the index (with RLO sort) → start the
# REST server → query it → diff counts against the naive oracle.
#
# Usage: bash scripts/demo.sh [workdir]
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/tmp/readserver_demo}"
PORT="${DEMO_PORT:-18123}"
mkdir -p "$WORK"

echo "== 1. simulate corpus =="
python -m readserver_tpu.cli simulate --config small --out "$WORK/reads.fasta"

echo "== 2. build index from FASTA (RLO-sorted) =="
python -m readserver_tpu.cli build --fasta "$WORK/reads.fasta" --rlo \
    --out "$WORK/idx"

echo "== 3. pick demo k-mers from the reads =="
KMERS=$(python - "$WORK" <<'EOF'
import sys
from readserver_tpu.corpus import read_fasta
reads = [seq for _, seq in read_fasta(sys.argv[1] + "/reads.fasta")]
for i in (3, 77, 500):
    print(reads[i % len(reads)][10:25])
EOF
)
echo "$KMERS"

echo "== 4. serve + query =="
python -m readserver_tpu.cli serve --index "$WORK/idx" --port "$PORT" \
    > "$WORK/server.log" 2>&1 &
SERVER_PID=$!
trap 'kill $SERVER_PID 2>/dev/null || true' EXIT
for _ in $(seq 1 120); do
    curl -sf -m 2 "http://127.0.0.1:$PORT/health" >/dev/null 2>&1 && break
    sleep 1
done

STATUS=0
for KM in $KMERS; do
    GOT=$(curl -sf "http://127.0.0.1:$PORT/count?kmer=$KM" | python -c \
        'import json,sys; print(json.load(sys.stdin)["count"])')
    WANT=$(python - "$WORK" "$KM" <<'EOF'
import sys
from readserver_tpu.corpus import read_fasta
from readserver_tpu.oracle import naive_count
reads = [seq for _, seq in read_fasta(sys.argv[1] + "/reads.fasta")]
print(naive_count(reads, sys.argv[2]))
EOF
)
    if [ "$GOT" = "$WANT" ]; then
        echo "OK   $KM count=$GOT (naive=$WANT)"
    else
        echo "FAIL $KM count=$GOT naive=$WANT"
        STATUS=1
    fi
done
curl -sf "http://127.0.0.1:$PORT/stats" && echo
exit $STATUS
