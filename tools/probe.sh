#!/bin/bash
# Probe named queries with bench.py, save the per-query record to
# /tmp/r10b/probe_<tag>.json, and restore the committed BENCH_FULL.json.
# Usage: tools/probe.sh <tag> <q1,q2,...>
set -e
cd "$(dirname "$0")/.."
TAG="$1"; ONLY="$2"
SPARK_GRAFT_BENCH_ONLY="$ONLY" python bench.py 2>/dev/null | tail -1
mkdir -p /tmp/r10b
python3 - "$TAG" <<'EOF'
import json, sys
d = json.load(open('BENCH_FULL.json'))
out = f"/tmp/r10b/probe_{sys.argv[1]}.json"
json.dump(d, open(out, 'w'), indent=1, sort_keys=True)
print(out, {k: v for k, v in sorted(d['queries'].items())})
EOF
git checkout -- BENCH_FULL.json
