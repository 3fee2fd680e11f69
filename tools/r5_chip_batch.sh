#!/bin/bash
# Round-5 measurement batch — run ONLY on an idle host (no builds).
# Produces the r5 record: bench.py x2 (reproducibility), the 3.1 Gbp
# VarQuery length sweep, and the 230 Mbp sweep re-measure under the
# digest-only harness. Each step logs to .bench_cache/r5_*.log.
set -u
cd "$(dirname "$0")/.."
B=.bench_cache
run() { # run <tag> <cmd...>
  local tag=$1; shift
  echo "=== $tag: $* ==="
  ( "$@" ) >"$B/r5_$tag.log" 2>&1
  echo "rc=$? ($tag)"
  tail -3 "$B/r5_$tag.log"
}
run bench1 python bench.py
run bench2 python bench.py
run sweep31g python tools/bench_query_scale.py $B/bench_3100000000_k21.stpu.npz \
    qLen=11,21,31,41,51,101 iters=4 sweep=cu:4500000
run sweep230m python tools/bench_query_scale.py $B/bench_230000000_k21.stpu.npz \
    qLen=11,21,31,41,51,101 iters=5 sweep=cu:2500000
echo "=== batch done ==="
