#!/bin/bash
# A/B bench: run bench.py (sf0.1 only) alternately on HEAD and the r10
# tree (.ab_r10 worktree @ 8abd440) in ONE sitting, so environment drift
# between rounds can be separated from a code-introduced regression.
# Sequence HEAD, r10, HEAD, r10 gives two same-tree pairs to bound
# within-sitting noise. Results land in /root/repo/.ab_out/.
set -u
OUT=/root/repo/.ab_out
mkdir -p "$OUT"
export SPARK_GRAFT_SKIP_SF1=1
run_one() {
    local tree="$1" tag="$2"
    cd "$tree" || return 1
    echo "=== $tag ($tree) $(date +%T) load1=$(cut -d' ' -f1 /proc/loadavg)"
    python bench.py > "$OUT/$tag.stdout" 2> "$OUT/$tag.stderr"
    cp BENCH_DETAIL.json "$OUT/$tag.detail.json" 2>/dev/null
    tail -1 "$OUT/$tag.stdout"
}
run_one /root/repo head_a
run_one /root/repo/.ab_r10 r10_a
run_one /root/repo head_b
run_one /root/repo/.ab_r10 r10_b
echo "AB DONE $(date +%T)"
