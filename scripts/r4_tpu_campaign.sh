#!/bin/bash
# Round-4 TPU measurement campaign (CLAUDE.md "when the relay returns").
# Each step is independently timed out and logged; artifacts land in
# /tmp/r4_campaign/. Run from /root/repo (PYTHONPATH gotcha).
set -u
OUT=${1:-/tmp/r4_campaign}
mkdir -p "$OUT"
cd /root/repo

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/campaign.log"; }

run() {  # run <name> <timeout_s> <env...> -- <cmd...>
    local name=$1 t=$2; shift 2
    local envs=()
    while [ "$1" != "--" ]; do envs+=("$1"); shift; done
    shift
    log "START $name (timeout ${t}s, env: ${envs[*]:-none})"
    if env "${envs[@]}" timeout "$t" "$@" > "$OUT/$name.log" 2>&1; then
        log "OK    $name: $(tail -1 "$OUT/$name.log" | head -c 300)"
    else
        log "FAIL  $name (exit $?): $(tail -2 "$OUT/$name.log" | head -c 300)"
    fi
}

# 0. smoke: is the chip actually usable? bench.py emits an error JSON
# (with an "error" key) and exit 1 on a dead relay — check BOTH.
if ! env BENCH_BSZ=128 BENCH_ITERS=5 timeout 1200 python bench.py \
        > "$OUT/smoke.log" 2>&1 || grep -q '"error"' "$OUT/smoke.log"; then
    log "smoke failed — relay not usable, aborting: $(tail -1 "$OUT/smoke.log" | head -c 300)"
    exit 1
fi
log "OK    smoke: $(tail -1 "$OUT/smoke.log" | head -c 300)"

# 1. UNC step A/B at the pinned envelope (V=65k): default vs the three
#    round-4 levers and the fused x padcols product (VERDICT item 5)
run unc_default  900 BENCH_WORKLOAD=unc -- python bench.py
run unc_fused    900 BENCH_WORKLOAD=unc BENCH_UNC_ENDPOINTS=fused -- python bench.py
run unc_padcols  900 BENCH_WORKLOAD=unc BENCH_UNC_PADCOLS=1 -- python bench.py
run unc_fused_pad 900 BENCH_WORKLOAD=unc BENCH_UNC_ENDPOINTS=fused BENCH_UNC_PADCOLS=1 -- python bench.py
run unc_sendwin  900 BENCH_WORKLOAD=unc BENCH_UNC_SENDWIN=1 -- python bench.py

# 2. large-V regime (VERDICT item 3): V=262144 / E=2097152, xla vs
#    windowed vs windowed+sendwin vs fused
run unc_largev_win     1800 BENCH_WORKLOAD=unc BENCH_UNC_V=262144 BENCH_UNC_E=2097152 -- python bench.py
run unc_largev_xla     1800 BENCH_WORKLOAD=unc BENCH_UNC_V=262144 BENCH_UNC_E=2097152 BENCH_UNC_BACKEND=xla -- python bench.py
run unc_largev_sendwin 1800 BENCH_WORKLOAD=unc BENCH_UNC_V=262144 BENCH_UNC_E=2097152 BENCH_UNC_SENDWIN=1 -- python bench.py
run unc_largev_fused   1800 BENCH_WORKLOAD=unc BENCH_UNC_V=262144 BENCH_UNC_E=2097152 BENCH_UNC_ENDPOINTS=fused -- python bench.py
run unc_largev_padcols 1800 BENCH_WORKLOAD=unc BENCH_UNC_V=262144 BENCH_UNC_E=2097152 BENCH_UNC_PADCOLS=1 -- python bench.py

# 3. full-size default benches for the round artifacts
run bench_scm   1200 BENCH_ITERS=20 -- python bench.py
run bench_unc_infer 900 BENCH_WORKLOAD=unc_infer -- python bench.py
run bench_scm_infer 900 BENCH_WORKLOAD=scm_infer -- python bench.py

# 4. convergence re-records on chip
run scm_conv 5400 -- python scripts/scm_convergence.py --pairs 4096 --max-epochs 40 --bsz 128 --out "$OUT/SCM_CONVERGENCE_tpu.json"
run unc_conv 7200 -- python scripts/unc_convergence.py --scale pubmed --out "$OUT/UNC_CONVERGENCE_tpu.json"

log "campaign complete"
