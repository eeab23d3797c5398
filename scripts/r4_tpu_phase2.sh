#!/bin/bash
# Round-4 TPU campaign, phase 2: per-fusion dissections for ARCHITECTURE
# §8.7, a stability re-check of the pad_cols A/B, and the convergence
# re-record with the fixed (pre-training-anchored) matching gate.
# Run from /root/repo after r4_tpu_campaign.sh finishes.
set -u
OUT=${1:-/tmp/r4_phase2}
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

# 1. per-fusion dissections (§8.7): default vs the two viable levers
run prof_default 1800 BENCH_UNC_PADCOLS=0 -- python scripts/profile_unc_step.py 3 30
run prof_padcols 1800 BENCH_UNC_PADCOLS=1 -- python scripts/profile_unc_step.py 3 30
run prof_fused   1800 BENCH_UNC_ENDPOINTS=fused BENCH_UNC_PADCOLS=0 -- python scripts/profile_unc_step.py 3 30
run prof_largev  1800 BENCH_UNC_V=262144 BENCH_UNC_E=2097152 -- python scripts/profile_unc_step.py 3 30

# 2. stability re-check of the phase-1 A/B (same process order as phase 1)
run unc_default2 1200 BENCH_WORKLOAD=unc BENCH_UNC_PADCOLS=0 -- python bench.py
run unc_padcols2 1200 BENCH_WORKLOAD=unc BENCH_UNC_PADCOLS=1 -- python bench.py

# 3. convergence re-record with zero-predictor baselines + train-fit gate
run scm_conv_v3 5400 -- python scripts/scm_convergence.py --pairs 4096 --max-epochs 40 --bsz 128 --out "$OUT/SCM_CONVERGENCE_tpu.json"

# 4. data-scale hypothesis: does dev matching cross below the zero floor
#    with 4x the pairs? (§11 claims the round-3 flatline was data scale;
#    this is the direct test)
run scm_conv_16k 7200 -- python scripts/scm_convergence.py --pairs 16384 --max-epochs 40 --bsz 128 --out "$OUT/SCM_CONVERGENCE_16k.json"

# 5. pubmed-scale UNC quality re-record, STAGED (ARCHITECTURE §9 failure
#    mode 4: the device-holding process exits before the host evals)
run unc_conv_train 5400 -- python scripts/unc_convergence.py --scale pubmed --stage train --state /tmp/unc_conv_state_pubmed_0.npz
run unc_conv_eval 14400 -- python scripts/unc_convergence.py --scale pubmed --stage eval --state /tmp/unc_conv_state_pubmed_0.npz --out "$OUT/UNC_CONVERGENCE_tpu.json"

log "phase 2 complete"
