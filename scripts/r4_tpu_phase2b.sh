#!/bin/bash
# Round-4 phase-2b remainder, relay-gated: the shared-relay backend dies
# for stretches (ARCHITECTURE §9); every TPU step first waits for a cheap
# liveness probe to pass so step timeouts burn on real work, not on a
# dead backend. Run from /root/repo.
#
# Already completed in earlier phase-2 runs (logs in /tmp/r4_phase2):
#   prof_default, prof_padcols, prof_fused (V=65k per-fusion profiles).
# This remainder: the re-gated SCM convergence (zero-predictor gate,
# commit 16417f6), the large-V profile, pad_cols stability re-check,
# the staged pubmed-scale UNC quality pin (train on TPU; the pure-CPU
# sklearn eval stage is DETACHED so it never holds the TPU queue), and
# the 16k-pair data-scale probe.
set -u
OUT=${1:-/tmp/r4_phase2b}
mkdir -p "$OUT"
cd /root/repo

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/campaign.log"; }

probe() {
    timeout 90 python -c "
import jax, jax.numpy as jnp
(jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()" \
        > /dev/null 2>&1
}

wait_relay() {
    local n=0
    until probe; do
        n=$((n + 1))
        log "relay dead (probe $n); sleeping 240s"
        sleep 240
    done
}

run() {  # run <name> <timeout_s> <env...> -- <cmd...>
    local name=$1 t=$2; shift 2
    local envs=()
    while [ "$1" != "--" ]; do envs+=("$1"); shift; done
    shift
    wait_relay
    log "START $name (timeout ${t}s, env: ${envs[*]:-none})"
    if env "${envs[@]}" timeout "$t" "$@" > "$OUT/$name.log" 2>&1; then
        log "OK    $name: $(tail -1 "$OUT/$name.log" | head -c 300)"
    else
        log "FAIL  $name (exit $?): $(tail -2 "$OUT/$name.log" | head -c 300)"
    fi
}

# convergence re-record with the fixed gate (zero-predictor baselines +
# train-fit anchor, commit 16417f6 — the 09:02 TPU run predates it)
run scm_conv_v3 5400 -- python scripts/scm_convergence.py --pairs 4096 --max-epochs 40 --bsz 128 --out "$OUT/SCM_CONVERGENCE_tpu.json"

# remaining §8.3 large-V dissection (first attempt got 2 of 4 profiles)
run prof_largev 2400 BENCH_UNC_V=262144 BENCH_UNC_E=2097152 -- python scripts/profile_unc_step.py 3 30

# stability re-check of the phase-1 A/B (one more sample per arm).
# HISTORICAL NOTE: these arms were recorded BEFORE commits ccf9428/
# 0765a96 flipped the bench defaults (BENCH_UNC_RECVBCAST/SENDWIN now
# default 1) — re-running them at HEAD measures a different program
# than phase 1 did; pin SENDWIN=0 RECVBCAST=0 to reproduce the
# original arms.
run unc_default2 1200 BENCH_WORKLOAD=unc BENCH_UNC_PADCOLS=0 -- python bench.py
run unc_padcols2 1200 BENCH_WORKLOAD=unc BENCH_UNC_PADCOLS=1 -- python bench.py

# pubmed-scale UNC quality, STAGED: device process trains + exports +
# exits; the hours-long sklearn stage runs detached on CPU.
run unc_conv_train 7200 -- python scripts/unc_convergence.py --scale pubmed --stage train --state /tmp/unc_conv_state_pubmed_0.npz
if [ -f /tmp/unc_conv_state_pubmed_0.npz ]; then
    log "DETACH unc_conv_eval (pure CPU; log $OUT/unc_conv_eval.log)"
    nohup python scripts/unc_convergence.py --scale pubmed --stage eval \
        --state /tmp/unc_conv_state_pubmed_0.npz \
        --out "$OUT/UNC_CONVERGENCE_tpu.json" \
        > "$OUT/unc_conv_eval.log" 2>&1 &
    echo $! > "$OUT/unc_conv_eval.pid"
fi

# data-scale hypothesis: dev matching vs the zero floor at 4x pairs
run scm_conv_16k 9000 -- python scripts/scm_convergence.py --pairs 16384 --max-epochs 40 --bsz 128 --out "$OUT/SCM_CONVERGENCE_16k.json"

log "phase 2b complete"
