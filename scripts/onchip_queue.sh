#!/usr/bin/env bash
# Queued on-chip tasks (written late round 3, when the axon relay had died —
# CLAUDE.md "Environment gotchas" #3b). Run this FIRST thing on a session
# with a live TPU. Each step is resume-safe; run ONE TPU process at a time.
set -u

echo "== relay health =="
if ! timeout 2 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; then
    echo "relay ports closed — TPU unreachable (see CLAUDE.md gotcha 3b)."
    echo "If /root/.tpu_init.py is not in 'ps', the relay is dead: do CPU work instead."
    exit 1
fi
echo "relay port open — proceeding"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
cd "$(dirname "$0")/.."

if [ ! -d /tmp/dshard ] || [ ! -d /tmp/ck_hard ]; then
    echo "== regenerating hard-tier data/checkpoint (flags from RESULTS.md) =="
    [ -d /tmp/dshard ] || python -m vdetlib_tpu gen_synth /tmp/dshard --tier hard \
        --num_videos 10 --frames 30 --num_classes 6 --proposals 48 --seed 500
    [ -d /tmp/ck_hard ] || python -m vdetlib_tpu train_detector /tmp/ck_hard \
        --model small --num_classes 6 --steps 1200 --tier hard --eval_every 100
fi

echo "== 1. on-chip fused R4 confirmation (expect ~0.6509; CPU post-fix gave 0.6498) =="
A="--detector_weights /tmp/ck_hard --model small --num_classes 6 --max_rois 48 --bg_decay 0.7 --boost mean"
rm -rf /tmp/hw_R4_fused_confirm
timeout 2700 python -m vdetlib_tpu pipeline /tmp/dshard /tmp/hw_R4_fused_confirm \
    $A --engine fused --eval 2>&1 | tail -3

echo "== 2. bench re-warm + headline (post MGP class-shift fix) =="
timeout 3600 python bench.py
