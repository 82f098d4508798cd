#!/bin/bash
# Post-wipe recovery master queue (round-3, second container wipe).
#
# The wipe took /tmp (the detached schedulers + their pid files), the
# gitignored dataset/ shards, and every runs/ checkpoint that was not
# force-committed. Committed survivors: the v1/v2 flagship light npzs,
# the v1 base (runs/v1base_612m/ckpt_20480_light.npz), and the v2
# from-scratch base. Lost: runs/v2adapt_612m (the 4,096-step v2
# adaptation both pending A/Bs key off) and the v2_aw00 extension
# checkpoints past 1536.
#
# This script regenerates the prerequisites, then chains the already-
# committed (idempotent, artifact-committing, liveness-gated) queue
# scripts in value-per-minute order:
#   0. v2 val shard (deterministic regen — same clips as every prior eval)
#   1. cold-start A/B rerun        (r3x_coldstart2.sh — no deps beyond npz)
#   2. tail queue                  (r3x_tail.sh — lr-drop polish arm; the
#      SWA arm self-skips: its 2048/2560 inputs were lost to the wipe)
#   3. v2 adaptation regen (exact close-out recipe) + force-commit the
#      ckpt_4096 npz this time (wipe durability)
#   4. f32-master fine-tune        (r3x_f32ab.sh — note: the regenerated
#      adaptation itself now warm-starts with f32 masters post-fix, so
#      this measures the fully-f32 lineage vs the committed bf16-lineage
#      flagship number, not a single-variable A/B)
#   5. v3 music-structure pipeline (r3x_v3.sh)
#
# Strictly serial: one TPU client at a time (CLAUDE.md contention rule).
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
# one shared deadline for every chained sub-script
export PHASEGEN_Q_DEADLINE=${PHASEGEN_Q_DEADLINE:-$(( $(date +%s) + 32400 ))}
STATUS=/tmp/q_status.log
# fresh campaign: a leftover stop file (bench.py touches it at round
# end) would silently park every gated stage below (ADVICE r3, high)
rm -f "${PHASEGEN_STOP_FILE-/tmp/q_stop}"
stamp() { echo "$(date -u +%FT%TZ) r3y: $1" >> "$STATUS"; }
remain() { echo $(( PHASEGEN_Q_DEADLINE - $(date +%s) )); }
window() {
  local min_s=$1 cap=$2 r; r=$(remain)
  if [ "$r" -lt "$min_s" ]; then echo ""; else
    [ "$r" -lt "$cap" ] && echo "$r" || echo "$cap"; fi
}
probe() {
  until timeout 700 python -c \
    "from phasegen_tpu.obs.watchdog import device_liveness_probe as p; p()"
  do
    stamp "backend down; retry in 300 s"
    sleep 300
    [ "$(remain)" -lt 600 ] && { stamp "deadline during outage; exit"; exit 0; }
  done
}
commit_art() {
  local msg=$1; shift
  for i in 1 2; do
    git add -f "$@" && git commit -q -m "$msg

No-Verification-Needed: artifact-only commit (checkpoint/result data)" \
      && return 0
    sleep 10
  done
  stamp "WARN: commit failed: $msg"
}

stamp "recovery queue start (deadline=$PHASEGEN_Q_DEADLINE, remain=$(remain)s)"
mkdir -p dataset runs docs/results

# --- 0: v2 val shard --------------------------------------------------------
V2VAL=dataset/synthv2_audio_val.npy
if [ ! -f "$V2VAL" ]; then
  stamp "0: regen v2 val shard"
  probe
  timeout 3600 python -m phasegen_tpu.cli.make_corpus \
    --out_dir dataset --name synthv2 --version 2 --n_train 98304 --n_val 1024
  stamp "0 done"
fi

# --- 1: cold-start A/B rerun ------------------------------------------------
if [ ! -f docs/results/coldstart_r3x2.jsonl ]; then
  stamp "1: cold-start A/B rerun"
  bash benchmarks/r3x_coldstart2.sh
  stamp "1 done"
fi

# --- 2: tail queue (lr-drop polish from the committed 1536 peak) ------------
if [ ! -f docs/results/select_v2polish_lr3e5.json ] \
   && [ -n "$(window 2400 999999)" ]; then
  stamp "2: tail queue (polish arm)"
  bash benchmarks/r3x_tail.sh
  stamp "2 done"
fi

# --- 3: v2 adaptation regen (exact r3_closeout.sh stage-E recipe) ------------
BASE=runs/v1base_612m/ckpt_20480_light.npz
ADAPT=runs/v2adapt_612m/ckpt_4096_light.npz
T=$(window 2400 7200)
if [ -n "$T" ] && [ -f "$BASE" ] && [ ! -f "$ADAPT" ]; then
  stamp "3: v2 adaptation regen (cap ${T}s)"
  for i in 1 2; do
    probe
    T=$(window 2400 7200); [ -z "$T" ] && break
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v2adapt_612m --init_from "$BASE" \
      --val_paths "$V2VAL" \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 1e-4 \
      --max_steps 4096 --ckpt_light --ckpt_every 1024 --val_every 1024 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "3 attempt $i exited nonzero; resume retry"
    sleep 120
  done
  [ -f "$ADAPT" ] && commit_art \
    "Recommit the v2 adaptation checkpoint lost to the container wipe" \
    "$ADAPT"
  stamp "3 done"
fi

# --- 4: f32-master lineage --------------------------------------------------
if [ -f "$ADAPT" ] && [ ! -f docs/results/select_v2_aw00_f32.json ] \
   && [ -n "$(window 2400 999999)" ]; then
  stamp "4: f32-master fine-tune queue"
  bash benchmarks/r3x_f32ab.sh
  stamp "4 done"
fi

# --- 5: v3 pipeline -----------------------------------------------------------
if [ -f "$ADAPT" ] && [ ! -f docs/results/eval_v3_winner.json ] \
   && [ -n "$(window 3600 999999)" ]; then
  stamp "5: v3 music-structure pipeline"
  bash benchmarks/r3x_v3.sh
  stamp "5 done"
fi

stamp "RECOVERY QUEUE DONE (remain=$(remain)s)"
