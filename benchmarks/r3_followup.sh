#!/bin/bash
# Round-3 follow-up queue: runs AFTER benchmarks/r3_restart_pipeline.sh
# releases the chip (serial: one TPU client at a time).
#
# Experiments (docs/NEXT.md lead #1 — "the waveform objective dominates
# once a base exists; try wav-only training from scratch next"):
#
#   A. wav-only FROM SCRATCH: --wav_weight 1.0 --ang_weight 0.0 from
#      random init, same 20,480-step cosine recipe as the v2 base. The
#      phase head then gets gradient ONLY through the waveform-domain
#      term (the evaluation metric itself); the cos/sin loss is never
#      used. If this matches the two-stage recipe, the pipeline
#      simplifies to a single run.
#   B. ang 0.05 fine-tune of the v2scratch base — the midpoint of the
#      aw00-vs-aw01 sweep stage2 runs (BASELINE "40k-base ang sweep"
#      suggested lower ang is at least as good).
#
# Gating: waits for the main pipeline PID to exit, then proceeds with
# the same liveness-gated probe discipline. Every stage is bounded by a
# HARD DEADLINE (PHASEGEN_Q_DEADLINE, unix ts): the driver benches the
# chip at the 12 h mark, so no queue job may hold the TPU past it —
# stages whose remaining window is too small are skipped, and running
# stages get `timeout` capped to the window (SIGTERM; resumable ckpts
# mean a truncated train attempt still leaves its ckpt_every progress).
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
DEADLINE=${PHASEGEN_Q_DEADLINE:-0}   # unix ts; 0 = no deadline
stamp() { echo "$(date -u +%FT%TZ) followup: $1" >> "$STATUS"; }

remain() {  # seconds until deadline (large if none)
  if [ "$DEADLINE" -gt 0 ]; then echo $(( DEADLINE - $(date +%s) ));
  else echo 999999; fi
}

# window MIN_S needed to be worth starting; prints capped timeout or ""
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

# Wait for the main pipeline to release the chip.
MAIN_PID=$(cat /tmp/pipeline.pid 2>/dev/null)
if [ -n "$MAIN_PID" ]; then
  while kill -0 "$MAIN_PID" 2>/dev/null; do sleep 60; done
fi
stamp "main pipeline exited; starting follow-up (deadline=$DEADLINE)"

T=$(window 2400 18000)   # train: need >=40 min to make ckpt progress
if [ -n "$T" ]; then
  stamp "A: wav-only from-scratch base (20480 steps, cap ${T}s)"
  for i in 1 2 3 4; do
    probe
    T=$(window 2400 18000); [ -z "$T" ] && break
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v2wavscratch_612m \
      --val_paths dataset/synthv2_audio_val.npy \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 1e-3 --lr_schedule cosine --warmup_steps 500 --decay_steps 20480 \
      --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 20480 --ckpt_light --ckpt_every 4096 --val_every 2048 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "A attempt $i exited nonzero; resume retry"
    sleep 120
  done
  stamp "A train done (or deadline-parked)"
else
  stamp "A skipped: deadline too close"
fi

T=$(window 1500 7200)    # select: ~40 min typical over 5 ckpts
if [ -n "$T" ] && ls runs/v2wavscratch_612m/ckpt_*_light.npz >/dev/null 2>&1
then
  probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/v2wavscratch_612m --data dataset/synthv2_audio_val.npy \
    --gl_iters 8 --refine_iters 1,2 \
    --out docs/results/select_v2wavscratch.json
  stamp "A select done"
fi

BASE=runs/v2scratch_612m/ckpt_20480_light.npz
T=$(window 1800 9000)
if [ -f "$BASE" ] && [ -n "$T" ]; then
  stamp "B: ang 0.05 fine-tune of the v2scratch base"
  for i in 1 2 3; do
    probe
    T=$(window 1800 9000); [ -z "$T" ] && break
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v2s_aw005 --init_from "$BASE" \
      --val_paths dataset/synthv2_audio_val.npy \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 1e-4 --wav_weight 1.0 --ang_weight 0.05 \
      --max_steps 2048 --ckpt_light --ckpt_every 256 --val_every 1024 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "B attempt $i exited nonzero; resume retry"
    sleep 120
  done
  T=$(window 1500 7200)
  if [ -n "$T" ]; then
    probe
    timeout "$T" python benchmarks/ckpt_select.py \
      --run runs/v2s_aw005 --data dataset/synthv2_audio_val.npy \
      --gl_iters 8 --refine_iters 1,2 \
      --out docs/results/select_v2s_aw005.json
  fi
  stamp "B done"
else
  stamp "B skipped: base missing or deadline too close"
fi

stamp "FOLLOWUP ALL DONE"
