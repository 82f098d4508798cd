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
# the same liveness-gated probe discipline.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
stamp() { echo "$(date -u +%FT%TZ) followup: $1" >> "$STATUS"; }

probe() {
  until timeout 700 python -c \
    "from phasegen_tpu.obs.watchdog import device_liveness_probe as p; p()"
  do
    stamp "backend down; retry in 300 s"
    sleep 300
  done
}

# Wait for the main pipeline to release the chip.
MAIN_PID=$(cat /tmp/pipeline.pid 2>/dev/null)
if [ -n "$MAIN_PID" ]; then
  while kill -0 "$MAIN_PID" 2>/dev/null; do sleep 60; done
fi
stamp "main pipeline exited; starting follow-up"

stamp "A: wav-only from-scratch base (20480 steps)"
for i in 1 2 3 4; do
  probe
  timeout 18000 python -m phasegen_tpu.cli.train \
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
stamp "A train done"

probe
timeout 10800 python benchmarks/ckpt_select.py \
  --run runs/v2wavscratch_612m --data dataset/synthv2_audio_val.npy \
  --gl_iters 8 --refine_iters 1,2 \
  --out docs/results/select_v2wavscratch.json
stamp "A select done"

BASE=runs/v2scratch_612m/ckpt_20480_light.npz
if [ -f "$BASE" ]; then
  stamp "B: ang 0.05 fine-tune of the v2scratch base"
  for i in 1 2 3; do
    probe
    timeout 9000 python -m phasegen_tpu.cli.train \
      --log_dir runs/v2s_aw005 --init_from "$BASE" \
      --val_paths dataset/synthv2_audio_val.npy \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 1e-4 --wav_weight 1.0 --ang_weight 0.05 \
      --max_steps 2048 --ckpt_light --ckpt_every 256 --val_every 1024 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "B attempt $i exited nonzero; resume retry"
    sleep 120
  done
  probe
  timeout 10800 python benchmarks/ckpt_select.py \
    --run runs/v2s_aw005 --data dataset/synthv2_audio_val.npy \
    --gl_iters 8 --refine_iters 1,2 \
    --out docs/results/select_v2s_aw005.json
  stamp "B done"
else
  stamp "B skipped: base checkpoint missing"
fi

stamp "FOLLOWUP ALL DONE"
