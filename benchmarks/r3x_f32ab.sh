#!/bin/bash
# Master-dtype A/B — gated behind the v1 polish queue (/tmp/r3x_v1p.pid).
# The r3x session found --init_from warm starts had been loading bf16
# conv masters since the serving-upload-cast change (fixed: train/loop.py
# _load_init_f32). The committed v2 flagship lineage fine-tuned with bf16
# masters (pure 0.10931 @1536 after extension); this arm re-runs the
# EXACT same recipe from the same adaptation checkpoint with f32 masters:
# same data, steps, lr — only the master precision differs.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
DEADLINE=${PHASEGEN_Q_DEADLINE:-$(( $(date +%s) + 28800 ))}
stamp() { echo "$(date -u +%FT%TZ) r3x-f32: $1" >> "$STATUS"; }
remain() { echo $(( DEADLINE - $(date +%s) )); }
window() {
  local min_s=$1 cap=$2 r; r=$(remain)
  if [ "$r" -lt "$min_s" ]; then echo ""; else
    [ "$r" -lt "$cap" ] && echo "$r" || echo "$cap"; fi
}
probe() {
  # cooperative chip yield (obs/watchdog.py): bench.py touches this to
  # claim the chip at round end; park instead of contending
  STOPQ="${PHASEGEN_STOP_FILE-/tmp/q_stop}"; [ -n "$STOPQ" ] && [ -f "$STOPQ" ] && { stamp "stop file present; parking"; exit 0; }
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

PID=$(cat /tmp/r3x_v1p.pid 2>/dev/null)
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 120; done
fi
stamp "queues drained; f32-master A/B starts (remain=$(remain)s)"

ADAPT=runs/v2adapt_612m/ckpt_4096_light.npz
T=$(window 1800 7200)
if [ -n "$T" ] && [ -f "$ADAPT" ] \
   && [ ! -f runs/v2_aw00_f32/ckpt_2560_light.npz ]; then
  stamp "1: wav/ang0.0 fine-tune with f32 masters (cap ${T}s)"
  for i in 1 2; do
    probe
    T=$(window 1800 7200); [ -z "$T" ] && break
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v2_aw00_f32 --init_from "$ADAPT" \
      --val_paths dataset/synthv2_audio_val.npy \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 1e-4 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 2560 --ckpt_light --ckpt_every 512 --val_every 512 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "1 attempt $i exited nonzero; resume retry"
    sleep 120
  done
  stamp "1 done"
fi

SEL=docs/results/select_v2_aw00_f32.json
T=$(window 900 5400)
if [ -n "$T" ] && [ ! -f "$SEL" ] \
   && ls runs/v2_aw00_f32/ckpt_*_light.npz >/dev/null 2>&1; then
  stamp "2: full-shard select (A/B column vs select_v2ext_aw00.json)"
  probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/v2_aw00_f32 --data dataset/synthv2_audio_val.npy \
    --gl_iters 8 --refine_iters 1 --out "$SEL"
  [ -f "$SEL" ] && commit_art \
    "f32-master fine-tune A/B: full-shard select" "$SEL"
  stamp "2 done"
fi

# promote: official eval + commit npz only if f32 beat the bf16 lineage
BEST=$(python -c "
import json
try:
    s = json.load(open('$SEL'))
    print(s['best'] if s['best_mse'] < 0.10931 else '')
except Exception:
    print('')")
T=$(window 1800 6000)
if [ -n "$BEST" ] && [ -f "$BEST" ] && [ -n "$T" ]; then
  stamp "3: f32 masters WON (<0.10931); official GL-250 eval of $BEST"
  probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data dataset/synthv2_audio_val.npy --weight "$BEST" \
    --batch_size 64 --gl_iters 250 --refine_iters 1,2 \
    --out docs/results/eval_v2_f32_winner.json \
    && commit_art "official GL-250 eval: f32-master v2 flagship" \
         docs/results/eval_v2_f32_winner.json "$BEST"
  stamp "3 done"
fi

stamp "F32 A/B DONE (remain=$(remain)s)"
