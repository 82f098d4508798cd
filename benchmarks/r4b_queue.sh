#!/bin/bash
# Round-4 repacked chip queue. The original r4_queue ladder (v3
# curriculum before the cheap stages) could not fit the remaining chip
# window and would have starved the small high-value artifacts, so this
# queue reorders by value-per-chip-minute:
#
#   A. finish the v2 adaptation regen (resumes from the cooperative
#      yield checkpoint; committed VERDICT-r3 harvest deliverable and
#      the lineage base for round-5's f32 A/B + v3 curriculum)
#   B. real-audio track-held-out fine-tune ladder (closes VERDICT r3 #3:
#      train AND evaluate on recorded audio)
#   C. 2.85B hi-res single-chip serving bench (VERDICT r3 #6 last piece)
#   D. v1 flagship honest re-eval under per-clip GL normalization
#   E. v2 plateau polish + select (VERDICT r3 #2 harvest item; last —
#      the only stage that can be cut without losing a headline)
#
# The v3 adaptation/fine-tune/eval stages move to round 5 (NEXT.md).
# Contract: waits for the previous campaign pid, rm -f stop file at
# start, probes at every gate, registers /tmp/r4b.pid, none alive at
# round end.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
STOPF="${PHASEGEN_STOP_FILE-/tmp/q_stop}"
DEADLINE=${PHASEGEN_Q_DEADLINE:-$(( $(date +%s) + 16200 ))}
FLAGSHIP=runs/v2_aw00/ckpt_1536_light.npz
V2VAL=dataset/synthv2_audio_val.npy
V1VAL=dataset/synth_audio_val.npy
V1W=runs/v1_aw00/ckpt_768_light.npz
ADAPT=runs/v2adapt_612m/ckpt_4096_light.npz

echo $$ > /tmp/r4b.pid
trap 'rm -f /tmp/r4b.pid' EXIT

stamp() { echo "$(date -u +%FT%TZ) r4b: $1" >> "$STATUS"; }
remain() { echo $(( DEADLINE - $(date +%s) )); }
window() {
  local min_s=$1 cap=$2 r; r=$(remain)
  if [ "$r" -lt "$min_s" ]; then echo ""; else
    [ "$r" -lt "$cap" ] && echo "$r" || echo "$cap"; fi
}
probe() {
  [ -n "$STOPF" ] && [ -f "$STOPF" ] && { stamp "stop file present; parking"; exit 0; }
  until timeout 700 python -c \
    "from phasegen_tpu.obs.watchdog import device_liveness_probe as p; p()"
  do
    stamp "backend down; retry in 300 s"
    [ -n "$STOPF" ] && [ -f "$STOPF" ] && { stamp "stop during outage; parking"; exit 0; }
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

# ---- wait for the previous campaign to fully exit ---------------------------
stamp "r4b waiting on previous campaign (deadline=$DEADLINE)"
for f in /tmp/r4.pid /tmp/r4t.pid; do
  while [ -f "$f" ] && kill -0 "$(cat "$f" 2>/dev/null)" 2>/dev/null; do
    sleep 30
    [ "$(remain)" -lt 900 ] && { stamp "deadline while waiting; exit"; exit 0; }
  done
done
rm -f "$STOPF"   # fresh campaign
stamp "previous campaign drained; r4b starting (remain=$(remain)s)"

# --- A: finish the v2 adaptation regen (auto-resumes from yield ckpt) --------
if [ ! -f "$ADAPT" ]; then
  for i in 1 2; do
    T=$(window 1800 7200); [ -z "$T" ] && break
    stamp "A: v2 adaptation resume attempt $i (cap ${T}s)"; probe
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v2adapt_612m --init_from runs/v1base_612m/ckpt_20480_light.npz \
      --val_paths "$V2VAL" \
      --synth_train 98304 --synth_version 2 --batch_size 256 --lr 1e-4 \
      --max_steps 4096 --ckpt_light --ckpt_every 1024 --val_every 1024 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    sleep 60
  done
  [ -f "$ADAPT" ] && commit_art "v2 adaptation regen (4096 ref-loss steps from the v1 base)" "$ADAPT"
  stamp "A done"
fi

# --- B: real-audio track-held-out fine-tune ladder ---------------------------
if [ -f dataset/realtrain_audio_train.npy ] \
   && [ ! -f runs/realft_612m/ckpt_256_light.npz ]; then
  T=$(window 900 2400)
  if [ -n "$T" ]; then
    stamp "B1: real-audio fine-tune (track-held-out, cap ${T}s)"; probe
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/realft_612m --init_from "$FLAGSHIP" \
      --train_paths dataset/realtrain_audio_train.npy \
      --val_paths dataset/realheld_audio_val.npy \
      --batch_size 32 --val_batch_size 31 \
      --lr 3e-5 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 256 --ckpt_light --ckpt_every 64 --val_every 64 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media
    stamp "B1 done"
  fi
fi
SELR=docs/results/select_realft.json
T=$(window 600 3600)
if [ -n "$T" ] && [ ! -f "$SELR" ] \
   && ls runs/realft_612m/ckpt_*_light.npz >/dev/null 2>&1; then
  stamp "B2: real-ft select on held-out track"; probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/realft_612m --data dataset/realheld_audio_val.npy \
    --batch_size 31 --gl_iters 8 --refine_iters 1 --out "$SELR"
  [ -f "$SELR" ] && commit_art "real-audio fine-tune: held-out-track select" "$SELR"
fi
RWIN=$(python -c "
import json
try:
    print(json.load(open('$SELR'))['best'])
except Exception:
    print('')")
T=$(window 600 3600)
if [ -n "$RWIN" ] && [ -f "$RWIN" ] && [ -n "$T" ] \
   && [ ! -f docs/results/eval_realft_held.json ]; then
  stamp "B3: GL-250 eval real-ft winner + zero-shot baseline on held track"; probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data dataset/realheld_audio_val.npy --weight "$RWIN" \
    --batch_size 31 --gl_iters 250 --refine_iters 1,2 \
    --out docs/results/eval_realft_held.json
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data dataset/realheld_audio_val.npy --weight "$FLAGSHIP" \
    --batch_size 31 --gl_iters 250 --refine_iters 1,2 \
    --out docs/results/eval_real_zeroshot_held.json
  commit_art "real-audio held-out-track evals (fine-tuned vs zero-shot)" \
    docs/results/eval_realft_held.json \
    docs/results/eval_real_zeroshot_held.json "$RWIN"
  stamp "B done"
fi

# --- C: 2.85B hi-res single-chip serving bench -------------------------------
EV=docs/results/serve_2850m_r4.jsonl
T=$(window 900 2700)
if [ -n "$T" ] && [ ! -f "$EV" ]; then
  stamp "C: 2.85B hi-res serving bench (cap ${T}s)"; probe
  timeout "$T" python benchmarks/serve_2850m.py --batches 4,8,16 --out "$EV" \
    && commit_art "2.85B hi-res stereo serving bench (single chip, bf16)" "$EV"
  stamp "C done"
fi

# --- D: v1 flagship honest re-eval (per-clip GL normalization) ---------------
if [ ! -f "$V1VAL" ]; then
  T=$(window 600 3600)
  if [ -n "$T" ]; then
    stamp "D1: v1 val shard regen (cap ${T}s)"; probe
    timeout "$T" python -m phasegen_tpu.cli.make_corpus \
      --out_dir dataset --name synth --n_train 98304 --n_val 1024 --version 1
  fi
fi
EV=docs/results/eval_v1rebuild_winner_r4.json
T=$(window 1200 4500)
if [ -n "$T" ] && [ ! -f "$EV" ] && [ -f "$V1VAL" ] && [ -f "$V1W" ]; then
  stamp "D2: v1 flagship GL-250 re-eval, per-clip norm (cap ${T}s)"; probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data "$V1VAL" --weight "$V1W" \
    --batch_size 64 --gl_iters 250 --refine_iters 1,2 --out "$EV" \
    && commit_art "v1 flagship re-eval under per-clip GL normalization" "$EV"
  stamp "D done"
fi

# --- E: v2 plateau polish (lr 3e-5 from the flagship peak) --------------------
if [ ! -f runs/v2polish/ckpt_1024_light.npz ]; then
  T=$(window 1800 4500)
  if [ -n "$T" ]; then
    stamp "E1: v2 polish lr3e-5 (cap ${T}s)"; probe
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v2polish --init_from "$FLAGSHIP" \
      --val_paths "$V2VAL" \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 3e-5 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 1024 --ckpt_light --ckpt_every 256 --val_every 256 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media
    stamp "E1 done"
  fi
fi
SELP=docs/results/select_v2polish_lr3e5.json
T=$(window 600 4500)
if [ -n "$T" ] && [ ! -f "$SELP" ] \
   && ls runs/v2polish/ckpt_*_light.npz >/dev/null 2>&1; then
  stamp "E2: polish select"; probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/v2polish --data "$V2VAL" \
    --gl_iters 8 --refine_iters 1 --out "$SELP"
  [ -f "$SELP" ] && commit_art "v2 plateau polish (lr 3e-5): full-shard select" "$SELP"
  stamp "E done"
fi

stamp "R4B QUEUE DONE (remain=$(remain)s)"
