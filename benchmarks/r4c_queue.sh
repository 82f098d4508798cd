#!/bin/bash
# Round-4 continuation queue (session after the THIRD container wipe).
#
# The wipe took /tmp, dataset/, and runs/realft_612m mid-campaign; the
# committed artifacts (select_realft.json, v2 adaptation npz, flagship
# npzs) survived. This queue regenerates the wiped shards and re-runs
# exactly the r4b stages whose docs/results artifacts never landed:
#
#   0. shards: v2 val, real-audio wavs+shards (host STFT), v1 val
#   B. real-audio track-held-out fine-tune -> select -> GL-250 evals
#      (fine-tuned winner + zero-shot flagship on the held track)
#   D. v1 flagship honest re-eval under per-clip GL normalization
#   C. 2.85B hi-res single-chip serving bench
#   E. v2 plateau polish (lr 3e-5) + full-shard select
#   F. spectral-consistency aux-loss probe (--sc_weight 0.3 fine-tune,
#      NEXT.md round-5 lead #3 pulled forward; cut first by deadline)
#
# Contract (docs/OPERATIONS.md "Cooperative chip handoff"): rm -f stop
# file at campaign start, probe() at every gate, register /tmp/r4c.pid,
# pid file removed on exit, dead before round end.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
STOPF="${PHASEGEN_STOP_FILE-/tmp/q_stop}"
DEADLINE=${PHASEGEN_Q_DEADLINE:-$(( $(date +%s) + 9000 ))}
FLAGSHIP=runs/v2_aw00/ckpt_1536_light.npz
V2VAL=dataset/synthv2_audio_val.npy
V1VAL=dataset/synth_audio_val.npy
V1W=runs/v1_aw00/ckpt_768_light.npz

echo $$ > /tmp/r4c.pid
trap 'rm -f /tmp/r4c.pid' EXIT

stamp() { echo "$(date -u +%FT%TZ) r4c: $1" >> "$STATUS"; }
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

stamp "r4c campaign start (deadline=$DEADLINE remain=$(remain)s)"
rm -f "$STOPF"   # fresh campaign

# --- 0: shards ---------------------------------------------------------------
if [ ! -f "$V2VAL" ]; then
  T=$(window 900 3600)
  if [ -n "$T" ]; then
    stamp "0a: v2 val shard regen (cap ${T}s)"; probe
    timeout "$T" python -m phasegen_tpu.cli.make_corpus \
      --out_dir dataset --name synthv2 --n_train 98304 --n_val 1024 --version 2
    stamp "0a done"
  fi
fi
if [ ! -f dataset/realheld_audio_val.npy ]; then
  stamp "0b: real-audio shards regen (host)"
  timeout 1200 python benchmarks/real_audio_prep.py
  timeout 1800 python -m phasegen_tpu.cli.preproc --genres realtrain \
    --wav_dir dataset/real_wavs --out_dir dataset --n_val 0 --stft host
  timeout 1800 python -m phasegen_tpu.cli.preproc --genres realheld \
    --wav_dir dataset/real_wavs --out_dir dataset --n_val 100000 --stft host
  stamp "0b done"
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
# The r4b select picked step 64 on the pre-wipe run (same recipe, same
# data, same seeds — deterministic); re-select to be safe since the
# checkpoint bytes were regenerated.
SELR=docs/results/select_realft.json
T=$(window 600 2400)
if [ -n "$T" ] && ls runs/realft_612m/ckpt_*_light.npz >/dev/null 2>&1 \
   && [ ! -f runs/realft_612m/.select_done ]; then
  stamp "B2: real-ft select on held-out track"; probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/realft_612m --data dataset/realheld_audio_val.npy \
    --batch_size 31 --gl_iters 8 --refine_iters 1 --out "$SELR" \
    && touch runs/realft_612m/.select_done
  [ -f "$SELR" ] && commit_art "real-audio fine-tune: held-out-track select (post-wipe regen)" "$SELR"
fi
RWIN=$(python -c "
import json
try:
    print(json.load(open('$SELR'))['best'])
except Exception:
    print('')")
T=$(window 600 2400)
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

# --- D: v1 flagship honest re-eval (per-clip GL normalization) ---------------
if [ ! -f "$V1VAL" ]; then
  T=$(window 900 3600)
  if [ -n "$T" ]; then
    stamp "D1: v1 val shard regen (cap ${T}s)"; probe
    timeout "$T" python -m phasegen_tpu.cli.make_corpus \
      --out_dir dataset --name synth --n_train 98304 --n_val 1024 --version 1
    stamp "D1 done"
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

# --- C: 2.85B hi-res single-chip serving bench -------------------------------
EV=docs/results/serve_2850m_r4.jsonl
T=$(window 1500 3000)
if [ -n "$T" ] && [ ! -f "$EV" ]; then
  stamp "C: 2.85B hi-res serving bench (cap ${T}s)"; probe
  timeout "$T" python benchmarks/serve_2850m.py --batches 4,8,16 --out "$EV"
  [ -s "$EV" ] && commit_art "2.85B hi-res stereo serving bench (single chip, bf16)" "$EV"
  stamp "C done"
fi

# --- E: v2 plateau polish (lr 3e-5 from the flagship peak) --------------------
if [ ! -f runs/v2polish/ckpt_1024_light.npz ] && [ -f "$V2VAL" ]; then
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
T=$(window 900 4500)
if [ -n "$T" ] && [ ! -f "$SELP" ] \
   && ls runs/v2polish/ckpt_*_light.npz >/dev/null 2>&1; then
  stamp "E2: polish select"; probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/v2polish --data "$V2VAL" \
    --gl_iters 8 --refine_iters 1 --out "$SELP"
  [ -f "$SELP" ] && commit_art "v2 plateau polish (lr 3e-5): full-shard select" "$SELP"
  stamp "E done"
fi

# --- F: spectral-consistency aux-loss probe (--sc_weight 0.3) -----------------
# NEXT.md lead #3: does the differentiable scale-optimal sin^2 SC loss
# drop spectral convergence while holding MAE? Flagship fine-tune
# recipe + sc_weight 0.3, short ladder, full-shard select w/ SC columns.
if [ ! -f runs/v2sc03/ckpt_512_light.npz ] && [ -f "$V2VAL" ]; then
  T=$(window 1500 3000)
  if [ -n "$T" ]; then
    stamp "F1: sc_weight 0.3 fine-tune (cap ${T}s)"; probe
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v2sc03 --init_from "$FLAGSHIP" \
      --val_paths "$V2VAL" \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 3e-5 --wav_weight 1.0 --ang_weight 0.0 --sc_weight 0.3 \
      --max_steps 512 --ckpt_light --ckpt_every 128 --val_every 128 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media
    stamp "F1 done"
  fi
fi
SELS=docs/results/select_v2sc03.json
T=$(window 900 3600)
if [ -n "$T" ] && [ ! -f "$SELS" ] \
   && ls runs/v2sc03/ckpt_*_light.npz >/dev/null 2>&1; then
  stamp "F2: sc probe select"; probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/v2sc03 --data "$V2VAL" \
    --gl_iters 8 --refine_iters 1 --out "$SELS"
  [ -f "$SELS" ] && commit_art "spectral-consistency aux-loss probe (sc_weight 0.3): select" "$SELS"
  stamp "F done"
fi

stamp "R4C QUEUE DONE (remain=$(remain)s)"
