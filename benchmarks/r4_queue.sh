#!/bin/bash
# Round-4 chip campaign (single detached queue; one chip client at a time).
#
# Value order: cheap headline evals first (new SI-SDR/SC columns on the
# flagship; zero-shot real-audio + v3 off-home-field evals), then the
# training ladder (v2 adaptation regen -> v3 curriculum -> wav ft ->
# select -> official eval -> cross-corpus controls), then the extras
# (real-audio fine-tune, 2.85B serving bench, v2 polish, f32 lineage).
#
# Contract (docs/OPERATIONS.md "Cooperative chip handoff"):
#   * rm -f the stop file at campaign start (fresh campaign),
#   * honor it at every gate via probe(),
#   * register /tmp/r4.pid so request_queue_yield can find (and if
#     needed SIGTERM) us,
#   * remove the pid file on exit — no live queue at round end.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
STOPF="${PHASEGEN_STOP_FILE-/tmp/q_stop}"
DEADLINE=${PHASEGEN_Q_DEADLINE:-$(( $(date +%s) + 21600 ))}
FLAGSHIP=runs/v2_aw00/ckpt_1536_light.npz
V2VAL=dataset/synthv2_audio_val.npy
V3VAL=dataset/synthv3_audio_val.npy

echo $$ > /tmp/r4.pid
trap 'rm -f /tmp/r4.pid' EXIT
rm -f "$STOPF"   # fresh campaign (ADVICE r3 high finding)

stamp() { echo "$(date -u +%FT%TZ) r4: $1" >> "$STATUS"; }
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

stamp "campaign start (deadline=$DEADLINE remain=$(remain)s)"

# --- 0: shards ---------------------------------------------------------------
if [ ! -f "$V2VAL" ]; then
  T=$(window 900 3600)
  if [ -n "$T" ]; then
    stamp "0a: v2 val shard regen (cap ${T}s)"; probe
    timeout "$T" python -m phasegen_tpu.cli.make_corpus \
      --out_dir dataset --name synthv2 --n_train 98304 --n_val 1024 --version 2
  fi
fi
if [ ! -f dataset/real_audio_val.npy ]; then
  stamp "0b: real-audio shards regen (host)"
  timeout 1200 python benchmarks/real_audio_prep.py
  timeout 1800 python -m phasegen_tpu.cli.preproc --genres real \
    --wav_dir dataset/real_wavs --out_dir dataset --n_val 100000 --stft host
  timeout 1800 python -m phasegen_tpu.cli.preproc --genres realtrain \
    --wav_dir dataset/real_wavs --out_dir dataset --n_val 0 --stft host
  timeout 1800 python -m phasegen_tpu.cli.preproc --genres realheld \
    --wav_dir dataset/real_wavs --out_dir dataset --n_val 100000 --stft host
fi

# --- 1: flagship official re-eval with the new robust columns ----------------
EV=docs/results/eval_v2ext_winner_r4.json
T=$(window 1200 4500)
if [ -n "$T" ] && [ ! -f "$EV" ] && [ -f "$V2VAL" ]; then
  stamp "1: flagship GL-250 re-eval w/ SI-SDR+SC (cap ${T}s)"; probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data "$V2VAL" --weight "$FLAGSHIP" \
    --batch_size 64 --gl_iters 250 --refine_iters 1,2 --out "$EV" \
    && commit_art "official flagship re-eval: SI-SDR + spectral-convergence columns" "$EV"
  stamp "1 done"
fi

# --- 2: zero-shot real-audio eval (off home field, VERDICT r3 #3) -------------
EV=docs/results/eval_real_zeroshot.json
T=$(window 900 3600)
if [ -n "$T" ] && [ ! -f "$EV" ] && [ -f dataset/real_audio_val.npy ]; then
  stamp "2: zero-shot real-audio GL-250 eval (cap ${T}s)"; probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data dataset/real_audio_val.npy --weight "$FLAGSHIP" \
    --batch_size 64 --gl_iters 250 --refine_iters 1,2,8 --out "$EV" \
    && commit_art "zero-shot eval on recorded audio (pygame/gsutil assets via real preproc path)" "$EV"
  stamp "2 done"
fi

# --- 3: v3 val shard + zero-shot flagship-on-v3 (held-out generator) ----------
T=$(window 900 3600)
if [ -n "$T" ] && [ ! -f "$V3VAL" ]; then
  stamp "3a: v3 val shard (cap ${T}s)"; probe
  timeout "$T" python -m phasegen_tpu.cli.make_corpus \
    --out_dir dataset --name synthv3 --n_train 98304 --n_val 1024 --version 3
fi
EV=docs/results/eval_v2flagship_on_v3.json
T=$(window 1200 4500)
if [ -n "$T" ] && [ ! -f "$EV" ] && [ -f "$V3VAL" ]; then
  stamp "3b: zero-shot flagship on v3 shard (cap ${T}s)"; probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data "$V3VAL" --weight "$FLAGSHIP" \
    --batch_size 64 --gl_iters 250 --refine_iters 1 --out "$EV" \
    && commit_art "zero-shot eval: v2 flagship on the held-out v3 generator family" "$EV"
  stamp "3b done"
fi

# --- 4: v2 adaptation regen (lineage base; lost to the r3 wipe) ---------------
ADAPT=runs/v2adapt_612m/ckpt_4096_light.npz
if [ ! -f "$ADAPT" ]; then
  for i in 1 2; do
    T=$(window 2400 7200); [ -z "$T" ] && break
    stamp "4: v2 adaptation regen attempt $i (cap ${T}s)"; probe
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v2adapt_612m --init_from runs/v1base_612m/ckpt_20480_light.npz \
      --val_paths "$V2VAL" \
      --synth_train 98304 --synth_version 2 --batch_size 256 --lr 1e-4 \
      --max_steps 4096 --ckpt_light --ckpt_every 1024 --val_every 1024 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    sleep 60
  done
  [ -f "$ADAPT" ] && commit_art "v2 adaptation regen (4096 ref-loss steps from the v1 base)" "$ADAPT"
  stamp "4 done"
fi

# --- 5: v3 adaptation ---------------------------------------------------------
ADAPT3=runs/v3adapt_612m/ckpt_4096_light.npz
if [ -f "$ADAPT" ] && [ -f "$V3VAL" ] && [ ! -f "$ADAPT3" ]; then
  for i in 1 2; do
    T=$(window 2400 7200); [ -z "$T" ] && break
    stamp "5: v3 adaptation attempt $i (cap ${T}s)"; probe
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v3adapt_612m --init_from "$ADAPT" \
      --val_paths "$V3VAL" \
      --synth_train 98304 --synth_version 3 --batch_size 256 --lr 1e-4 \
      --max_steps 4096 --ckpt_light --ckpt_every 1024 --val_every 1024 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    sleep 60
  done
  [ -f "$ADAPT3" ] && commit_art "v3 adaptation (4096 ref-loss steps from the v2 adaptation)" "$ADAPT3"
  stamp "5 done"
fi

# --- 6: v3 wav/ang0.0 fine-tune (the proven recipe) ----------------------------
if [ -f "$ADAPT3" ] && [ ! -f runs/v3_aw00/ckpt_2048_light.npz ]; then
  for i in 1 2; do
    T=$(window 1200 5400); [ -z "$T" ] && break
    stamp "6: v3 wav/ang0.0 fine-tune attempt $i (cap ${T}s)"; probe
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v3_aw00 --init_from "$ADAPT3" \
      --val_paths "$V3VAL" \
      --synth_train 98304 --synth_version 3 --batch_size 256 \
      --lr 1e-4 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 2048 --ckpt_light --ckpt_every 512 --val_every 512 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    sleep 60
  done
  stamp "6 done"
fi

# --- 7: v3 select + official eval + cross-corpus control -----------------------
SEL=docs/results/select_v3_aw00.json
T=$(window 900 5400)
if [ -n "$T" ] && [ ! -f "$SEL" ] \
   && ls runs/v3_aw00/ckpt_*_light.npz >/dev/null 2>&1; then
  stamp "7a: v3 full-shard select (cap ${T}s)"; probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/v3_aw00 --data "$V3VAL" \
    --gl_iters 8 --refine_iters 1 --out "$SEL"
  [ -f "$SEL" ] && commit_art "v3 wav/ang0.0 fine-tune: full-shard select" "$SEL"
fi
WINNER=$(python -c "
import json
try:
    print(json.load(open('$SEL'))['best'])
except Exception:
    print('')")
EV=docs/results/eval_v3_winner.json
T=$(window 1800 6000)
if [ -n "$WINNER" ] && [ -f "$WINNER" ] && [ -n "$T" ] && [ ! -f "$EV" ]; then
  stamp "7b: official GL-250 eval of $WINNER (cap ${T}s)"; probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data "$V3VAL" --weight "$WINNER" \
    --batch_size 64 --gl_iters 250 --refine_iters 1,2 --out "$EV" \
    && commit_art "official GL-250 eval: v3 curriculum flagship" "$EV" "$WINNER"
fi
T=$(window 900 3600)
if [ -n "$WINNER" ] && [ -f "$WINNER" ] && [ -n "$T" ] && [ -f "$V2VAL" ] \
   && [ ! -f docs/results/eval_v3_winner_on_v2.json ]; then
  stamp "7c: cross-corpus control (v3 winner on v2 shard)"; probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data "$V2VAL" --weight "$WINNER" \
    --batch_size 64 --gl_iters 8 --refine_iters 1 \
    --out docs/results/eval_v3_winner_on_v2.json \
    && commit_art "cross-corpus control: v3 winner on the v2 shard" \
         docs/results/eval_v3_winner_on_v2.json
  stamp "7 done"
fi

# --- 8: real-audio track-held-out fine-tune ------------------------------------
if [ -f dataset/realtrain_audio_train.npy ] \
   && [ ! -f runs/realft_612m/ckpt_256_light.npz ]; then
  T=$(window 900 2400)
  if [ -n "$T" ]; then
    stamp "8a: real-audio fine-tune (track-held-out, cap ${T}s)"; probe
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/realft_612m --init_from "$FLAGSHIP" \
      --train_paths dataset/realtrain_audio_train.npy \
      --val_paths dataset/realheld_audio_val.npy \
      --batch_size 32 --val_batch_size 31 \
      --lr 3e-5 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 256 --ckpt_light --ckpt_every 64 --val_every 64 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media
    stamp "8a done"
  fi
fi
SELR=docs/results/select_realft.json
T=$(window 900 3600)
if [ -n "$T" ] && [ ! -f "$SELR" ] \
   && ls runs/realft_612m/ckpt_*_light.npz >/dev/null 2>&1; then
  stamp "8b: real-ft select on held-out track"; probe
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
T=$(window 900 3600)
if [ -n "$RWIN" ] && [ -f "$RWIN" ] && [ -n "$T" ] \
   && [ ! -f docs/results/eval_realft_held.json ]; then
  stamp "8c: GL-250 eval real-ft winner + zero-shot baseline on held track"; probe
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
  stamp "8 done"
fi

# --- 9: 2.85B hi-res single-chip serving bench ---------------------------------
EV=docs/results/serve_2850m_r4.jsonl
T=$(window 900 2700)
if [ -n "$T" ] && [ ! -f "$EV" ]; then
  stamp "9: 2.85B hi-res serving bench (cap ${T}s)"; probe
  timeout "$T" python benchmarks/serve_2850m.py --batches 4,8,16 --out "$EV" \
    && commit_art "2.85B hi-res stereo serving bench (single chip, bf16)" "$EV"
  stamp "9 done"
fi

# --- 10: v2 plateau polish (lr 3e-5 from the flagship peak) ---------------------
if [ ! -f runs/v2polish/ckpt_1024_light.npz ]; then
  T=$(window 1800 4500)
  if [ -n "$T" ]; then
    stamp "10a: v2 polish lr3e-5 (cap ${T}s)"; probe
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v2polish --init_from "$FLAGSHIP" \
      --val_paths "$V2VAL" \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 3e-5 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 1024 --ckpt_light --ckpt_every 256 --val_every 256 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media
    stamp "10a done"
  fi
fi
SELP=docs/results/select_v2polish_lr3e5.json
T=$(window 900 4500)
if [ -n "$T" ] && [ ! -f "$SELP" ] \
   && ls runs/v2polish/ckpt_*_light.npz >/dev/null 2>&1; then
  stamp "10b: polish select"; probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/v2polish --data "$V2VAL" \
    --gl_iters 8 --refine_iters 1 --out "$SELP"
  [ -f "$SELP" ] && commit_art "v2 plateau polish (lr 3e-5): full-shard select" "$SELP"
  stamp "10 done"
fi

stamp "R4 QUEUE DONE (remain=$(remain)s)"
