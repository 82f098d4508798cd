#!/bin/bash
# Round-3 close-out queue. Replaces r3_followup.sh + r3_queue3.sh (killed):
# the from-scratch experiment those queued is DECIDED (BASELINE.md "v2
# from-scratch vs v1->v2 adaptation" — adaptation wins, wav-only-from-
# scratch dominated), and the second container wipe destroyed every
# v1-family checkpoint, so the highest-value chip work left this round is
# restoring a living flagship with the known-good recipe and committing
# the weights to git (the only wipe-proof store).
#
# Stages (serial, liveness-gated, HARD-DEADLINE-capped like r3_followup):
#   A. v1 612M base rebuild — exact r2 recipe (20,480 steps, B=256,
#      Adam 1e-3 warmup-500 cosine, bf16 mu); commit the 20480 npz.
#   B. wav/ang0.0 fine-tune from the GOOD base (docs/NEXT.md harvest
#      item 1 — the open aw00-on-good-base question; from the degraded
#      40k base it tied the 0.12901 headline with a better refine1).
#   C. full-shard select (gl 8, refine 1,2) -> commit winner npz.
#   D. official GL-250 eval of the winner (+ --refine_pick).
#   E. stretch: v2 adaptation rebuild (4k reference-loss steps on the v2
#      corpus from the v1 base, then wav/ang0.0 1k ft + select) — the
#      lost 0.11297 headline's lineage; lr of the original adaptation is
#      unrecoverable (wiped history), 1e-4 chosen as the fine-tune norm.
#   F. tail (ex-queue3): cross-corpus eval of the v2scratch winner on the
#      v1 shard + serving cold-start probe.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
DEADLINE=${PHASEGEN_Q_DEADLINE:-1787087400}
stamp() { echo "$(date -u +%FT%TZ) closeout: $1" >> "$STATUS"; }

remain() { echo $(( DEADLINE - $(date +%s) )); }
window() {  # min_s cap -> capped timeout or ""
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
# Artifact-only commits (checkpoints / result JSONs), retried once around
# any concurrent index use by the interactive session.
commit_art() {  # msg file...
  local msg=$1; shift
  for i in 1 2; do
    git add -f "$@" && git commit -q -m "$msg

No-Verification-Needed: artifact-only commit (checkpoint/result data)" \
      && return 0
    sleep 10
  done
  stamp "WARN: commit failed: $msg"
}

MAIN_PID=$(cat /tmp/pipeline.pid 2>/dev/null)
if [ -n "$MAIN_PID" ]; then
  while kill -0 "$MAIN_PID" 2>/dev/null; do sleep 60; done
fi
stamp "pipeline exited; starting close-out (deadline=$DEADLINE, remain=$(remain)s)"

# --- A: v1 base rebuild -----------------------------------------------
BASE=runs/v1base_612m/ckpt_20480_light.npz
T=$(window 3600 16200)
if [ -n "$T" ] && [ ! -f "$BASE" ]; then
  stamp "A: v1 base rebuild (20480 steps, cap ${T}s)"
  for i in 1 2 3 4; do
    probe
    T=$(window 3600 16200); [ -z "$T" ] && break
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v1base_612m \
      --val_paths dataset/synth_audio_val.npy \
      --synth_train 98304 --synth_version 1 --batch_size 256 \
      --lr 1e-3 --lr_schedule cosine --warmup_steps 500 --decay_steps 20480 \
      --max_steps 20480 --ckpt_light --ckpt_every 4096 --val_every 2048 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "A attempt $i exited nonzero; resume retry"
    sleep 120
  done
fi
if [ -f "$BASE" ]; then
  commit_art "v1 base rebuilt: 20480-step 612M (r2 recipe) light npz" "$BASE"
  stamp "A done (base committed)"
else
  stamp "A incomplete: base npz missing"
fi

# --- B: aw00 fine-tune from the good base ------------------------------
T=$(window 900 5400)
if [ -f "$BASE" ] && [ -n "$T" ]; then
  stamp "B: wav/ang0.0 fine-tune from v1 base (cap ${T}s)"
  for i in 1 2 3; do
    probe
    T=$(window 900 5400); [ -z "$T" ] && break
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v1_aw00 --init_from "$BASE" \
      --val_paths dataset/synth_audio_val.npy \
      --synth_train 98304 --synth_version 1 --batch_size 256 \
      --lr 1e-4 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 1024 --ckpt_light --ckpt_every 256 --val_every 512 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "B attempt $i exited nonzero; resume retry"
    sleep 120
  done
  stamp "B done"
fi

# --- C: full-shard select + winner commit ------------------------------
SEL=docs/results/select_v1rebuild_aw00.json
T=$(window 900 5400)
if [ -n "$T" ] && ls runs/v1_aw00/ckpt_*_light.npz >/dev/null 2>&1; then
  probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/v1_aw00 --data dataset/synth_audio_val.npy \
    --gl_iters 8 --refine_iters 1,2 --out "$SEL"
  stamp "C select done"
fi
WINNER=""
if [ -f "$SEL" ]; then
  WINNER=$(python -c "import json;print(json.load(open('$SEL'))['best'])")
  [ -f "$WINNER" ] && commit_art \
    "v1 flagship restored: aw00 select winner npz + select table" \
    "$WINNER" "$SEL"
fi

# --- D: official GL-250 eval of the winner -----------------------------
T=$(window 2100 6000)
if [ -n "$WINNER" ] && [ -f "$WINNER" ] && [ -n "$T" ]; then
  stamp "D: official GL-250 eval (cap ${T}s)"
  probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data dataset/synth_audio_val.npy --weight "$WINNER" \
    --batch_size 64 --gl_iters 250 --refine_iters 1,2,4 --refine_pick \
    --out docs/results/eval_v1rebuild_winner.json \
    && commit_art "official GL-250 eval: rebuilt v1 flagship" \
         docs/results/eval_v1rebuild_winner.json
  stamp "D done"
fi

# --- E: stretch — v2 adaptation rebuild --------------------------------
T=$(window 2400 5400)
if [ -f "$BASE" ] && [ -n "$T" ] \
   && [ -f dataset/synthv2_audio_val.npy ]; then
  stamp "E: v2 adaptation (4096 reference-loss steps, cap ${T}s)"
  for i in 1 2; do
    probe
    T=$(window 2400 5400); [ -z "$T" ] && break
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v2adapt_612m --init_from "$BASE" \
      --val_paths dataset/synthv2_audio_val.npy \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 1e-4 \
      --max_steps 4096 --ckpt_light --ckpt_every 1024 --val_every 1024 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "E attempt $i exited nonzero; resume retry"
    sleep 120
  done
  ADAPT=runs/v2adapt_612m/ckpt_4096_light.npz
  T=$(window 900 3600)
  if [ -f "$ADAPT" ] && [ -n "$T" ]; then
    probe
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v2_aw00 --init_from "$ADAPT" \
      --val_paths dataset/synthv2_audio_val.npy \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 1e-4 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 1024 --ckpt_light --ckpt_every 256 --val_every 512 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media
  fi
  SEL2=docs/results/select_v2rebuild_aw00.json
  T=$(window 900 5400)
  if [ -n "$T" ] && ls runs/v2_aw00/ckpt_*_light.npz >/dev/null 2>&1; then
    probe
    timeout "$T" python benchmarks/ckpt_select.py \
      --run runs/v2_aw00 --data dataset/synthv2_audio_val.npy \
      --gl_iters 8 --refine_iters 1,2 --out "$SEL2"
    W2=$(python -c "import json;print(json.load(open('$SEL2'))['best'])" \
         2>/dev/null)
    [ -n "$W2" ] && [ -f "$W2" ] && commit_art \
      "v2 flagship lineage rebuilt: adaptation + aw00 winner npz" \
      "$W2" "$SEL2"
  fi
  stamp "E done"
fi

# --- F: tail (ex-queue3) ------------------------------------------------
V2W=runs/v2s_aw00/ckpt_2048_light.npz
T=$(window 1200 5400)
if [ -f "$V2W" ] && [ -n "$T" ] && [ -f dataset/synth_audio_val.npy ]; then
  stamp "F: cross-corpus eval of the v2scratch winner on the v1 shard"
  probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data dataset/synth_audio_val.npy --weight "$V2W" \
    --batch_size 64 --gl_iters 8 --refine_iters 1 \
    --out docs/results/eval_v2scratch_winner_on_v1.json \
    && commit_art "cross-corpus eval: v2scratch winner on v1 shard" \
         docs/results/eval_v2scratch_winner_on_v1.json
fi
T=$(window 900 2400)
if [ -n "$T" ] && [ -f "$V2W" ]; then
  stamp "F: cold-start probe (dense bf16 upload)"
  probe
  timeout "$T" python benchmarks/stream_coldstart.py --weight "$V2W" \
    > /tmp/q3_coldstart.log 2>&1
fi
stamp "CLOSEOUT ALL DONE (remain=$(remain)s)"
