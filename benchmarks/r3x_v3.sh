#!/bin/bash
# v3 (music-structure corpus) pipeline — gated behind the harvest queue
# (/tmp/r3x_harvest.pid) so it never contends for the chip. Extends the
# curriculum that won round 3 decisively (BASELINE.md "v2 from-scratch vs
# adaptation": easy corpus first, adapt to harder): v1 base -> v2
# adaptation -> v3 adaptation -> wav/ang0.0 fine-tune -> select ->
# official GL-250 eval -> cross-corpus control on the v2 shard.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
DEADLINE=${PHASEGEN_Q_DEADLINE:-$(( $(date +%s) + 30600 ))}
stamp() { echo "$(date -u +%FT%TZ) r3x-v3: $1" >> "$STATUS"; }
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

PID=$(cat /tmp/r3x_harvest.pid 2>/dev/null)
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 120; done
fi
stamp "queues drained; v3 pipeline starts (deadline=$DEADLINE, remain=$(remain)s)"

# --- 0: v3 val shard (production geometry) -------------------------------
V3VAL=dataset/synthv3_audio_val.npy
T=$(window 900 3600)
if [ -n "$T" ] && [ ! -f "$V3VAL" ]; then
  stamp "0: v3 val shard (cap ${T}s)"
  probe
  timeout "$T" python -m phasegen_tpu.cli.make_corpus \
    --out_dir dataset --name synthv3 --n_train 98304 --n_val 1024 \
    --version 3
  stamp "0 done"
fi

# --- 1: v3 adaptation from the deeper of the two v2 adaptations ----------
# pick by the wav-ft selects: if the 8k-adaptation fine-tune beat the
# 4k one, the 8k adaptation is the better base for v3 too
ADAPT=$(python - <<'EOF'
import json
try:
    a4 = json.load(open("docs/results/select_v2ext_aw00.json"))["best_mse"]
except Exception:
    a4 = 1e9
try:
    a8 = json.load(open("docs/results/select_v2a8k_aw00.json"))["best_mse"]
except Exception:
    a8 = 1e9
import os
c8 = "runs/v2adapt_612m/ckpt_8192_light.npz"
c4 = "runs/v2adapt_612m/ckpt_4096_light.npz"
print(c8 if (a8 < a4 and os.path.exists(c8)) else c4)
EOF
)
T=$(window 2400 7200)
if [ -n "$T" ] && [ -f "$ADAPT" ] && [ -f "$V3VAL" ] \
   && [ ! -f runs/v3adapt_612m/ckpt_4096_light.npz ]; then
  stamp "1: v3 adaptation (4096 reference-loss steps from $ADAPT, cap ${T}s)"
  for i in 1 2; do
    probe
    T=$(window 2400 7200); [ -z "$T" ] && break
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v3adapt_612m --init_from "$ADAPT" \
      --val_paths "$V3VAL" \
      --synth_train 98304 --synth_version 3 --batch_size 256 \
      --lr 1e-4 \
      --max_steps 4096 --ckpt_light --ckpt_every 1024 --val_every 1024 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "1 attempt $i exited nonzero; resume retry"
    sleep 120
  done
  stamp "1 done"
fi

# --- 2: wav/ang0.0 fine-tune (the proven recipe) --------------------------
ADAPT3=runs/v3adapt_612m/ckpt_4096_light.npz
T=$(window 1200 5400)
if [ -n "$T" ] && [ -f "$ADAPT3" ] \
   && [ ! -f runs/v3_aw00/ckpt_2048_light.npz ]; then
  stamp "2: wav/ang0.0 fine-tune (cap ${T}s)"
  for i in 1 2; do
    probe
    T=$(window 1200 5400); [ -z "$T" ] && break
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v3_aw00 --init_from "$ADAPT3" \
      --val_paths "$V3VAL" \
      --synth_train 98304 --synth_version 3 --batch_size 256 \
      --lr 1e-4 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 2048 --ckpt_light --ckpt_every 512 --val_every 512 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "2 attempt $i exited nonzero; resume retry"
    sleep 120
  done
  stamp "2 done"
fi

# --- 3: full-shard select --------------------------------------------------
SEL=docs/results/select_v3_aw00.json
T=$(window 900 5400)
if [ -n "$T" ] && [ ! -f "$SEL" ] \
   && ls runs/v3_aw00/ckpt_*_light.npz >/dev/null 2>&1; then
  stamp "3: full-shard select"
  probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/v3_aw00 --data "$V3VAL" \
    --gl_iters 8 --refine_iters 1 --out "$SEL"
  [ -f "$SEL" ] && commit_art "v3 wav/ang0.0 fine-tune: full-shard select" \
    "$SEL"
  stamp "3 done"
fi

# --- 4: official GL-250 eval of the winner --------------------------------
WINNER=$(python -c "
import json
try:
    print(json.load(open('$SEL'))['best'])
except Exception:
    print('')")
EVAL=docs/results/eval_v3_winner.json
T=$(window 1800 6000)
if [ -n "$WINNER" ] && [ -f "$WINNER" ] && [ -n "$T" ] \
   && [ ! -f "$EVAL" ]; then
  stamp "4: official GL-250 eval of $WINNER (cap ${T}s)"
  probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data "$V3VAL" --weight "$WINNER" \
    --batch_size 64 --gl_iters 250 --refine_iters 1,2 \
    --out "$EVAL" \
    && commit_art "official GL-250 eval: v3 (music-structure corpus) flagship" \
         "$EVAL" "$WINNER"
  stamp "4 done"
fi

# --- 5: cross-corpus control: v3 flagship on the v2 shard ------------------
T=$(window 1200 5400)
if [ -n "$WINNER" ] && [ -f "$WINNER" ] && [ -n "$T" ] \
   && [ -f dataset/synthv2_audio_val.npy ] \
   && [ ! -f docs/results/eval_v3_winner_on_v2.json ]; then
  stamp "5: cross-corpus eval of the v3 winner on the v2 shard"
  probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data dataset/synthv2_audio_val.npy --weight "$WINNER" \
    --batch_size 64 --gl_iters 8 --refine_iters 1 \
    --out docs/results/eval_v3_winner_on_v2.json \
    && commit_art "cross-corpus eval: v3 flagship on the v2 shard" \
         docs/results/eval_v3_winner_on_v2.json
  stamp "5 done"
fi

stamp "V3 PIPELINE DONE (remain=$(remain)s)"
