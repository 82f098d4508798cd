#!/bin/bash
# Round-4 final-session queue: SHORT-BUDGET v3 curriculum arm.
#
# The full ladder (benchmarks/r3x_v3.sh: 4096-step adaptation + 2048-step
# fine-tune) was wiped mid-campaign twice and does not fit this session's
# window. This right-sized arm still answers NEXT.md lead #1's question —
# "how much does v3 adaptation add on top of the v2 flagship's 26.9%
# zero-shot margin?" (docs/results/eval_v2flagship_on_v3.json) — as a
# LOWER BOUND: 1536 adaptation steps + 512 wav/ang0.0 fine-tune steps.
#
#   v3+v2 val shards (val-only; training synthesizes on device)
#   -> v3 adaptation (1536 ref-loss steps from runs/v2adapt_612m/ckpt_4096)
#   -> wav/ang0.0 fine-tune (512 steps, the proven recipe)
#   -> full-shard select (GL-8 proxy)
#   -> official GL-250 eval of the winner (+ paired-bootstrap stats)
#   -> cross-corpus control on the v2 shard.
#
# Contract (OPERATIONS.md): fresh campaign -> rm -f the stop file at
# start; register /tmp/r4g.pid; every stage probes the stop file and the
# deadline; all artifacts committed in place (wipe durability).
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
STOPF="${PHASEGEN_STOP_FILE-/tmp/q_stop}"
DEADLINE=${PHASEGEN_Q_DEADLINE:-$(( $(date +%s) + 2340 ))}

[ -n "$STOPF" ] && rm -f "$STOPF"   # fresh campaign (ADVICE r3, high)
echo $$ > /tmp/r4g.pid
trap 'rm -f /tmp/r4g.pid' EXIT

stamp() { echo "$(date -u +%FT%TZ) r4g: $1" >> "$STATUS"; }
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
    [ -n "$STOPF" ] && [ -f "$STOPF" ] && { stamp "stop during outage; parking"; exit 0; }
    stamp "backend down; retry in 120 s"
    sleep 120
    [ "$(remain)" -lt 300 ] && { stamp "deadline during outage; exit"; exit 0; }
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

stamp "r4g short v3 arm starts (deadline=$DEADLINE, remain=$(remain)s)"

# --- 0: val shards (deterministic regen; training needs no train file) ----
V3VAL=dataset/synthv3_audio_val.npy
V2VAL=dataset/synthv2_audio_val.npy
T=$(window 300 900)
if [ -n "$T" ] && [ ! -f "$V3VAL" ]; then
  stamp "0a: v3 val shard (cap ${T}s)"
  probe
  timeout "$T" python -m phasegen_tpu.cli.make_corpus \
    --out_dir dataset --name synthv3 --n_train 98304 --n_val 1024 \
    --version 3
  stamp "0a done"
fi
T=$(window 300 900)
if [ -n "$T" ] && [ ! -f "$V2VAL" ]; then
  stamp "0b: v2 val shard (cap ${T}s)"
  probe
  timeout "$T" python -m phasegen_tpu.cli.make_corpus \
    --out_dir dataset --name synthv2 --n_train 98304 --n_val 1024 \
    --version 2
  stamp "0b done"
fi

# --- 1: v3 adaptation (short budget) ---------------------------------------
ADAPT=runs/v2adapt_612m/ckpt_4096_light.npz
T=$(window 600 1200)
if [ -n "$T" ] && [ -f "$ADAPT" ] && [ -f "$V3VAL" ] \
   && [ ! -f runs/v3adapt_612m/ckpt_1536_light.npz ]; then
  stamp "1: v3 adaptation (1536 ref-loss steps from $ADAPT, cap ${T}s)"
  for i in 1 2; do
    probe
    T=$(window 600 1200); [ -z "$T" ] && break
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v3adapt_612m --init_from "$ADAPT" \
      --val_paths "$V3VAL" \
      --synth_train 98304 --synth_version 3 --batch_size 256 \
      --lr 1e-4 \
      --max_steps 1536 --ckpt_light --ckpt_every 512 --val_every 768 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "1 attempt $i exited nonzero; resume retry"
    sleep 30
  done
  [ -f runs/v3adapt_612m/ckpt_1536_light.npz ] && commit_art \
    "v3 adaptation base (1536 steps, short-budget arm)" \
    runs/v3adapt_612m/ckpt_1536_light.npz runs/v3adapt_612m/log.json
  stamp "1 done"
fi

# --- 2: wav/ang0.0 fine-tune ------------------------------------------------
ADAPT3=runs/v3adapt_612m/ckpt_1536_light.npz
T=$(window 420 900)
if [ -n "$T" ] && [ -f "$ADAPT3" ] \
   && [ ! -f runs/v3_aw00/ckpt_512_light.npz ]; then
  stamp "2: wav/ang0.0 fine-tune (512 steps, cap ${T}s)"
  for i in 1 2; do
    probe
    T=$(window 420 900); [ -z "$T" ] && break
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v3_aw00 --init_from "$ADAPT3" \
      --val_paths "$V3VAL" \
      --synth_train 98304 --synth_version 3 --batch_size 256 \
      --lr 1e-4 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 512 --ckpt_light --ckpt_every 256 --val_every 512 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "2 attempt $i exited nonzero; resume retry"
    sleep 30
  done
  # Commit the fine-tune's own artifacts immediately (ADVICE r4, medium):
  # leaving them for stage 4's winner commit loses the 512 TPU steps to a
  # container wipe between stages 2 and 4.
  ls runs/v3_aw00/ckpt_*_light.npz >/dev/null 2>&1 && commit_art \
    "v3 wav/ang0.0 fine-tune (short-budget): checkpoints" \
    runs/v3_aw00/ckpt_*_light.npz runs/v3_aw00/log.json
  stamp "2 done"
fi

# --- 3: full-shard select (GL-8 proxy) --------------------------------------
SEL=docs/results/select_v3_aw00.json
T=$(window 300 900)
if [ -n "$T" ] && [ ! -f "$SEL" ] \
   && ls runs/v3_aw00/ckpt_*_light.npz >/dev/null 2>&1; then
  stamp "3: full-shard select (cap ${T}s)"
  probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/v3_aw00 --data "$V3VAL" \
    --gl_iters 8 --refine_iters 1 --out "$SEL"
  [ -f "$SEL" ] && commit_art \
    "v3 wav/ang0.0 fine-tune (short-budget): full-shard select" "$SEL"
  stamp "3 done"
fi

# --- 4: official GL-250 eval of the winner ----------------------------------
WINNER=$(python -c "
import json
try:
    print(json.load(open('$SEL'))['best'])
except Exception:
    print('')")
EVAL=docs/results/eval_v3_winner.json
T=$(window 300 900)
if [ -n "$WINNER" ] && [ -f "$WINNER" ] && [ -n "$T" ] \
   && [ ! -f "$EVAL" ]; then
  stamp "4: official GL-250 eval of $WINNER (cap ${T}s)"
  probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data "$V3VAL" --weight "$WINNER" \
    --batch_size 64 --gl_iters 250 --refine_iters 1 --stats \
    --out "$EVAL" \
    && commit_art "official GL-250 eval: short-budget v3 curriculum arm" \
         "$EVAL" "$WINNER"
  stamp "4 done"
fi

# --- 5: cross-corpus control: v3 arm on the v2 shard -------------------------
T=$(window 240 600)
if [ -n "$WINNER" ] && [ -f "$WINNER" ] && [ -n "$T" ] \
   && [ -f "$V2VAL" ] \
   && [ ! -f docs/results/eval_v3_winner_on_v2.json ]; then
  stamp "5: cross-corpus eval of the v3 arm on the v2 shard (cap ${T}s)"
  probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data "$V2VAL" --weight "$WINNER" \
    --batch_size 64 --gl_iters 8 --refine_iters 1 \
    --out docs/results/eval_v3_winner_on_v2.json \
    && commit_art "cross-corpus control: short-budget v3 arm on the v2 shard" \
         docs/results/eval_v3_winner_on_v2.json
  stamp "5 done"
fi

stamp "R4G DONE (remain=$(remain)s)"
