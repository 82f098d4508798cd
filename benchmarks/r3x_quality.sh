#!/bin/bash
# Round-3 extension queue (continuation session). Motivation, in order of
# expected payoff (BASELINE.md "Round-3 close-out"):
#   A. The rebuilt v2 flagship fine-tune (runs/v2_aw00) was monotonically
#      improving through its LAST checkpoint (pure 0.11011 @1024) — extend
#      it in place to 4,096 steps (constant lr 1e-4, so resume is a
#      seamless continuation) and re-select over all checkpoints.
#   B. The v2 adaptation stage was capped at 4,096 reference-loss steps by
#      the close-out deadline, not by convergence — extend it to 8,192 and
#      run a fresh wav/ang0.0 fine-tune from the deeper adaptation.
#   C. Official GL-250 eval of whichever lineage wins; commit the npz
#      (CLAUDE.md durability rule: git is the only wipe-proof store).
#   D. Preproc device-STFT column (BASELINE.md table row still "pending"
#      since the round-3 backend outage killed that measurement window).
# Serial, liveness-gated, deadline-capped — same pattern as r3_closeout.sh.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
DEADLINE=${PHASEGEN_Q_DEADLINE:-$(( $(date +%s) + 34200 ))}
stamp() { echo "$(date -u +%FT%TZ) r3x: $1" >> "$STATUS"; }

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

stamp "queue start (deadline=$DEADLINE, remain=$(remain)s)"

# --- A: extend the v2 fine-tune in place to 4096 steps ------------------
ADAPT=runs/v2adapt_612m/ckpt_4096_light.npz
T=$(window 1800 7200)
if [ -n "$T" ] && [ ! -f runs/v2_aw00/ckpt_4096_light.npz ]; then
  stamp "A: v2_aw00 fine-tune extension 1024 -> 4096 (cap ${T}s)"
  for i in 1 2; do
    probe
    T=$(window 1800 7200); [ -z "$T" ] && break
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v2_aw00 --init_from "$ADAPT" \
      --val_paths dataset/synthv2_audio_val.npy \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 1e-4 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 4096 --ckpt_light --ckpt_every 512 --val_every 512 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "A attempt $i exited nonzero; resume retry"
    sleep 120
  done
  stamp "A done"
fi

# any checkpoint NEWER than the pre-extension best (1024) justifies a
# re-select — a deadline-truncated extension still trained paid-for steps
newer_than() {  # dir step
  local f s
  for f in "$1"/ckpt_*_light.npz; do
    s=${f##*/ckpt_}; s=${s%_light.npz}
    [ "$s" -gt "$2" ] 2>/dev/null && return 0
  done
  return 1
}

SEL_A=docs/results/select_v2ext_aw00.json
T=$(window 900 5400)
if [ -n "$T" ] && newer_than runs/v2_aw00 1024; then
  stamp "A-select: full-shard select over the extended fine-tune"
  probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/v2_aw00 --data dataset/synthv2_audio_val.npy \
    --gl_iters 8 --refine_iters 1 --out "$SEL_A"
  [ -f "$SEL_A" ] && commit_art \
    "v2 fine-tune extension 1024->4096: full-shard select" "$SEL_A"
  stamp "A-select done"
fi

# --- B: extend the v2 adaptation 4096 -> 8192, fresh fine-tune ----------
T=$(window 2400 9000)
if [ -n "$T" ] && [ ! -f runs/v2adapt_612m/ckpt_8192_light.npz ]; then
  stamp "B: v2 adaptation extension 4096 -> 8192 (cap ${T}s)"
  for i in 1 2; do
    probe
    T=$(window 2400 9000); [ -z "$T" ] && break
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v2adapt_612m --init_from runs/v1base_612m/ckpt_20480_light.npz \
      --val_paths dataset/synthv2_audio_val.npy \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 1e-4 \
      --max_steps 8192 --ckpt_light --ckpt_every 1024 --val_every 1024 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "B attempt $i exited nonzero; resume retry"
    sleep 120
  done
  stamp "B done"
fi

ADAPT8=runs/v2adapt_612m/ckpt_8192_light.npz
T=$(window 1200 5400)
if [ -n "$T" ] && [ -f "$ADAPT8" ] \
   && [ ! -f runs/v2a8k_aw00/ckpt_2048_light.npz ]; then
  stamp "B-ft: wav/ang0.0 fine-tune from the 8k adaptation (cap ${T}s)"
  for i in 1 2; do
    probe
    T=$(window 1200 5400); [ -z "$T" ] && break
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v2a8k_aw00 --init_from "$ADAPT8" \
      --val_paths dataset/synthv2_audio_val.npy \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 1e-4 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 2048 --ckpt_light --ckpt_every 512 --val_every 512 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "B-ft attempt $i exited nonzero; resume retry"
    sleep 120
  done
  stamp "B-ft done"
fi

SEL_B=docs/results/select_v2a8k_aw00.json
T=$(window 900 5400)
if [ -n "$T" ] && ls runs/v2a8k_aw00/ckpt_*_light.npz >/dev/null 2>&1; then
  stamp "B-select: full-shard select over the 8k-adaptation fine-tune"
  probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/v2a8k_aw00 --data dataset/synthv2_audio_val.npy \
    --gl_iters 8 --refine_iters 1 --out "$SEL_B"
  [ -f "$SEL_B" ] && commit_art \
    "v2 8k-adaptation fine-tune: full-shard select" "$SEL_B"
  stamp "B-select done"
fi

# --- C: official GL-250 eval of the overall winner -----------------------
WINNER=$(python - "$SEL_A" "$SEL_B" <<'EOF'
import json, sys
cands = []
for path in sys.argv[1:]:
    try:
        s = json.load(open(path))
        cands.append((s["best_mse"], s["best"]))
    except Exception:
        pass
print(min(cands)[1] if cands else "")
EOF
)
T=$(window 1800 6000)
if [ -n "$WINNER" ] && [ -f "$WINNER" ] && [ -n "$T" ]; then
  stamp "C: official GL-250 eval of $WINNER (cap ${T}s)"
  probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data dataset/synthv2_audio_val.npy --weight "$WINNER" \
    --batch_size 64 --gl_iters 250 --refine_iters 1,2 \
    --out docs/results/eval_v2ext_winner.json \
    && commit_art "official GL-250 eval: extended v2 lineage winner" \
         docs/results/eval_v2ext_winner.json "$WINNER"
  stamp "C done (winner=$WINNER)"
fi

# --- D: preproc device-STFT column (pending since the outage) ------------
T=$(window 900 3600)
if [ -n "$T" ]; then
  stamp "D: preproc bench device column (cap ${T}s)"
  probe
  timeout "$T" python benchmarks/preproc_bench.py \
    > /tmp/preproc_bench_r3x.log 2>&1
  cp /tmp/preproc_bench_r3x.log docs/results/preproc_bench_r3x.log \
    && commit_art "preproc bench: device-STFT column (r3x)" \
         docs/results/preproc_bench_r3x.log
  stamp "D done (log /tmp/preproc_bench_r3x.log)"
fi

stamp "R3X ALL DONE (remain=$(remain)s)"
