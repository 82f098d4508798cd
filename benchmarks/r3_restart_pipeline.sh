#!/bin/bash
# Round-3 restarted-session pipeline.
#
# The prior round-3 session ended in a >6.8 h backend outage with the
# remaining chip work queued in a detached scheduler under /tmp; the
# container was then wiped, losing that queue AND every trained
# checkpoint (runs/ is gitignored). This script rebuilds the flagship
# the way the committed evidence points (BASELINE.md round-3 sections):
#
#   1. regenerate the val shards (deterministic seed space — same clips)
#   2. from-scratch v2-corpus 612M base, 20,480 steps cosine
#      (the open question: native-v2 training vs the v1->v2 adaptation
#      that produced the 0.11297 headline)
#   3. wav-loss fine-tunes ang_weight 0.0 vs 0.1 (aw00 tied aw01's
#      headline from a *degraded* base — 40k-base ang sweep)
#   4. full-shard checkpoint selects for both recipes
#   5. official GL-250 eval of the winner incl. per-clip adaptive
#      refine (--refine_pick), written to docs/results/
#   6. bench.py headline + the pending preproc device-STFT column
#
# Serial: one TPU client at a time. Every stage is liveness-gated so a
# backend outage parks the queue instead of burning timeout windows.
set -x
cd /root/repo
mkdir -p dataset runs docs/results
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log

stamp() { echo "$(date -u +%FT%TZ) $1" >> "$STATUS"; }

probe() {
  until timeout 700 python -c \
    "from phasegen_tpu.obs.watchdog import device_liveness_probe as p; p()"
  do
    stamp "backend down; retry in 300 s"
    sleep 300
  done
}

stamp "stage0: corpus val shards"
probe
[ -f dataset/synthv2_audio_val.npy ] || timeout 3600 \
  python -m phasegen_tpu.cli.make_corpus --out_dir dataset \
    --name synthv2 --version 2 --n_train 98304 --n_val 1024
[ -f dataset/synth_audio_val.npy ] || timeout 3600 \
  python -m phasegen_tpu.cli.make_corpus --out_dir dataset \
    --name synth --version 1 --n_train 98304 --n_val 1024

stamp "stage1: v2 from-scratch base (20480 steps)"
for i in 1 2 3 4; do
  probe
  timeout 18000 python -m phasegen_tpu.cli.train \
    --log_dir runs/v2scratch_612m \
    --val_paths dataset/synthv2_audio_val.npy \
    --synth_train 98304 --synth_version 2 --batch_size 256 \
    --lr 1e-3 --lr_schedule cosine --warmup_steps 500 --decay_steps 20480 \
    --max_steps 20480 --ckpt_light --ckpt_every 4096 --val_every 2048 \
    --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
  stamp "stage1 attempt $i exited nonzero; resume retry"
  sleep 120
done
stamp "stage1 done"

BASE=runs/v2scratch_612m/ckpt_20480_light.npz
if [ ! -f "$BASE" ]; then
  stamp "FATAL: base checkpoint missing; aborting"
  exit 1
fi

stamp "stage2: wav fine-tunes (ang 0.0 vs 0.1)"
for AW in 0.0 0.1; do
  TAG=$(echo "$AW" | tr -d '.')
  for i in 1 2 3; do
    probe
    timeout 9000 python -m phasegen_tpu.cli.train \
      --log_dir "runs/v2s_aw${TAG}" --init_from "$BASE" \
      --val_paths dataset/synthv2_audio_val.npy \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 1e-4 --wav_weight 1.0 --ang_weight "$AW" \
      --max_steps 2048 --ckpt_light --ckpt_every 256 --val_every 1024 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "stage2 aw${TAG} attempt $i exited nonzero; resume retry"
    sleep 120
  done
done
stamp "stage2 done"

stamp "stage3: full-shard selects"
for TAG in 00 01; do
  probe
  timeout 10800 python benchmarks/ckpt_select.py \
    --run "runs/v2s_aw${TAG}" --data dataset/synthv2_audio_val.npy \
    --gl_iters 8 --refine_iters 1,2 \
    --out "docs/results/select_v2scratch_aw${TAG}.json"
done
stamp "stage3 done"

stamp "stage4: official GL-250 eval of the winner"
WINNER=$(python - <<'EOF'
import json
best = None
for tag in ["00", "01"]:
    try:
        d = json.load(open(f"docs/results/select_v2scratch_aw{tag}.json"))
    except Exception:
        continue
    if best is None or d["best_mse"] < best["best_mse"]:
        best = d
print(best["best"] if best else "")
EOF
)
if [ -n "$WINNER" ]; then
  probe
  timeout 7200 python -m phasegen_tpu.cli.evaluate \
    --data dataset/synthv2_audio_val.npy --weight "$WINNER" \
    --batch_size 64 --gl_iters 250 --refine_iters 1,2,4 --refine_pick \
    --out docs/results/eval_v2scratch_winner.json
fi
stamp "stage4 done (winner=$WINNER)"

stamp "stage5: bench + preproc device column"
probe
timeout 1800 python bench.py > /tmp/q_bench.log 2>&1
probe
timeout 4800 python benchmarks/preproc_bench.py > /tmp/q_preproc.log 2>&1
stamp "ALL DONE"
