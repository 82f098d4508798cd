#!/bin/bash
# Insurance pass behind the r3x queues: the LIVE r3x_quality.sh run
# predates two fixes (select-gate on the exact final checkpoint; preproc
# log committed only to /tmp), so this script closes any gap the old
# in-flight copy leaves. Gated on the cold-start A/B pid so it never
# contends for the chip. Idempotent: every stage no-ops if the artifact
# already exists.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
stamp() { echo "$(date -u +%FT%TZ) r3x-harvest: $1" >> "$STATUS"; }
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
probe() {
  until timeout 700 python -c \
    "from phasegen_tpu.obs.watchdog import device_liveness_probe as p; p()"
  do stamp "backend down; retry in 300 s"; sleep 300; done
}
newer_than() {  # dir step
  local f s
  for f in "$1"/ckpt_*_light.npz; do
    s=${f##*/ckpt_}; s=${s%_light.npz}
    [ "$s" -gt "$2" ] 2>/dev/null && return 0
  done
  return 1
}

PID=$(cat /tmp/r3x_cs.pid 2>/dev/null)
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 120; done
fi
stamp "queues exited; harvesting"

# 1. A-select if the old gate skipped it but extension checkpoints exist
SEL_A=docs/results/select_v2ext_aw00.json
if [ ! -f "$SEL_A" ] && newer_than runs/v2_aw00 1024; then
  probe
  stamp "late A-select (old gate skipped it)"
  timeout 5400 python benchmarks/ckpt_select.py \
    --run runs/v2_aw00 --data dataset/synthv2_audio_val.npy \
    --gl_iters 8 --refine_iters 1 --out "$SEL_A"
  [ -f "$SEL_A" ] && commit_art \
    "v2 fine-tune extension: full-shard select (harvest)" "$SEL_A"
fi

# 2. official eval if the selects produced a winner but no eval landed
EVAL=docs/results/eval_v2ext_winner.json
if [ ! -f "$EVAL" ]; then
  WINNER=$(python - "$SEL_A" docs/results/select_v2a8k_aw00.json <<'EOF'
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
  if [ -n "$WINNER" ] && [ -f "$WINNER" ]; then
    probe
    stamp "late official eval of $WINNER"
    timeout 6000 python -m phasegen_tpu.cli.evaluate \
      --data dataset/synthv2_audio_val.npy --weight "$WINNER" \
      --batch_size 64 --gl_iters 250 --refine_iters 1,2 \
      --out "$EVAL" \
      && commit_art "official GL-250 eval: extended v2 winner (harvest)" \
           "$EVAL" "$WINNER"
  fi
fi

# 3. preproc log durability (old stage D wrote /tmp only)
if [ -f /tmp/preproc_bench_r3x.log ] \
   && [ ! -f docs/results/preproc_bench_r3x.log ]; then
  cp /tmp/preproc_bench_r3x.log docs/results/preproc_bench_r3x.log
  commit_art "preproc bench: device-STFT column (harvest)" \
    docs/results/preproc_bench_r3x.log
fi

# 4. cold-start results durability (belt for the queue's own commit)
if [ -f /tmp/coldstart_r3x.jsonl ] \
   && [ ! -f docs/results/coldstart_r3x.jsonl ]; then
  cp /tmp/coldstart_r3x.jsonl docs/results/coldstart_r3x.jsonl
  commit_art "cold-start A/B results (harvest)" \
    docs/results/coldstart_r3x.jsonl
fi

stamp "HARVEST DONE"
