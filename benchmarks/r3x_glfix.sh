#!/bin/bash
# Re-measure the official GL-250 baselines with the per-clip GL
# normalization fix (ops/griffin_lim.py) — the prior batch-max
# normalization under-scaled quiet clips, inflating LMSE and the
# MSE_refine{K} columns of every earlier official eval (pure MSE and
# checkpoint selection were computed on per-clip-normalized audio and
# are unaffected). Gated behind the f32 A/B queue (/tmp/r3x_f32.pid);
# all later queues already run the fixed code.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
DEADLINE=${PHASEGEN_Q_DEADLINE:-$(( $(date +%s) + 28800 ))}
stamp() { echo "$(date -u +%FT%TZ) r3x-glfix: $1" >> "$STATUS"; }
remain() { echo $(( DEADLINE - $(date +%s) )); }
window() {
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

PID=$(cat /tmp/r3x_f32.pid 2>/dev/null)
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 120; done
fi
stamp "queues drained; GL-fix re-measurement starts (remain=$(remain)s)"

T=$(window 1800 6000)
if [ -n "$T" ] && [ ! -f docs/results/eval_v2flagship_glfix.json ] \
   && [ -f runs/v2_aw00/ckpt_1536_light.npz ]; then
  stamp "1: v2 flagship GL-250 re-eval (fixed per-clip GL norm)"
  probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data dataset/synthv2_audio_val.npy \
    --weight runs/v2_aw00/ckpt_1536_light.npz \
    --batch_size 64 --gl_iters 250 --refine_iters 1,2 \
    --out docs/results/eval_v2flagship_glfix.json \
    && commit_art "official GL-250 re-eval (per-clip GL norm fix): v2 flagship" \
         docs/results/eval_v2flagship_glfix.json
  stamp "1 done"
fi

T=$(window 1800 6000)
if [ -n "$T" ] && [ ! -f docs/results/eval_v1flagship_glfix.json ] \
   && [ -f runs/v1_aw00/ckpt_768_light.npz ]; then
  stamp "2: v1 flagship GL-250 re-eval (fixed per-clip GL norm)"
  probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data dataset/synth_audio_val.npy \
    --weight runs/v1_aw00/ckpt_768_light.npz \
    --batch_size 64 --gl_iters 250 --refine_iters 1,2 \
    --out docs/results/eval_v1flagship_glfix.json \
    && commit_art "official GL-250 re-eval (per-clip GL norm fix): v1 flagship" \
         docs/results/eval_v1flagship_glfix.json
  stamp "2 done"
fi

stamp "GLFIX DONE (remain=$(remain)s)"
