#!/bin/bash
# Round-4 tail queue: v1 flagship GL-250 re-eval under the per-clip
# normalization fix (BASELINE.md r4 "Metric-integrity correction" item 4
# — the committed v1 numbers carry the flattering batch-max bias).
#
# Chains on the main r4 queue (/tmp/r4.pid) per the CLAUDE.md convention
# so two chip clients never contend; honors the cooperative stop file;
# registers /tmp/r4t.pid; removes it on exit.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
STOPF="${PHASEGEN_STOP_FILE-/tmp/q_stop}"
DEADLINE=${PHASEGEN_Q_DEADLINE:-$(( $(date +%s) + 18000 ))}
V1VAL=dataset/synth_audio_val.npy
V1W=runs/v1_aw00/ckpt_768_light.npz

echo $$ > /tmp/r4t.pid
trap 'rm -f /tmp/r4t.pid' EXIT

stamp() { echo "$(date -u +%FT%TZ) r4t: $1" >> "$STATUS"; }
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

# ---- wait for the main r4 queue (exact-pid chain) ---------------------------
stamp "tail waiting on main queue (deadline=$DEADLINE)"
while [ -f /tmp/r4.pid ] && kill -0 "$(cat /tmp/r4.pid 2>/dev/null)" 2>/dev/null; do
  [ -n "$STOPF" ] && [ -f "$STOPF" ] && { stamp "stop while waiting; parking"; exit 0; }
  [ "$(remain)" -lt 900 ] && { stamp "deadline while waiting; exit"; exit 0; }
  sleep 60
done
stamp "main queue finished; tail starting"

# ---- T1: v1 val shard (deterministic regen) ---------------------------------
if [ ! -f "$V1VAL" ]; then
  T=$(window 900 3600)
  if [ -n "$T" ]; then
    stamp "T1: v1 val shard regen (cap ${T}s)"; probe
    timeout "$T" python -m phasegen_tpu.cli.make_corpus \
      --out_dir dataset --name synth --n_train 98304 --n_val 1024 --version 1
  fi
fi

# ---- T2: v1 flagship honest GL-250 re-eval ----------------------------------
EV=docs/results/eval_v1rebuild_winner_r4.json
T=$(window 1200 4500)
if [ -n "$T" ] && [ ! -f "$EV" ] && [ -f "$V1VAL" ] && [ -f "$V1W" ]; then
  stamp "T2: v1 flagship GL-250 re-eval, per-clip norm (cap ${T}s)"; probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data "$V1VAL" --weight "$V1W" \
    --batch_size 64 --gl_iters 250 --refine_iters 1,2 --out "$EV" \
    && commit_art "v1 flagship re-eval under per-clip GL normalization" "$EV"
  stamp "T2 done"
fi

stamp "R4 TAIL DONE (remain=$(remain)s)"
