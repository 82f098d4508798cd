#!/bin/bash
# Round-4 tail queue: statistics-grade re-evals + selects r4c may not reach.
#
# Chains behind benchmarks/r4c_queue.sh (waits on /tmp/r4c.pid) so the
# single chip never has two clients. Stages, most valuable first:
#
#   G1. held-out-track fine-tune winner, GL-250 eval with --stats
#       (paired-bootstrap CIs upgrade the 13.8%-vs-GL claim from
#       "directional, n=31" to a number with error bars)
#   G2. v2 flagship official eval with --stats (CI on the 27.5% headline)
#   H.  v2 polish select (r4c stage E2) if E1 left checkpoints unselected
#   I.  sc-probe select (r4c stage F2) if F1 left checkpoints unselected
#
# Contract (docs/OPERATIONS.md): probe() honors the stop file at every
# gate, pid registered as /tmp/r4d.pid (matches QUEUE_PID_GLOBS), pid
# file removed on exit, deadline-guarded windows, artifacts committed.
# NOTE: does NOT rm the stop file at start — this is a TAIL queue by
# design; a pending round-end yield must park it, not be erased.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
STOPF="${PHASEGEN_STOP_FILE-/tmp/q_stop}"
DEADLINE=${PHASEGEN_Q_DEADLINE:-$(( $(date +%s) + 10800 ))}
FLAGSHIP=runs/v2_aw00/ckpt_1536_light.npz
V2VAL=dataset/synthv2_audio_val.npy

echo $$ > /tmp/r4d.pid
trap 'rm -f /tmp/r4d.pid' EXIT

stamp() { echo "$(date -u +%FT%TZ) r4d: $1" >> "$STATUS"; }
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

stamp "r4d tail queue start (deadline=$DEADLINE remain=$(remain)s)"

# --- wait for r4c to release the chip -----------------------------------------
while [ -f /tmp/r4c.pid ] && kill -0 "$(cat /tmp/r4c.pid)" 2>/dev/null; do
  [ -n "$STOPF" ] && [ -f "$STOPF" ] && { stamp "stop while waiting on r4c; parking"; exit 0; }
  [ "$(remain)" -lt 900 ] && { stamp "deadline while waiting on r4c; exit"; exit 0; }
  sleep 60
done
stamp "r4c gone; chip is ours (remain=$(remain)s)"

# --- G1: held-out-track stats eval --------------------------------------------
EV=docs/results/eval_realft_held_stats.json
PCJ=docs/results/pc_realft_held.jsonl
T=$(window 900 2400)
if [ -n "$T" ] && [ ! -f "$EV" ] && [ -f dataset/realheld_audio_val.npy ] \
   && [ -f runs/realft_612m/ckpt_64_light.npz ]; then
  stamp "G1: held-out-track eval with bootstrap stats (cap ${T}s)"; probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data dataset/realheld_audio_val.npy \
    --weight runs/realft_612m/ckpt_64_light.npz \
    --batch_size 31 --gl_iters 250 --refine_iters 1 \
    --stats --per_clip "$PCJ" --out "$EV" \
    && commit_art "held-out-track eval with paired-bootstrap CIs" "$EV" "$PCJ"
  stamp "G1 done"
fi

# --- G2: v2 flagship official eval with stats ----------------------------------
EV=docs/results/eval_v2ext_winner_stats.json
PCJ=docs/results/pc_v2flagship.jsonl
T=$(window 1200 3600)
if [ -n "$T" ] && [ ! -f "$EV" ] && [ -f "$V2VAL" ] && [ -f "$FLAGSHIP" ]; then
  stamp "G2: v2 flagship eval with bootstrap stats (cap ${T}s)"; probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data "$V2VAL" --weight "$FLAGSHIP" \
    --batch_size 64 --gl_iters 250 --refine_iters 1 \
    --stats --per_clip "$PCJ" --out "$EV" \
    && commit_art "v2 flagship official eval with paired-bootstrap CIs" "$EV" "$PCJ"
  stamp "G2 done"
fi

# --- H: v2 polish select (r4c stage E2, if unfinished) -------------------------
SELP=docs/results/select_v2polish_lr3e5.json
T=$(window 900 4500)
if [ -n "$T" ] && [ ! -f "$SELP" ] && [ -f "$V2VAL" ] \
   && ls runs/v2polish/ckpt_*_light.npz >/dev/null 2>&1; then
  stamp "H: polish select (cap ${T}s)"; probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/v2polish --data "$V2VAL" \
    --gl_iters 8 --refine_iters 1 --out "$SELP"
  [ -f "$SELP" ] && commit_art "v2 plateau polish (lr 3e-5): full-shard select" "$SELP"
  stamp "H done"
fi

# --- I: sc-probe select (r4c stage F2, if unfinished) --------------------------
SELS=docs/results/select_v2sc03.json
T=$(window 900 3600)
if [ -n "$T" ] && [ ! -f "$SELS" ] && [ -f "$V2VAL" ] \
   && ls runs/v2sc03/ckpt_*_light.npz >/dev/null 2>&1; then
  stamp "I: sc probe select (cap ${T}s)"; probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/v2sc03 --data "$V2VAL" \
    --gl_iters 8 --refine_iters 1 --out "$SELS"
  [ -f "$SELS" ] && commit_art "spectral-consistency aux-loss probe (sc_weight 0.3): select" "$SELS"
  stamp "I done"
fi

stamp "R4D QUEUE DONE (remain=$(remain)s)"
