#!/bin/bash
# Overlapped-cold-start hardware A/B, gated behind the r3x quality queue
# (waits on /tmp/r3x.pid). Each stream_coldstart.py invocation is a fresh
# process — exactly the "second process" cold start BASELINE.md tracks.
# Two reps per config: the earlier A/B attempt was swamped by tunnel
# variance (BASELINE.md "serving cold-start notes"), so report all reps.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
OUT=/tmp/coldstart_r3x.jsonl
W=${PHASEGEN_CS_WEIGHT:-runs/v2_aw00/ckpt_1024_light.npz}
stamp() { echo "$(date -u +%FT%TZ) r3x-cs: $1" >> "$STATUS"; }
commit_art() {  # msg file...
  local msg=$1; shift
  for i in 1 2; do
    git add -f "$@" && git commit -q -m "$msg

No-Verification-Needed: artifact-only commit (benchmark result data)" \
      && return 0
    sleep 10
  done
  stamp "WARN: commit failed: $msg"
}

PID=$(cat /tmp/r3x.pid 2>/dev/null)
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 120; done
fi
stamp "r3x queue exited; starting cold-start A/B (weight=$W)"

probe() {
  until timeout 700 python -c \
    "from phasegen_tpu.obs.watchdog import device_liveness_probe as p; p()"
  do stamp "backend down; retry in 300 s"; sleep 300; done
}

: > "$OUT"
for rep in 1 2; do
  for args in "" "--no_overlap" "--quantize store" \
              "--quantize store --no_overlap"; do
    probe
    stamp "rep $rep: stream_coldstart $args"
    timeout 1200 python benchmarks/stream_coldstart.py --weight "$W" \
      $args >> "$OUT" 2>>/tmp/coldstart_r3x_err.log \
      || stamp "WARN: run failed ($args rep $rep)"
  done
done
# wipe-durability: /tmp vanishes on container wipes; commit the results
cp "$OUT" docs/results/coldstart_r3x.jsonl \
  && commit_art "cold-start A/B: overlapped vs serial, dense vs int8 (hardware)" \
       docs/results/coldstart_r3x.jsonl
stamp "COLDSTART A/B DONE -> $OUT"
