#!/bin/bash
# Cold-start A/B RERUN — gated behind the GL-fix queue. The first A/B
# measured the WORKER-THREAD upload (3-6x slower transfers on this
# tunnel, BASELINE.md); infer/upload.py now enqueues on the calling
# thread (async dispatch) so the AOT warm overlaps the in-flight bytes.
# Two reps per config as before.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
OUT=/tmp/coldstart_r3x2.jsonl
W=${PHASEGEN_CS_WEIGHT:-runs/v2_aw00/ckpt_1024_light.npz}
stamp() { echo "$(date -u +%FT%TZ) r3x-cs2: $1" >> "$STATUS"; }
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

PID=$(cat /tmp/r3x_glfix.pid 2>/dev/null)
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 120; done
fi
stamp "r3x queue exited; starting cold-start A/B (weight=$W)"

probe() {
  # cooperative chip yield (obs/watchdog.py): bench.py touches this to
  # claim the chip at round end; park instead of contending
  STOPQ="${PHASEGEN_STOP_FILE-/tmp/q_stop}"; [ -n "$STOPQ" ] && [ -f "$STOPQ" ] && { stamp "stop file present; parking"; exit 0; }
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
      $args >> "$OUT" 2>>/tmp/coldstart_r3x2_err.log \
      || stamp "WARN: run failed ($args rep $rep)"
  done
done
# wipe-durability: /tmp vanishes on container wipes; commit the results
cp "$OUT" docs/results/coldstart_r3x2.jsonl \
  && commit_art "cold-start A/B rerun: main-thread enqueue overlap vs serial (hardware)" \
       docs/results/coldstart_r3x2.jsonl
stamp "COLDSTART A/B DONE -> $OUT"
