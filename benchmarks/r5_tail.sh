#!/bin/bash
# Round-5 tail queue — chained behind the main r5 queue (/tmp/r5.pid).
#
# Fine bench batch probe around the known peak: the curve measured
# 8373 @1024 -> 8595 @1536 -> 8528 @2048 (BASELINE.md round 3), so the
# true peak may sit off 1536. Probe 1280 and 1792; results go to
# docs/results/bench_probe_r5.jsonl. If a probe clearly beats 1536,
# bench.py's default BATCH is updated by hand (code change, not here).
#
# bench.py normally CREATES the stop file to evict queues — when run
# FROM a queue, PHASEGEN_STOP_FILE= (empty) disables that mechanism so
# the probe neither parks itself nor SIGTERMs its own pid tree.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
STOPF="${PHASEGEN_STOP_FILE-/tmp/q_stop}"
DEADLINE=${PHASEGEN_Q_DEADLINE:-$(( $(date +%s) + 23400 ))}

stamp() { echo "$(date -u +%FT%TZ) r5t: $1" >> "$STATUS"; }
remain() { echo $(( DEADLINE - $(date +%s) )); }

# chain: wait for the main + follower queues to drain (never two chip
# clients); r5b took over from r5 mid-round, so wait on both pid files
for PF in /tmp/r5.pid /tmp/r5b.pid; do
  PID=$(cat "$PF" 2>/dev/null)
  [ -n "$PID" ] || continue
  while kill -0 "$PID" 2>/dev/null; do
    [ "$(remain)" -lt 600 ] && { stamp "deadline while chained; exit"; exit 0; }
    sleep 60
  done
done
echo $$ > /tmp/r5t.pid
trap 'rm -f /tmp/r5t.pid' EXIT
stamp "tail starts (remain=$(remain)s)"

OUT=docs/results/bench_probe_r5.jsonl
for B in 1280 1792; do
  [ -n "$STOPF" ] && [ -f "$STOPF" ] && { stamp "stop file present; parking"; exit 0; }
  [ "$(remain)" -lt 900 ] && { stamp "deadline; exit"; exit 0; }
  grep -q "\"batch\": $B" "$OUT" 2>/dev/null && continue
  stamp "bench probe B=$B"
  LINE=$(PHASEGEN_STOP_FILE= timeout 900 python bench.py --batch "$B" | tail -1)
  case "$LINE" in
    '{'*) echo "{\"batch\": $B, \"result\": $LINE}" >> "$OUT" ;;
    *) stamp "probe B=$B produced no JSON" ;;
  esac
done
if [ -f "$OUT" ]; then
  for i in 1 2; do
    git add -f "$OUT" && git commit -q -m "bench fine batch probe (1280/1792 around the 1536 peak)

No-Verification-Needed: artifact-only commit (benchmark data)" && break
    sleep 10
  done
fi
stamp "R5 TAIL DONE (remain=$(remain)s)"
