#!/bin/bash
# Round-4 fourth-tier queue: the v3 curriculum ladder (NEXT.md lead #1,
# pulled forward). Thin chaining wrapper around benchmarks/r3x_v3.sh:
#
#   v3 val shard -> v3 adaptation (4096 ref-loss steps from the v2
#   adaptation base) -> wav/ang0.0 fine-tune -> select -> official
#   GL-250 eval -> cross-corpus control on the v2 shard.
#
# The zero-shot control is already committed (the v2 flagship beats
# GL-250 by 26.9% on unseen v3, docs/results/eval_v2flagship_on_v3.json);
# this arm measures how much v3 adaptation adds on top.
#
# Contract: waits on r4c/r4d/r4e pid files (one chip, one client),
# registers /tmp/r4f.pid covering the whole child tree (yield SIGTERMs
# descendants first), does NOT rm the stop file (tail queue), bounded
# by an explicit PHASEGEN_Q_DEADLINE handed to the inner script.
set -x
cd /root/repo
STATUS=/tmp/q_status.log
STOPF="${PHASEGEN_STOP_FILE-/tmp/q_stop}"
DEADLINE=${PHASEGEN_Q_DEADLINE:-$(( $(date +%s) + 14400 ))}

echo $$ > /tmp/r4f.pid
trap 'rm -f /tmp/r4f.pid' EXIT

stamp() { echo "$(date -u +%FT%TZ) r4f: $1" >> "$STATUS"; }
remain() { echo $(( DEADLINE - $(date +%s) )); }

stamp "r4f v3-ladder wrapper start (deadline=$DEADLINE remain=$(remain)s)"

for P in /tmp/r4c.pid /tmp/r4d.pid /tmp/r4e.pid; do
  while [ -f "$P" ] && kill -0 "$(cat "$P")" 2>/dev/null; do
    [ -n "$STOPF" ] && [ -f "$STOPF" ] && { stamp "stop while waiting on $P; parking"; exit 0; }
    [ "$(remain)" -lt 2400 ] && { stamp "deadline while waiting on $P; exit"; exit 0; }
    sleep 60
  done
done
stamp "predecessors gone; starting the v3 ladder (remain=$(remain)s)"

# r3x_v3.sh's own gate (/tmp/r3x_harvest.pid) is long dead; its probe()
# honors the stop file and its windows honor this deadline.
PHASEGEN_Q_DEADLINE="$DEADLINE" bash benchmarks/r3x_v3.sh
stamp "r4f wrapper done (remain=$(remain)s)"
