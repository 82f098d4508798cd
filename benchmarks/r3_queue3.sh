#!/bin/bash
# Round-3 queue 3: opportunistic chip work AFTER benchmarks/r3_followup.sh
# exits, if any window remains before the hard deadline (the driver
# benches the chip at the 12 h mark; nothing may hold the TPU past it).
#
# Jobs (cheapest-first so a small window still yields something):
#   1. Cross-corpus eval: the v2scratch stage-4 winner scored on the V1
#      val shard (gl_iters 8, refine 1) — the generalization number the
#      main pipeline doesn't produce (is the v2-trained flagship still
#      good on the easier corpus, or did it trade one for the other?).
#   2. Clean-window serving cold-start probe of the bf16 upload cast
#      (stream_coldstart dense) — directional only; tunnel variance has
#      swamped these before (BASELINE.md r3 notes).
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
DEADLINE=${PHASEGEN_Q_DEADLINE:-1787087400}
stamp() { echo "$(date -u +%FT%TZ) queue3: $1" >> "$STATUS"; }

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

# Gate on the follow-up queue releasing the chip.
FPID=$(cat /tmp/followup.pid 2>/dev/null)
if [ -n "$FPID" ]; then
  while kill -0 "$FPID" 2>/dev/null; do sleep 60; done
fi
stamp "follow-up exited; starting (remain=$(remain)s)"

# Winner of the v2scratch selects (same extraction as the main pipeline).
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

T=$(window 1200 5400)
if [ -n "$WINNER" ] && [ -f "$WINNER" ] && [ -n "$T" ] \
   && [ -f dataset/synth_audio_val.npy ]; then
  stamp "cross-corpus eval: $WINNER on the v1 val shard (cap ${T}s)"
  probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data dataset/synth_audio_val.npy --weight "$WINNER" \
    --batch_size 64 --gl_iters 8 --refine_iters 1 \
    --out docs/results/eval_v2scratch_winner_on_v1.json
  stamp "cross-corpus eval done"
else
  stamp "cross-corpus eval skipped (winner='$WINNER', remain=$(remain)s)"
fi

T=$(window 900 2400)
if [ -n "$T" ] && [ -n "$WINNER" ] && [ -f "$WINNER" ]; then
  # --weight makes the probe pay the real load_weights npz upload (the
  # bf16 cast under test); random-init weights would skip that path
  stamp "cold-start probe: dense bf16-upload (cap ${T}s)"
  probe
  timeout "$T" python benchmarks/stream_coldstart.py --weight "$WINNER" \
    > /tmp/q3_coldstart.log 2>&1
  stamp "cold-start probe done"
fi

stamp "QUEUE3 ALL DONE"
