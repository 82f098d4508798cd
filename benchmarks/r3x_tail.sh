#!/bin/bash
# Tail quality queue — gated behind the cold-start A/B rerun
# (/tmp/r3x_cs2.pid) so it never contends for the single chip. Two cheap
# shots at beating the v2 flagship (pure 0.10931 @1536,
# docs/results/eval_v2ext_winner.json):
#
#   1. Plateau SWA: the extension select showed a flat optimum
#      (0.10931 / 0.10934 / 0.10945 at steps 1536/2048/2560,
#      select_v2ext_aw00.json). Uniform-average those three checkpoints
#      (benchmarks/swa.py, host-only) and full-shard select the result —
#      the earlier SWA negative result averaged a DRIFTING window
#      (256-1024 / 512-2048); this is the first genuinely flat one.
#   2. LR-drop polish: continue the fine-tune from the 1536 peak at
#      lr 3e-5 (the move being validated on the v1 flagship by
#      benchmarks/r3x_v1polish.sh).
#
# Each arm commits its select; an official GL-250 eval runs only if an
# arm beats the flagship's pure 0.10931.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
stamp() { echo "$(date -u +%FT%TZ) r3x-tail: $1" >> "$STATUS"; }
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
probe() {
  # cooperative chip yield (obs/watchdog.py): bench.py touches this to
  # claim the chip at round end; park instead of contending
  STOPQ="${PHASEGEN_STOP_FILE-/tmp/q_stop}"; [ -n "$STOPQ" ] && [ -f "$STOPQ" ] && { stamp "stop file present; parking"; exit 0; }
  until timeout 700 python -c \
    "from phasegen_tpu.obs.watchdog import device_liveness_probe as p; p()"
  do
    stamp "backend down; retry in 300 s"
    sleep 300
    [ "$(remain)" -lt 600 ] && { stamp "deadline during outage; exit"; exit 0; }
  done
}

PID=$(cat /tmp/r3x_cs2.pid 2>/dev/null)
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do sleep 120; done
fi
# deadline from RELEASE time, not launch time — the gate wait above can
# be hours long
DEADLINE=${PHASEGEN_Q_DEADLINE:-$(( $(date +%s) + 21600 ))}
remain() { echo $(( DEADLINE - $(date +%s) )); }
window() {
  local min_s=$1 cap=$2 r; r=$(remain)
  if [ "$r" -lt "$min_s" ]; then echo ""; else
    [ "$r" -lt "$cap" ] && echo "$r" || echo "$cap"; fi
}
stamp "queues drained; tail queue starts (deadline=$DEADLINE)"

V2VAL=dataset/synthv2_audio_val.npy
FLAGSHIP_MSE=0.10931

# --- 1: plateau SWA ---------------------------------------------------------
SWASEL=docs/results/select_v2swa_plateau.json
if [ ! -f "$SWASEL" ] && [ -f runs/v2_aw00/ckpt_2560_light.npz ]; then
  stamp "1: plateau SWA (1536+2048+2560)"
  if [ ! -f runs/v2_swa/ckpt_2048_light.npz ]; then
    python benchmarks/swa.py \
      --ckpts runs/v2_aw00/ckpt_1536_light.npz \
              runs/v2_aw00/ckpt_2048_light.npz \
              runs/v2_aw00/ckpt_2560_light.npz \
      --out runs/v2_swa
  fi
  T=$(window 900 5400)
  if [ -n "$T" ] && [ -f runs/v2_swa/ckpt_2048_light.npz ]; then
    probe
    timeout "$T" python benchmarks/ckpt_select.py \
      --run runs/v2_swa --data "$V2VAL" \
      --gl_iters 8 --refine_iters 1 --out "$SWASEL"
    [ -f "$SWASEL" ] && commit_art \
      "v2 plateau SWA (1536/2048/2560): full-shard select" "$SWASEL"
  fi
  stamp "1 done"
fi

# --- 2: lr-drop polish from the 1536 peak -----------------------------------
T=$(window 1200 5400)
if [ -n "$T" ] && [ -f runs/v2_aw00/ckpt_1536_light.npz ] \
   && [ ! -f runs/v2_aw00_lr3e5/ckpt_1024_light.npz ]; then
  stamp "2: lr 3e-5 polish from the v2 peak (cap ${T}s)"
  for i in 1 2; do
    probe
    T=$(window 1200 5400); [ -z "$T" ] && break
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v2_aw00_lr3e5 \
      --init_from runs/v2_aw00/ckpt_1536_light.npz \
      --val_paths "$V2VAL" \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 3e-5 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 1024 --ckpt_light --ckpt_every 256 --val_every 512 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "2 attempt $i exited nonzero; resume retry"
    sleep 120
  done
  stamp "2 done"
fi

POLSEL=docs/results/select_v2polish_lr3e5.json
T=$(window 900 5400)
if [ -n "$T" ] && [ ! -f "$POLSEL" ] \
   && ls runs/v2_aw00_lr3e5/ckpt_*_light.npz >/dev/null 2>&1; then
  stamp "2b: polish select"
  probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/v2_aw00_lr3e5 --data "$V2VAL" \
    --gl_iters 8 --refine_iters 1 --out "$POLSEL"
  [ -f "$POLSEL" ] && commit_art \
    "v2 lr-drop polish (lr 3e-5 from step 1536): full-shard select" "$POLSEL"
  stamp "2b done"
fi

# --- 3: official eval if either arm beat the flagship -----------------------
BEST=$(python - <<EOF
import json
cands = []
for f in ["$SWASEL", "$POLSEL"]:
    try:
        d = json.load(open(f))
        cands.append((d["best_mse"], d["best"]))
    except Exception:
        pass
cands = [c for c in cands if c[0] < $FLAGSHIP_MSE]
print(min(cands)[1] if cands else "")
EOF
)
EVAL=docs/results/eval_v2_tail_winner.json
T=$(window 1800 6000)
if [ -n "$BEST" ] && [ -f "$BEST" ] && [ -n "$T" ] && [ ! -f "$EVAL" ]; then
  stamp "3: official GL-250 eval of tail winner $BEST (cap ${T}s)"
  probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data "$V2VAL" --weight "$BEST" \
    --batch_size 64 --gl_iters 250 --refine_iters 1,2 \
    --out "$EVAL" \
    && commit_art "official GL-250 eval: v2 tail winner (new flagship)" \
         "$EVAL" "$BEST"
  stamp "3 done"
fi

stamp "TAIL QUEUE DONE (remain=$(remain)s)"
