#!/bin/bash
# Round-4 third-tier queue: whatever the outage cost r4c, plus the paired A/B.
#
# The 01:05 backend outage ate into r4c's E/F windows (its deadline is
# fixed at queue start). This queue chains behind BOTH r4c and r4d and
# re-attempts, guard-skipping anything they already landed:
#
#   J1. zero-shot flagship per-clip eval on the held-out real track
#       (+ bootstrap stats) — the missing half of the paired A/B
#   J2. paired fine-tuned-vs-zero-shot bootstrap (host-only, no chip):
#       is the 1.5% adaptation gain statistically real on n=31?
#   E'. v2 polish lr3e-5 train + select (r4c stage E clone)
#   F'. sc_weight 0.3 probe train + select (r4c stage F clone)
#
# Contract (docs/OPERATIONS.md): tail queue — does NOT rm the stop file;
# probe() gates every chip stage; pid registered as /tmp/r4e.pid and
# removed on exit; deadline-guarded windows; artifacts committed.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
STOPF="${PHASEGEN_STOP_FILE-/tmp/q_stop}"
DEADLINE=${PHASEGEN_Q_DEADLINE:-$(( $(date +%s) + 12600 ))}
FLAGSHIP=runs/v2_aw00/ckpt_1536_light.npz
V2VAL=dataset/synthv2_audio_val.npy

echo $$ > /tmp/r4e.pid
trap 'rm -f /tmp/r4e.pid' EXIT

stamp() { echo "$(date -u +%FT%TZ) r4e: $1" >> "$STATUS"; }
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

stamp "r4e queue start (deadline=$DEADLINE remain=$(remain)s)"

# --- wait for r4c AND r4d to release the chip ----------------------------------
for P in /tmp/r4c.pid /tmp/r4d.pid; do
  while [ -f "$P" ] && kill -0 "$(cat "$P")" 2>/dev/null; do
    [ -n "$STOPF" ] && [ -f "$STOPF" ] && { stamp "stop while waiting on $P; parking"; exit 0; }
    [ "$(remain)" -lt 900 ] && { stamp "deadline while waiting on $P; exit"; exit 0; }
    sleep 60
  done
done
stamp "predecessors gone; chip is ours (remain=$(remain)s)"

# --- J1: zero-shot per-clip eval on the held-out track --------------------------
EV=docs/results/eval_real_zeroshot_held_stats.json
PCJ=docs/results/pc_real_zeroshot_held.jsonl
T=$(window 900 2400)
if [ -n "$T" ] && [ ! -f "$PCJ" ] && [ -f dataset/realheld_audio_val.npy ] \
   && [ -f "$FLAGSHIP" ]; then
  stamp "J1: zero-shot held-track per-clip eval (cap ${T}s)"; probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data dataset/realheld_audio_val.npy --weight "$FLAGSHIP" \
    --batch_size 31 --gl_iters 250 --refine_iters 1 \
    --stats --per_clip "$PCJ" --out "$EV" \
    && commit_art "zero-shot held-track eval with bootstrap CIs + per-clip dump" "$EV" "$PCJ"
  stamp "J1 done"
fi

# --- J2: paired fine-tuned vs zero-shot (host-only) ------------------------------
AB=docs/results/ab_realft_vs_zeroshot.json
if [ ! -f "$AB" ] && [ -f docs/results/pc_realft_held.jsonl ] \
   && [ -f docs/results/pc_real_zeroshot_held.jsonl ] \
   && [ "$(remain)" -gt 120 ]; then
  stamp "J2: paired ft-vs-zeroshot bootstrap (host)"
  timeout 600 python benchmarks/paired_ab.py \
    --a docs/results/pc_realft_held.jsonl \
    --b docs/results/pc_real_zeroshot_held.jsonl \
    --key MSE --out "$AB" \
    && commit_art "paired bootstrap: fine-tuned vs zero-shot on the held-out track" "$AB"
  stamp "J2 done"
fi

# --- E': v2 polish (r4c stage E clone, guard-skipped if it ran) ------------------
if [ ! -f runs/v2polish/ckpt_1024_light.npz ] && [ -f "$V2VAL" ]; then
  T=$(window 1800 4500)
  if [ -n "$T" ]; then
    stamp "E1': v2 polish lr3e-5 (cap ${T}s)"; probe
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v2polish --init_from "$FLAGSHIP" \
      --val_paths "$V2VAL" \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 3e-5 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 1024 --ckpt_light --ckpt_every 256 --val_every 256 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media
    stamp "E1' done"
  fi
fi
SELP=docs/results/select_v2polish_lr3e5.json
T=$(window 900 4500)
if [ -n "$T" ] && [ ! -f "$SELP" ] \
   && ls runs/v2polish/ckpt_*_light.npz >/dev/null 2>&1; then
  stamp "E2': polish select"; probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/v2polish --data "$V2VAL" \
    --gl_iters 8 --refine_iters 1 --out "$SELP"
  [ -f "$SELP" ] && commit_art "v2 plateau polish (lr 3e-5): full-shard select" "$SELP"
  stamp "E' done"
fi

# --- F': sc_weight 0.3 probe (r4c stage F clone) ---------------------------------
if [ ! -f runs/v2sc03/ckpt_512_light.npz ] && [ -f "$V2VAL" ]; then
  T=$(window 1500 3000)
  if [ -n "$T" ]; then
    stamp "F1': sc_weight 0.3 fine-tune (cap ${T}s)"; probe
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v2sc03 --init_from "$FLAGSHIP" \
      --val_paths "$V2VAL" \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 3e-5 --wav_weight 1.0 --ang_weight 0.0 --sc_weight 0.3 \
      --max_steps 512 --ckpt_light --ckpt_every 128 --val_every 128 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media
    stamp "F1' done"
  fi
fi
SELS=docs/results/select_v2sc03.json
T=$(window 900 3600)
if [ -n "$T" ] && [ ! -f "$SELS" ] \
   && ls runs/v2sc03/ckpt_*_light.npz >/dev/null 2>&1; then
  stamp "F2': sc probe select"; probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/v2sc03 --data "$V2VAL" \
    --gl_iters 8 --refine_iters 1 --out "$SELS"
  [ -f "$SELS" ] && commit_art "spectral-consistency aux-loss probe (sc_weight 0.3): select" "$SELS"
  stamp "F' done"
fi

stamp "R4E QUEUE DONE (remain=$(remain)s)"
