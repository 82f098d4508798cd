#!/bin/bash
# Round-5 restart queue — post-wipe relaunch of the r5/r5b pipeline.
#
# The container was wiped mid-round (see BASELINE.md "Environment
# incident"): /tmp state, dataset/ shards and the UNCOMMITTED v3
# adaptation progress (ckpt_3080) are gone; only committed state
# survived (runs/v3adapt_612m/ckpt_512_light.npz). This queue restarts
# the pipeline from that state with one policy change learned the hard
# way: **stage 1 commits its newest intermediate checkpoint at every
# window end** (wipe insurance; a lost window now costs minutes, not
# the whole stage). Stage-for-stage the science is identical to
# benchmarks/r5b_queue.sh (which documents the rationale per stage).
#
# Contract (OPERATIONS.md): fresh campaign -> rm -f stop file; register
# /tmp/r5c.pid (matches obs.watchdog.QUEUE_PID_GLOBS); every stage
# probes stop file + deadline; artifacts committed in place right after
# the stage that produced them. Training stages self-limit with
# cli.train --max_seconds (checkpoint + exit 0 at a dispatch crossing);
# the outer timeout is a +300 s hung-process safety net only.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
STOPF="${PHASEGEN_STOP_FILE-/tmp/q_stop}"
DEADLINE=${PHASEGEN_Q_DEADLINE:-$(( $(date +%s) + 15000 ))}

[ -n "$STOPF" ] && rm -f "$STOPF"
echo $$ > /tmp/r5c.pid
trap 'rm -f /tmp/r5c.pid' EXIT

stamp() { echo "$(date -u +%FT%TZ) r5c: $1" >> "$STATUS"; }
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
    [ -n "$STOPF" ] && [ -f "$STOPF" ] && { stamp "stop during outage; parking"; exit 0; }
    stamp "backend down; retry in 120 s"
    sleep 120
    [ "$(remain)" -lt 300 ] && { stamp "deadline during outage; exit"; exit 0; }
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
train_budgeted() {
  local T=$1; shift
  timeout $(( T + 300 )) python -m phasegen_tpu.cli.train \
    --max_seconds $(( T - 240 > 300 ? T - 240 : 300 )) "$@"
}
# newest light ckpt step number in a run dir ('' if none)
latest_step() {
  ls "$1"/ckpt_*_light.npz 2>/dev/null \
    | sed 's/.*ckpt_\([0-9]*\)_light.npz/\1/' | sort -n | tail -1
}

FLAGSHIP=runs/v2_aw00/ckpt_1536_light.npz
ADAPT2=runs/v2adapt_612m/ckpt_4096_light.npz
V3VAL=dataset/synthv3_audio_val.npy
V2VAL=dataset/synthv2_audio_val.npy

stamp "r5c restart queue starts (deadline=$DEADLINE, remain=$(remain)s)"

# --- 0: val shards (deterministic regen; dataset/ was wiped) -----------------
T=$(window 300 900)
if [ -n "$T" ] && [ ! -f "$V3VAL" ]; then
  stamp "0a: v3 val shard (cap ${T}s)"; probe
  timeout "$T" python -m phasegen_tpu.cli.make_corpus \
    --out_dir dataset --name synthv3 --n_train 98304 --n_val 1024 --version 3
  stamp "0a done"
fi
T=$(window 300 900)
if [ -n "$T" ] && [ ! -f "$V2VAL" ]; then
  stamp "0b: v2 val shard (cap ${T}s)"; probe
  timeout "$T" python -m phasegen_tpu.cli.make_corpus \
    --out_dir dataset --name synthv2 --n_train 98304 --n_val 1024 --version 2
  stamp "0b done"
fi

# --- 1: v3 adaptation resume 512 -> 4096 (VERDICT r4 #2, full ladder) --------
# Window-end intermediate commits: the wipe lesson above.
ADAPT3=runs/v3adapt_612m/ckpt_4096_light.npz
COMMITTED=512
if [ -f "$ADAPT2" ] && [ -f "$V3VAL" ] && [ ! -f "$ADAPT3" ]; then
  stamp "1: v3 adaptation resume to 4096 ref-loss steps"
  for i in 1 2 3 4; do
    probe
    T=$(window 900 2400); [ -z "$T" ] && break
    train_budgeted "$T" \
      --log_dir runs/v3adapt_612m --init_from "$ADAPT2" \
      --val_paths "$V3VAL" \
      --synth_train 98304 --synth_version 3 --batch_size 256 \
      --lr 1e-4 \
      --max_steps 4096 --ckpt_light --ckpt_every 512 --val_every 1024 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media
    S=$(latest_step runs/v3adapt_612m)
    if [ -n "$S" ] && [ "$S" -gt "$COMMITTED" ] && [ ! -f "$ADAPT3" ]; then
      commit_art "v3 adaptation progress ckpt_$S (wipe insurance)" \
        "runs/v3adapt_612m/ckpt_${S}_light.npz" runs/v3adapt_612m/log.json
      COMMITTED=$S
    fi
    [ -f "$ADAPT3" ] && break
    stamp "1 attempt $i ended short of 4096; resume"
    sleep 15
  done
  [ -f "$ADAPT3" ] && commit_art \
    "v3 adaptation base complete (4096 ref-loss steps, full ladder)" \
    "$ADAPT3" runs/v3adapt_612m/log.json
  stamp "1 done"
fi

# --- 2: v3 wav/ang0.0 fine-tune (1024 steps, proven recipe) ------------------
if [ -f "$ADAPT3" ] && [ ! -f runs/v3_aw00/ckpt_1024_light.npz ]; then
  stamp "2: v3 wav/ang0.0 fine-tune (1024 steps)"
  for i in 1 2; do
    probe
    T=$(window 600 1800); [ -z "$T" ] && break
    train_budgeted "$T" \
      --log_dir runs/v3_aw00 --init_from "$ADAPT3" \
      --val_paths "$V3VAL" \
      --synth_train 98304 --synth_version 3 --batch_size 256 \
      --lr 1e-4 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 1024 --ckpt_light --ckpt_every 256 --val_every 512 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media
    [ -f runs/v3_aw00/ckpt_1024_light.npz ] && break
    stamp "2 attempt $i ended short; resume"
    sleep 15
  done
  # ADVICE r4 (medium): commit stage-2 artifacts in place, not only the
  # eventual select winner.
  S=$(latest_step runs/v3_aw00)
  [ -n "$S" ] && commit_art \
    "v3 wav/ang0.0 fine-tune: ckpt_$S + training log (in-place durability)" \
    "runs/v3_aw00/ckpt_${S}_light.npz" runs/v3_aw00/log.json
  stamp "2 done"
fi

# --- 3: v3 full-shard select (GL-8 proxy) ------------------------------------
SEL3=docs/results/select_v3_aw00.json
T=$(window 420 1500)
if [ -n "$T" ] && [ ! -f "$SEL3" ] \
   && ls runs/v3_aw00/ckpt_*_light.npz >/dev/null 2>&1; then
  stamp "3: v3 full-shard select (cap ${T}s)"; probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/v3_aw00 --data "$V3VAL" \
    --gl_iters 8 --refine_iters 1 --out "$SEL3"
  [ -f "$SEL3" ] && commit_art \
    "v3 curriculum arm (full ladder): full-shard select" "$SEL3"
  stamp "3 done"
fi

# --- 4: official GL-250 eval of the v3 winner (+stats +per-clip) -------------
WINNER3=$(python -c "
import json
try:
    print(json.load(open('$SEL3'))['best'])
except Exception:
    print('')")
EVAL3=docs/results/eval_v3_winner.json
T=$(window 420 1500)
if [ -n "$WINNER3" ] && [ -f "$WINNER3" ] && [ -n "$T" ] && [ ! -f "$EVAL3" ]; then
  stamp "4: official GL-250 eval of $WINNER3 (cap ${T}s)"; probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data "$V3VAL" --weight "$WINNER3" \
    --batch_size 64 --gl_iters 250 --refine_iters 1 --stats \
    --per_clip docs/results/pc_v3_winner.jsonl \
    --out "$EVAL3" \
    && commit_art "official GL-250 eval: v3 curriculum winner (full ladder)" \
         "$EVAL3" docs/results/pc_v3_winner.jsonl "$WINNER3"
  stamp "4 done"
fi

# --- 5: cross-corpus control: v3 winner on the v2 shard ----------------------
T=$(window 300 900)
if [ -n "$WINNER3" ] && [ -f "$WINNER3" ] && [ -n "$T" ] && [ -f "$V2VAL" ] \
   && [ ! -f docs/results/eval_v3_winner_on_v2.json ]; then
  stamp "5: cross-corpus eval on the v2 shard (cap ${T}s)"; probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data "$V2VAL" --weight "$WINNER3" \
    --batch_size 64 --gl_iters 8 --refine_iters 1 \
    --out docs/results/eval_v3_winner_on_v2.json \
    && commit_art "cross-corpus control: v3 winner on the v2 shard" \
         docs/results/eval_v3_winner_on_v2.json
  stamp "5 done"
fi

# --- 6: flagship adjudication (VERDICT r4 #3) --------------------------------
if [ -f "$FLAGSHIP" ] && [ -f "$V2VAL" ] \
   && [ ! -f runs/v2polish/ckpt_256_light.npz ]; then
  T=$(window 600 1200)
  if [ -n "$T" ]; then
    stamp "6a: v2polish regen to step 256 (cap ${T}s)"; probe
    train_budgeted "$T" \
      --log_dir runs/v2polish --init_from "$FLAGSHIP" \
      --val_paths "$V2VAL" \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 3e-5 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 256 --ckpt_light --ckpt_every 256 --val_every 256 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media
    stamp "6a done"
  fi
fi
PCPOL=docs/results/pc_v2polish256.jsonl
T=$(window 420 1500)
if [ -n "$T" ] && [ -f runs/v2polish/ckpt_256_light.npz ] && [ ! -f "$PCPOL" ]; then
  stamp "6b: per-clip GL-250 eval of v2polish@256 (cap ${T}s)"; probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data "$V2VAL" --weight runs/v2polish/ckpt_256_light.npz \
    --batch_size 64 --gl_iters 250 --refine_iters 1 --stats \
    --per_clip "$PCPOL" \
    --out docs/results/eval_v2polish256.json
  stamp "6b done"
fi
AB=docs/results/ab_v2polish_vs_flagship.json
if [ -f "$PCPOL" ] && [ -f docs/results/pc_v2flagship.jsonl ] && [ ! -f "$AB" ]; then
  stamp "6c: paired A/B polish-vs-flagship"
  PHASEGEN_SKIP_LIVENESS=1 timeout 600 \
    python benchmarks/paired_ab.py \
    --a "$PCPOL" --b docs/results/pc_v2flagship.jsonl \
    --key MSE --out "$AB"
  [ -f "$AB" ] && commit_art \
    "flagship adjudication: paired A/B v2polish@256 vs flagship@1536" \
    "$AB" "$PCPOL" docs/results/eval_v2polish256.json
  stamp "6c done"
fi

# --- 7: sc_weight sweep (VERDICT r4 #4): 0.1 / 0.5 / 1.0 ---------------------
for W in 0.1 0.5 1.0; do
  TAG=$(echo "$W" | tr -d '.')
  RUN=runs/v2sc$TAG
  SELW=docs/results/select_v2sc$TAG.json
  if [ -f "$FLAGSHIP" ] && [ -f "$V2VAL" ] \
     && [ ! -f "$RUN/ckpt_512_light.npz" ] && [ ! -f "$SELW" ]; then
    T=$(window 700 1500)
    if [ -n "$T" ]; then
      stamp "7: sc_weight $W fine-tune (cap ${T}s)"; probe
      train_budgeted "$T" \
        --log_dir "$RUN" --init_from "$FLAGSHIP" \
        --val_paths "$V2VAL" \
        --synth_train 98304 --synth_version 2 --batch_size 256 \
        --lr 3e-5 --wav_weight 1.0 --ang_weight 0.0 --sc_weight "$W" \
        --max_steps 512 --ckpt_light --ckpt_every 128 --val_every 256 \
        --adam_mu_dtype bfloat16 --no_final_ckpt --no_media
      stamp "7 sc$TAG train done"
    fi
  fi
  T=$(window 420 1500)
  if [ -n "$T" ] && [ ! -f "$SELW" ] \
     && ls "$RUN"/ckpt_*_light.npz >/dev/null 2>&1; then
    stamp "7: sc$TAG select (cap ${T}s)"; probe
    timeout "$T" python benchmarks/ckpt_select.py \
      --run "$RUN" --data "$V2VAL" \
      --gl_iters 8 --refine_iters 1 --out "$SELW"
    [ -f "$SELW" ] && commit_art \
      "sc_weight sweep: $W fine-tune full-shard select" "$SELW"
  fi
done

# --- 8: official eval of the best sweep candidate ----------------------------
SCBEST=$(python - <<'EOF'
import glob, json
cands = []
for f in glob.glob("docs/results/select_v2sc*.json"):
    try:
        s = json.load(open(f))
    except Exception:
        continue
    best = next(r for r in s["rows"] if r["ckpt"] == s["best"])
    if s["best_mse"] <= 0.10931 * 1.01:
        cands.append((best["sc_hybrid"], s["best"]))
print(min(cands)[1] if cands else "")
EOF
)
EVSC=docs/results/eval_sc_winner.json
T=$(window 420 1500)
if [ -n "$SCBEST" ] && [ -f "$SCBEST" ] && [ -n "$T" ] && [ ! -f "$EVSC" ]; then
  stamp "8: official GL-250 eval of sc-sweep winner $SCBEST (cap ${T}s)"; probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data "$V2VAL" --weight "$SCBEST" \
    --batch_size 64 --gl_iters 250 --refine_iters 1 --stats \
    --per_clip docs/results/pc_sc_winner.jsonl \
    --out "$EVSC" \
    && commit_art "official GL-250 eval: sc_weight sweep winner ($SCBEST)" \
         "$EVSC" docs/results/pc_sc_winner.jsonl "$SCBEST"
  if [ -f docs/results/pc_sc_winner.jsonl ] \
     && [ ! -f docs/results/ab_sc_vs_flagship.json ]; then
    PHASEGEN_SKIP_LIVENESS=1 timeout 600 \
      python benchmarks/paired_ab.py \
      --a docs/results/pc_sc_winner.jsonl \
      --b docs/results/pc_v2flagship.jsonl \
      --key MSE --out docs/results/ab_sc_vs_flagship.json
    [ -f docs/results/ab_sc_vs_flagship.json ] && commit_art \
      "paired A/B: sc-sweep winner vs flagship" \
      docs/results/ab_sc_vs_flagship.json
  fi
  stamp "8 done"
fi

# --- 9: f32-master A/B harvest (VERDICT r4 #5, thrice-carried) ---------------
if [ -f "$ADAPT2" ] && [ -f "$V2VAL" ] \
   && [ ! -f runs/v2_aw00_f32/ckpt_2560_light.npz ] \
   && [ ! -f docs/results/select_v2_aw00_f32.json ]; then
  stamp "9: f32-master fine-tune (2560 steps, exact flagship recipe)"
  for i in 1 2; do
    probe
    T=$(window 900 2400); [ -z "$T" ] && break
    train_budgeted "$T" \
      --log_dir runs/v2_aw00_f32 --init_from "$ADAPT2" \
      --val_paths "$V2VAL" \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 1e-4 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 2560 --ckpt_light --ckpt_every 512 --val_every 1024 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media
    [ -f runs/v2_aw00_f32/ckpt_2560_light.npz ] && break
    stamp "9 attempt $i ended short; resume"
    sleep 15
  done
  stamp "9 train done"
fi
SELF32=docs/results/select_v2_aw00_f32.json
T=$(window 420 1800)
if [ -n "$T" ] && [ ! -f "$SELF32" ] \
   && ls runs/v2_aw00_f32/ckpt_*_light.npz >/dev/null 2>&1; then
  stamp "9: f32 select (cap ${T}s)"; probe
  timeout "$T" python benchmarks/ckpt_select.py \
    --run runs/v2_aw00_f32 --data "$V2VAL" \
    --gl_iters 8 --refine_iters 1 --out "$SELF32"
  [ -f "$SELF32" ] && commit_art \
    "f32-master fine-tune A/B: full-shard select (harvested, VERDICT r4 #5)" \
    "$SELF32"
  stamp "9 done"
fi

# --- 10: fine bench batch probe (carried from r5_tail.sh) --------------------
OUT=docs/results/bench_probe_r5.jsonl
for B in 1280 1792; do
  [ -n "$STOPF" ] && [ -f "$STOPF" ] && { stamp "stop file present; parking"; exit 0; }
  [ "$(remain)" -lt 900 ] && { stamp "deadline before probe B=$B"; break; }
  grep -q "\"batch\": $B" "$OUT" 2>/dev/null && continue
  stamp "10: bench probe B=$B"; probe
  LINE=$(PHASEGEN_STOP_FILE= timeout 900 python bench.py --batch "$B" | tail -1)
  case "$LINE" in
    '{'*) echo "{\"batch\": $B, \"result\": $LINE}" >> "$OUT" ;;
    *) stamp "probe B=$B produced no JSON" ;;
  esac
done
[ -f "$OUT" ] && commit_art \
  "bench fine batch probe (1280/1792 around the 1536 peak)" "$OUT"

stamp "R5C QUEUE DONE (remain=$(remain)s)"
