#!/bin/bash
# Round-5 master chip queue — VERDICT r4 items in priority order:
#
#  1. v3 curriculum ladder FIRST (VERDICT #2, carried from r3/r4):
#     resume adaptation 512 -> 4096 steps, wav/ang0.0 fine-tune, full-shard
#     select, official GL-250 eval (+stats +per-clip), cross-corpus control
#     on the v2 shard. Answers: does adaptation widen the v2 flagship's
#     26.9% zero-shot margin on the v3 generator?
#  2. Flagship adjudication (VERDICT #3): regenerate v2polish@256 (wiped,
#     recipe from r4_queue.sh stage 10), per-clip GL-250 eval, paired
#     bootstrap A/B against the committed flagship's pc_v2flagship.jsonl.
#  3. sc_weight sweep 0.1/0.5/1.0 (VERDICT #4; 0.3 landed in r4):
#     512-step fine-tunes from the flagship + full-shard selects; official
#     eval of a qualifying candidate (MAE within 1% of flagship, lowest SC).
#  4. f32-master A/B harvest (VERDICT #5, thrice-carried): exact flagship
#     fine-tune recipe from the v2 adaptation base — since the r3x
#     _load_init_f32 fix, --init_from loads f32 masters, so a plain rerun
#     IS the f32 arm; select column compares against select_v2ext_aw00.json.
#
# Checkpoint-commit policy (VERDICT r4 weak #4, pack bloat): only lineage
# bases and officially-evaluated winners get committed npz; sweep/A/B arms
# leave their evidence in select/eval JSONs (a mid-queue wipe costs ~10 min
# of regen, a committed 1.2 GB npz costs history forever).
#
# Contract (OPERATIONS.md): fresh campaign -> rm -f stop file; register
# /tmp/r5.pid; every stage probes stop file + deadline; artifacts committed
# in place right after the stage that produced them (ADVICE r4, medium).
set -x
cd /root/repo
export PYTHONUNBUFFERED=1
STATUS=/tmp/q_status.log
STOPF="${PHASEGEN_STOP_FILE-/tmp/q_stop}"
DEADLINE=${PHASEGEN_Q_DEADLINE:-$(( $(date +%s) + 19800 ))}

[ -n "$STOPF" ] && rm -f "$STOPF"
echo $$ > /tmp/r5.pid
trap 'rm -f /tmp/r5.pid' EXIT

stamp() { echo "$(date -u +%FT%TZ) r5: $1" >> "$STATUS"; }
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

FLAGSHIP=runs/v2_aw00/ckpt_1536_light.npz
ADAPT2=runs/v2adapt_612m/ckpt_4096_light.npz
V3VAL=dataset/synthv3_audio_val.npy
V2VAL=dataset/synthv2_audio_val.npy

stamp "r5 queue starts (deadline=$DEADLINE, remain=$(remain)s)"

# --- 0: val shards (deterministic regen) -------------------------------------
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

# --- 1: v3 adaptation resume 512 -> 4096 (full ladder, VERDICT #2) -----------
ADAPT3=runs/v3adapt_612m/ckpt_4096_light.npz
if [ -f "$ADAPT2" ] && [ -f "$V3VAL" ] && [ ! -f "$ADAPT3" ]; then
  stamp "1: v3 adaptation resume to 4096 ref-loss steps"
  for i in 1 2 3; do
    probe
    T=$(window 900 2700); [ -z "$T" ] && break
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v3adapt_612m --init_from "$ADAPT2" \
      --val_paths "$V3VAL" \
      --synth_train 98304 --synth_version 3 --batch_size 256 \
      --lr 1e-4 \
      --max_steps 4096 --ckpt_light --ckpt_every 512 --val_every 1024 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "1 attempt $i exited nonzero; resume retry"
    sleep 30
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
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v3_aw00 --init_from "$ADAPT3" \
      --val_paths "$V3VAL" \
      --synth_train 98304 --synth_version 3 --batch_size 256 \
      --lr 1e-4 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 1024 --ckpt_light --ckpt_every 256 --val_every 512 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "2 attempt $i exited nonzero; resume retry"
    sleep 30
  done
  # log only; winner npz is committed by stage 4 (pack-bloat policy above)
  [ -f runs/v3_aw00/log.json ] && commit_art \
    "v3 wav/ang0.0 fine-tune: training log" runs/v3_aw00/log.json
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

# --- 4: official GL-250 eval of the v3 winner (+stats +per-clip) --------------
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
  stamp "5: cross-corpus eval of the v3 winner on the v2 shard (cap ${T}s)"; probe
  timeout "$T" python -m phasegen_tpu.cli.evaluate \
    --data "$V2VAL" --weight "$WINNER3" \
    --batch_size 64 --gl_iters 8 --refine_iters 1 \
    --out docs/results/eval_v3_winner_on_v2.json \
    && commit_art "cross-corpus control: v3 winner on the v2 shard" \
         docs/results/eval_v3_winner_on_v2.json
  stamp "5 done"
fi

# --- 6: flagship adjudication (VERDICT #3) -----------------------------------
# 6a: regenerate v2polish to step 256 (the r4 select's winner; run dir wiped)
if [ -f "$FLAGSHIP" ] && [ -f "$V2VAL" ] \
   && [ ! -f runs/v2polish/ckpt_256_light.npz ]; then
  T=$(window 420 1200)
  if [ -n "$T" ]; then
    stamp "6a: v2polish regen to step 256 (cap ${T}s)"; probe
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v2polish --init_from "$FLAGSHIP" \
      --val_paths "$V2VAL" \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 3e-5 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 256 --ckpt_light --ckpt_every 256 --val_every 256 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media
    stamp "6a done"
  fi
fi
# 6b: per-clip GL-250 eval of v2polish@256 on the same shard as pc_v2flagship
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
# 6c: paired bootstrap A/B (CPU-only, fast) — positive median = polish wins
AB=docs/results/ab_v2polish_vs_flagship.json
if [ -f "$PCPOL" ] && [ -f docs/results/pc_v2flagship.jsonl ] && [ ! -f "$AB" ]; then
  stamp "6c: paired A/B polish-vs-flagship"
  PHASEGEN_SKIP_LIVENESS=1 JAX_PLATFORMS=cpu timeout 600 \
    python benchmarks/paired_ab.py \
    --a "$PCPOL" --b docs/results/pc_v2flagship.jsonl \
    --key MSE --out "$AB"
  [ -f "$AB" ] && commit_art \
    "flagship adjudication: paired A/B v2polish@256 vs flagship@1536" \
    "$AB" "$PCPOL" docs/results/eval_v2polish256.json
  stamp "6c done"
fi

# --- 7: sc_weight sweep (VERDICT #4): 0.1 / 0.5 / 1.0 ------------------------
for W in 0.1 0.5 1.0; do
  TAG=$(echo "$W" | tr -d '.')   # 01 / 05 / 10
  RUN=runs/v2sc$TAG
  SELW=docs/results/select_v2sc$TAG.json
  if [ -f "$FLAGSHIP" ] && [ -f "$V2VAL" ] \
     && [ ! -f "$RUN/ckpt_512_light.npz" ] && [ ! -f "$SELW" ]; then
    T=$(window 600 1500)
    if [ -n "$T" ]; then
      stamp "7: sc_weight $W fine-tune (cap ${T}s)"; probe
      timeout "$T" python -m phasegen_tpu.cli.train \
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
# Criterion (VERDICT #4): does any weight HOLD MAE (within 1% of the
# flagship's 0.10931 select number) while collapsing SC? Pick the
# qualifying arm with the lowest sc_hybrid at its best step.
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
         "$EVSC" docs/results/pc_sc_winner.jsonl
  # paired A/B vs the flagship on the same shard (CPU)
  if [ -f docs/results/pc_sc_winner.jsonl ] \
     && [ ! -f docs/results/ab_sc_vs_flagship.json ]; then
    PHASEGEN_SKIP_LIVENESS=1 JAX_PLATFORMS=cpu timeout 600 \
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

# --- 9: f32-master A/B harvest (VERDICT #5, thrice-carried) -------------------
# Since the r3x _load_init_f32 fix, --init_from loads f32 masters: a plain
# rerun of the flagship fine-tune recipe IS the f32 arm. Compare its select
# against the bf16-era select_v2ext_aw00.json (same data/steps/lr).
if [ -f "$ADAPT2" ] && [ -f "$V2VAL" ] \
   && [ ! -f runs/v2_aw00_f32/ckpt_2560_light.npz ] \
   && [ ! -f docs/results/select_v2_aw00_f32.json ]; then
  stamp "9: f32-master fine-tune (2560 steps, exact flagship recipe)"
  for i in 1 2; do
    probe
    T=$(window 900 2400); [ -z "$T" ] && break
    timeout "$T" python -m phasegen_tpu.cli.train \
      --log_dir runs/v2_aw00_f32 --init_from "$ADAPT2" \
      --val_paths "$V2VAL" \
      --synth_train 98304 --synth_version 2 --batch_size 256 \
      --lr 1e-4 --wav_weight 1.0 --ang_weight 0.0 \
      --max_steps 2560 --ckpt_light --ckpt_every 512 --val_every 1024 \
      --adam_mu_dtype bfloat16 --no_final_ckpt --no_media && break
    stamp "9 attempt $i exited nonzero; resume retry"
    sleep 30
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

stamp "R5 QUEUE DONE (remain=$(remain)s)"
