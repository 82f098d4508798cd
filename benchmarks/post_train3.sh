#!/bin/bash
# Round-3 post-training sequence (serial; one TPU client at a time).
# Runs after runs/wav612m (28k-step wav-loss fine-tune) completes.
set -x
cd /root/repo

# 0) THE headline: whole-val-set eval of the wav-loss model, with
#    refined columns from the same graph (VERDICT r2 #1 done-criterion:
#    MSE <= ~0.137 at --refine_iters 0)
timeout 3000 python -m phasegen_tpu.cli.evaluate \
  --data dataset/synth_audio_val.npy \
  --weight runs/wav612m \
  --batch_size 64 --refine_iters 2,8 \
  --out runs/wav612m/eval_report.json

# 1) demo CLI on the trained weights (reference parity prints; B=1 path
#    now exercises the Pallas ISTFT auto-on)
timeout 2400 python -m phasegen_tpu.cli.demo \
  --genre synth --data_dir dataset --n_songs 5 \
  --weight runs/wav612m --out_dir demo_wav --refine_iters 2

# 2) streaming cold-start A/B: chunked vs fused first-call latency on a
#    60 s synthetic track, then a second process to show the
#    compilation-cache effect
timeout 3000 python benchmarks/stream_coldstart.py --weight runs/wav612m
timeout 3000 python benchmarks/stream_coldstart.py --weight runs/wav612m \
  --mode fused
# second processes: first_s now measures the persistent-cache restore
timeout 1200 python benchmarks/stream_coldstart.py --weight runs/wav612m
timeout 1200 python benchmarks/stream_coldstart.py --weight runs/wav612m \
  --mode fused

# 3) v2 (harder corpus) val shard for the v2 fine-tune that follows
timeout 2400 python -m phasegen_tpu.cli.make_corpus --out_dir dataset \
  --name synthv2 --version 2 --n_train 98304 --n_val 1024

# 4) int8 clean re-run (more windows + fixed-fence micro GEMMs)
timeout 3000 python benchmarks/int8_ab.py --batches 1,2,4 --windows 8 --micro

# 5) bench.py headline
timeout 1200 python bench.py

# 6) wav-loss overhead A/B (ms/step with and without the aux term)
timeout 2400 python benchmarks/train_sweep.py --batches 256 --chain 6
timeout 2400 python benchmarks/train_sweep.py --batches 256 --chain 6 \
  --wav_weight 1.0

# 7) headline batch-size probe: is there more beyond B=1024?
timeout 1200 python bench.py --batch 1536
timeout 1200 python bench.py --batch 2048
