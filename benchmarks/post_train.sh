#!/bin/bash
# Post-training sequence: runs after the 612M synth-corpus run completes.
# Each stage appends to /tmp/post_train.log; stages are independent.
set -x
cd /root/repo

# 1) Whole-val-set evaluation with the trained weights (the reference's
#    success criterion: MSE < NOPMSE, vs LMSE; reference train.py:103-108)
timeout 3000 python -m phasegen_tpu.cli.evaluate \
  --data dataset/synth_audio_val.npy \
  --weight runs/synth612m \
  --batch_size 64 --out runs/synth612m/eval_report.json

# 2) Demo CLI on trained weights (reference demo.py parity prints)
timeout 1200 python -m phasegen_tpu.cli.demo \
  --genre synth --data_dir dataset --n_songs 5 \
  --weight runs/synth612m --out_dir demo_synth

# 3) int8 serving A/B at small batch
timeout 3000 python benchmarks/int8_ab.py --batches 1,2,4,8,32

# 4) Pallas analysis A/B at production batch (tile sweep)
timeout 3000 python benchmarks/analysis_ab.py --batches 128,512 \
  --tiles 128x256,256x512,512x512,512x1024,1024x512,1024x1024

# 5) scan-dispatch A/B (--scan_steps vs per-step dispatch)
timeout 3000 python benchmarks/scan_ab.py --batches 16,64,256 --k 8

# 6) bench.py headline + a B=1024 probe
timeout 1200 python bench.py
