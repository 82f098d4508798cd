#!/bin/bash
# Round-2 post-training sequence (runs serially; one TPU client at a time).
set -x
cd /root/repo

# 0) full-val-set eval of the mag2 fine-tune (A/B vs the base run)
timeout 2400 python -m phasegen_tpu.cli.evaluate \
  --data dataset/synth_audio_val.npy \
  --weight runs/synth612m_ft/ckpt_6000_light.npz \
  --batch_size 64 --out runs/synth612m_ft/eval_report.json

# 1) demo CLI on the trained base weights (reference demo.py parity
#    prints; also drives the fixed full-ckpt weight restore)
timeout 2400 python -m phasegen_tpu.cli.demo \
  --genre synth --data_dir dataset --n_songs 5 \
  --weight runs/synth612m --out_dir demo_synth

# 2) scan-dispatch A/B
timeout 3000 python benchmarks/scan_ab.py --batches 16,64,256 --k 8

# 3) Pallas analysis A/B at production batch (tile sweep)
timeout 3000 python benchmarks/analysis_ab.py --batches 128,512 \
  --tiles 128x256,256x512,512x512,512x1024,1024x1024

# 4) int8 serving A/B at small batch
timeout 3000 python benchmarks/int8_ab.py --batches 1,2,4,8,32

# 5) bench.py headline + a B=1024 probe
timeout 1200 python bench.py
timeout 1200 python bench.py --batch 1024
