"""phasegen_tpu — a TPU-native (JAX/XLA/Pallas/pjit) audio phase-generation framework.

Re-designed from scratch with the capabilities of the UNet-PhaseGen reference
(see /root/repo/SURVEY.md): MedleyDB-style preprocessing into log-magnitude /
phase spectrogram patches, a ~612M-parameter 1-D U-Net predicting phase (and
magnitude) from log-magnitude alone, and audio resynthesis via a fused
STFT -> U-Net -> ISTFT jitted graph benchmarked against Griffin-Lim.

Layout:
  ops/       DSP + compute primitives (STFT/ISTFT, conv, Griffin-Lim, Pallas kernels)
  models/    functional U-Net (pure pytree params, explicit batch-norm state)
  data/      preprocessing, npy loading, device prefetch, synthetic data
  parallel/  mesh construction + sharding rules (DP over ICI via shard_map/pjit)
  train/     losses, train state, jitted train step, checkpointing, loop
  infer/     fused inference pipeline, streaming overlap-add for long tracks
  obs/       TensorBoard logging, profiling helpers
  cli/       preproc / train / demo entry points (reference-compatible flags)
"""

__version__ = "0.1.0"
