"""Run configuration: one dataclass per entry point, reference defaults.

The reference splits its configuration between argparse CLIs (preproc,
demo) and hardcoded module constants (train.py:11-16,26). Here every
entry point gets a dataclass with the reference's exact defaults, and the
CLIs in cli/ expose each field as a flag.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp

from phasegen_tpu.models.unet import UNetConfig

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


@dataclasses.dataclass
class TrainConfig:
    # reference constants (train.py:11-16,26)
    log_dir: str = "unet_llr/"
    train_paths: Sequence[str] = ("dataset/Pop_audio_train.npy",)
    val_paths: Sequence[str] = ("dataset/Pop_audio_val.npy",)
    batch_size: int = 16
    val_batch_size: int = 3
    lr: float = 1e-3
    sr: int = 16000
    n_fft: int = 2048
    hop: int = 512
    mag_weight: float = 0.2          # reference: train.py:60
    val_every: int = 2000            # reference: train.py:69
    ckpt_every: int = 4000           # reference: train.py:126
    gl_iters: int = 250              # reference: train.py:101
    max_steps: int = 0               # 0 = run forever like the reference
    max_epochs: int = 0              # 0 = unbounded
    max_seconds: float = 0.0         # wall-clock budget: checkpoint and
                                     # exit cleanly once exceeded (0 = off).
                                     # Queue stages use this instead of
                                     # `timeout` — a SIGTERM mid-step can
                                     # wedge the tunneled backend for
                                     # hours (CLAUDE.md; observed r5)
    seed: int = 0
    resume: bool = True              # restart-from-latest (reference lacks this)
    compute_dtype: str = "bfloat16"
    extra_depth: int = 0
    norm: str = "batch"
    data_parallel: bool = True       # shard over all local devices
    tensor_parallel: int = 1         # model-axis size
    log_media: bool = True           # spectrogram images + audio to TB
    prefetch: int = 2
    channels: int = 1                # 2 = stereo / multi-source high-res
    profile_steps: int = 0           # trace steps [10, 10+N) to log_dir/profile
    adam_mu_dtype: str = "float32"   # "bfloat16" halves first-moment HBM traffic
    lr_schedule: str = "constant"    # "cosine" with optional warmup
    warmup_steps: int = 0
    decay_steps: int = 0             # required for cosine
    device_data_gb: float = 4.0      # keep the dataset device-resident when
                                     # it fits in this budget (0 disables);
                                     # measured 19% faster steps than host
                                     # feeding on the tunnel
    ckpt_light: bool = False         # periodic saves are weights-only npz
                                     # (bf16, ~6x less D2H than full orbax
                                     # state); full state saved at exit
    synth_train: int = 0             # >0: train on the on-device synthetic
                                     # corpus of this many clips instead of
                                     # train_paths (data/device_synth.py)
    synth_seed: int = 0              # corpus base PRNG seed
    synth_version: int = 1           # 1 = round-2 corpus (tonal events);
                                     # 2 = harder music-like corpus
                                     # (denser polyphony, noise floor,
                                     # percussion noise bursts, reverb
                                     # tail); 3 = v2 + music structure
                                     # (key/scale quantization, register
                                     # roles, looping percussion,
                                     # tremolo — data/device_synth.py)
    synth_fresh: bool = False        # never reuse a clip seed (infinite
                                     # stream); epochs are synth_train-sized
                                     # passes for bookkeeping
    synth_t_samples: int = 65024     # samples per synthetic clip (128
                                     # frames at the reference geometry)
    ang_weighting: str = "none"      # "mag2": mag^2-weighted angle loss
                                     # (waveform-L2 aligned; reference
                                     # semantics = "none", train/losses.py)
    wav_weight: float = 0.0          # >0: add wav_weight * waveform MAE of
                                     # the hybrid reconstruction vs the
                                     # original — the validation metric
                                     # itself (train/losses.py:
                                     # hybrid_wav_mae); reference = 0
    sc_weight: float = 0.0           # >0: add sc_weight * per-clip sin²
                                     # spectral-consistency of the hybrid
                                     # (train/losses.py:spectral_sin2);
                                     # reference = 0. BASELINE.md r4
                                     # motivates it: SC 0.70 vs GL's 0.07
    ang_weight: float = 1.0          # scale on the cos/sin angle term
                                     # (1.0 = reference). <1 stops the
                                     # angle gradient dominating a
                                     # wav_weight fine-tune
                                     # (train/losses.py)
    final_ckpt: bool = True          # write a FULL orbax state at run end
                                     # (~7 min of D2H for 612M on this
                                     # tunnel). Off for sweep runs whose
                                     # periodic light npz saves suffice
    init_from: str = ""              # warm-start: load params/BN stats
                                     # from this checkpoint (orbax dir or
                                     # npz) into a FRESH run (step 0, new
                                     # optimizer) — fine-tuning; distinct
                                     # from resume, which continues the
                                     # same run from log_dir
    scan_steps: int = 0              # K train steps per dispatch inside
                                     # one lax.scan program (device-side
                                     # feeds only) — amortizes the fixed
                                     # per-call cost (dispatch + optimizer
                                     # sync; ~77 ms on the tunnel).
                                     # 0 = auto: 8 when the feed is
                                     # device-side (--synth_train or a
                                     # device-resident dataset), clamped
                                     # to the epoch's step count; 1 for
                                     # host-fed runs. Measured +74% @B=16,
                                     # +36% @B=64, +14% @B=256 (BASELINE.md)

    def model_config(self, length: int = 128) -> UNetConfig:
        bins = self.channels * (self.n_fft // 2)
        return UNetConfig(
            input_nc=bins,
            output_nc=2 * bins,
            length=length,
            extra_depth=self.extra_depth,
            norm=self.norm,
            compute_dtype=_DTYPES[self.compute_dtype],
        )


@dataclasses.dataclass
class DemoConfig:
    # reference flags (demo.py:9-17)
    genre: str = "Pop"
    n_songs: int = 5
    n_fft: int = 2048
    sr: int = 16000
    hop: int = 512
    weight: str = ""
    data_dir: str = "dataset"
    out_dir: str = "demo"
    gl_iters: int = 250
    compute_dtype: str = "bfloat16"
    extra_depth: int = 0
    channels: int = 1

    def model_config(self, length: int = 128) -> UNetConfig:
        bins = self.channels * (self.n_fft // 2)
        return UNetConfig(
            input_nc=bins,
            output_nc=2 * bins,
            length=length,
            extra_depth=self.extra_depth,
            compute_dtype=_DTYPES[self.compute_dtype],
        )


@dataclasses.dataclass
class PreprocConfig:
    # reference flags and defaults (preproc_mdb.py:200-214)
    n_fft: int = 2048
    hop_length: int = 512
    chunk: float = 4.064
    n_random: Sequence[int] = (30,)
    unvoice: bool = False
    melody: bool = False
    bass: bool = False
    rsr: int = 16000
    n_val: int = 1000
    genres: str = ""
    get_attr: bool = False
    # extensions over the reference
    get_gid: bool = False            # emit per-patch genre-index shards
    wav_dir: str = ""                # fallback: directory of wavs per genre
    out_dir: str = "./output"
    seed: int = 0
    # framing+STFT backend: None = auto (device, except on the D2H-bound
    # axon tunnel where host numpy measured 2x faster — BASELINE.md r3x)
    device_stft: bool | None = None
