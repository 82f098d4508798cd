from phasegen_tpu.infer.pipeline import (
    build_infer_fn,
    spec_to_audio_fn,
    wav_to_patch_fn,
)

__all__ = ["build_infer_fn", "spec_to_audio_fn", "wav_to_patch_fn"]
