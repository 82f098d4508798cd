from phasegen_tpu.ops.stft import (
    hann_window,
    frame_signal,
    stft,
    istft,
    overlap_add,
    drop_dc,
    add_dc,
    logmag_phase,
    polar_to_complex,
)
from phasegen_tpu.ops.conv import conv1d, conv_transpose1d
from phasegen_tpu.ops.griffin_lim import griffin_lim

__all__ = [
    "hann_window",
    "frame_signal",
    "stft",
    "istft",
    "overlap_add",
    "drop_dc",
    "add_dc",
    "logmag_phase",
    "polar_to_complex",
    "conv1d",
    "conv_transpose1d",
    "griffin_lim",
]
