from phasegen_tpu.data.loader import NpyPatchLoader, get_spec_and_angle
from phasegen_tpu.data.synth import synth_dataset, synth_waveforms

__all__ = [
    "NpyPatchLoader",
    "get_spec_and_angle",
    "synth_dataset",
    "synth_waveforms",
]
