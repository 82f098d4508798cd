from phasegen_tpu.ops.pallas.stft_fused import stft_ri_pallas
from phasegen_tpu.ops.pallas.istft_fused import istft_ri_pallas

__all__ = ["stft_ri_pallas", "istft_ri_pallas"]
