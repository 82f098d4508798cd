from phasegen_tpu.obs.logger import Logger
from phasegen_tpu.obs.spec_image import amplitude_to_db, spec_image

__all__ = ["Logger", "amplitude_to_db", "spec_image"]
