from phasegen_tpu.models.unet import (
    UNetConfig,
    unet_init,
    unet_apply,
    unet_param_count,
)
from phasegen_tpu.models.norm import batch_norm, instance_norm

__all__ = [
    "UNetConfig",
    "unet_init",
    "unet_apply",
    "unet_param_count",
    "batch_norm",
    "instance_norm",
]
