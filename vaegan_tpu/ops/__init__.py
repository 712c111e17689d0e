from vaegan_tpu.ops.conv import conv2d, conv_transpose2d, avg_pool
from vaegan_tpu.ops.norm import batch_norm
from vaegan_tpu.ops.spectral_norm import spectral_normalize
from vaegan_tpu.ops import initializers

__all__ = [
    "conv2d", "conv_transpose2d", "avg_pool", "batch_norm",
    "spectral_normalize", "initializers",
]
