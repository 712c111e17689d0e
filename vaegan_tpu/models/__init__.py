from vaegan_tpu.models.blocks import ResBlockDiscriminator, ResBlockVAE
from vaegan_tpu.models.layers import BatchNorm, Conv2D, Dropout, Linear, leaky_relu
from vaegan_tpu.models.networks import (
    Decoder,
    Discriminator,
    Encoder,
    SpatialVAECodeProcessor,
    UnsupervisedGeneratorNetwork,
)

__all__ = [
    "ResBlockVAE", "ResBlockDiscriminator", "BatchNorm", "Conv2D", "Dropout",
    "Linear", "leaky_relu", "Encoder", "Decoder", "SpatialVAECodeProcessor",
    "UnsupervisedGeneratorNetwork", "Discriminator",
]
