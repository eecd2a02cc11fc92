"""Network layer (L3): generator, discriminator, video net, losses."""

from .generator import GeneratorConfig, UNetGenerator
from .discriminator import (
    DiscriminatorConfig,
    MultiScaleDiscriminator,
    PatchDiscriminator,
)
from .video import VideoNetConfig, VideoFeatureNet
from .losses import gan_loss, l1_loss, masked_l1_loss
from .factory import define_D, define_G, define_V
from .refiner import DiffusionRefiner, RefinerConfig, define_R

__all__ = [
    "GeneratorConfig", "UNetGenerator",
    "DiscriminatorConfig", "PatchDiscriminator", "MultiScaleDiscriminator",
    "VideoNetConfig", "VideoFeatureNet",
    "RefinerConfig", "DiffusionRefiner",
    "gan_loss", "l1_loss", "masked_l1_loss",
    "define_G", "define_D", "define_V", "define_R",
]
