from mri_inr_tpu.models.siren import Modulator, SirenLayer, SirenNet
from mri_inr_tpu.models.encoder import (
    ConvAutoencoder,
    ConvEncoder,
    LatentEncoder,
    VGGEncoder,
)
from mri_inr_tpu.models.modulated_siren import ModulatedSiren
from mri_inr_tpu.models.perceptual import (
    PerceptualAutoencoderV1,
    PerceptualAutoencoderV2,
    PerceptualEncoderV1,
    PerceptualEncoderV2,
)

__all__ = [
    "Modulator",
    "SirenLayer",
    "SirenNet",
    "ConvAutoencoder",
    "ConvEncoder",
    "LatentEncoder",
    "VGGEncoder",
    "ModulatedSiren",
    "PerceptualAutoencoderV1",
    "PerceptualAutoencoderV2",
    "PerceptualEncoderV1",
    "PerceptualEncoderV2",
]
