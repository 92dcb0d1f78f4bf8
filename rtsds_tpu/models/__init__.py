from rtsds_tpu.models.bisenet import BiSeNet  # noqa: F401
from rtsds_tpu.models.deeplabv2 import DeepLabV2, get_deeplab_v2  # noqa: F401
from rtsds_tpu.models.discriminator import (  # noqa: F401
    DomainDiscriminator,
    TinyDomainDiscriminator,
    gradient_reversal,
)
from rtsds_tpu.models.resnet import ResNetBackbone  # noqa: F401
