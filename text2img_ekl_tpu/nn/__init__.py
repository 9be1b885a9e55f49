from .blocks import (  # noqa: F401
    GLU,
    glu,
    Conv3x3,
    UpBlock,
    Block3x3Relu,
    ResBlock,
    Block3x3LeakyRelu,
    DownBlock,
    EncodeBy16,
    BatchNorm,
    Dense,
    orthogonal_init,
    bn_scale_init,
)
from .conditioning import CANet, VCNet  # noqa: F401
