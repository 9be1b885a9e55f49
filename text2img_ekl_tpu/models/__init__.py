from .generator import (  # noqa: F401
    InitStageG,
    CondInitStageG,
    CondInitStageGWithCap,
    CondInitStageGExchangeCap,
    NextStageG,
    ToRGB,
    GNet,
    CondGNet,
    CondGNetCatZ,
    CondGNetCatZCA,
    build_generator,
)
from .discriminator import (  # noqa: F401
    DNet,
    JointDNet,
    EntityDNet,
    build_discriminators,
)
from .inception_v3 import InceptionV3  # noqa: F401
