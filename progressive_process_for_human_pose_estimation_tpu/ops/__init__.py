from .blocks import (  # noqa: F401
    ASPPBlock,
    BatchNorm,
    Conv,
    ConvBNReLU,
    ResidualBlock,
    ResidualBlockLite,
)
from .hourglass import ASPPHourglass, ClassicHourglass, RecursiveHourglass  # noqa: F401
from .resize import (  # noqa: F401
    global_avg_pool,
    max_pool_2x2,
    resize_bilinear_align_corners,
    upsample2x_bilinear_align_corners,
    upsample2x_nearest,
)
