from .color import (  # noqa: F401
    adjust_brightness,
    adjust_contrast,
    adjust_hue,
    adjust_saturation,
    color_jitter,
)
from .geometric import (  # noqa: F401
    AugmentParams,
    augment_coords,
    augment_image,
    resize_coords_plain,
    sample_augment_params,
)
