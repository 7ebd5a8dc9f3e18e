from .gaussian import gaussian_heatmaps  # noqa: F401
from .raster import (  # noqa: F401
    rasterize_ellipses_1px,
    rasterize_lines,
    rasterize_points,
    rasterize_polygons,
)
