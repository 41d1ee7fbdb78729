from .grid_sample import grid_sample  # noqa: F401
from .resize import resize_area, resize_bilinear  # noqa: F401
