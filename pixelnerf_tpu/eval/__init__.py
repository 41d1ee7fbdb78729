from .common import FullRenderer, depth_cmap  # noqa: F401
