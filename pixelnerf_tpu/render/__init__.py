from .renderer import (  # noqa: F401
    NeRFRenderer,
    RenderConfig,
    composite,
    render_rays,
    sample_coarse,
    sample_fine,
    sample_fine_depth,
)
