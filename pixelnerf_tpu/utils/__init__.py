from . import geometry, metrics, sampling  # noqa: F401
