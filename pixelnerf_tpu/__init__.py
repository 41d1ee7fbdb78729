"""pixelnerf_tpu — a TPU-native reimplementation of pixelNeRF (Yu et al., CVPR 2021).

Brand-new JAX/XLA/Pallas framework with the capabilities of the reference
PyTorch implementation (sxyu/pixel-nerf), re-designed TPU-first:

- functional core: ``encode()`` returns an explicit :class:`SceneEncoding`
  PyTree instead of mutating module buffers (reference: src/model/models.py:89)
- static shapes + ``lax.scan`` chunking instead of Python-loop chunking
  (reference: src/render/nerf.py:195-216)
- ray-dimension sharding over a ``jax.sharding.Mesh`` instead of
  ``torch.nn.DataParallel(dim=1)`` (reference: src/render/nerf.py:370)
- Pallas kernels for the pixel-aligned bilinear gather (the reference's
  ``F.grid_sample``; src/model/encoder.py:102)
"""

__version__ = "0.2.0"

# Lazy top-level conveniences: keep `import pixelnerf_tpu` free of the
# jax/flax import cost until a symbol is actually touched.
_LAZY = {
    "make_model": ("pixelnerf_tpu.models", "make_model"),
    "PixelNeRFNet": ("pixelnerf_tpu.models", "PixelNeRFNet"),
    "SceneEncoding": ("pixelnerf_tpu.models", "SceneEncoding"),
    "bake_encoding": ("pixelnerf_tpu.models", "bake_encoding"),
    "NeRFRenderer": ("pixelnerf_tpu.render", "NeRFRenderer"),
    "RenderConfig": ("pixelnerf_tpu.render", "RenderConfig"),
    "load_config": ("pixelnerf_tpu.config", "load_config"),
    "get_split_dataset": ("pixelnerf_tpu.data", "get_split_dataset"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
